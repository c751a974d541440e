"""Attribute the SECOND train step: fwd vs bwd, and what a gather-based
strided-conv backward would buy.

The round-3 window rulebooks made subm backward scatter-free (rulebook
self-transpose); strided convs still use the flat per-tap scatter-add
backward. This probe times, at KITTI SECOND scale (B=2, V=20k):

  a. middle forward only
  b. middle value_and_grad (real backward: subm gather-based, strided
     scatter-based)
  c. value_and_grad with the strided backward REPLACED by a mirror-conv
     cost model — numerically wrong, but the exact compute/descriptor
     shape a gather-based (inverse-rulebook) strided backward would have.
     (b - c) bounds what implementing it properly could save.

Run: python tools/probes/probe_train_split.py [batch]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def timeit(fn, fence, k_lo=5, k_hi=25):
    fn(); fence()
    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            fn()
        fence()
        return time.perf_counter() - t0
    run(3)
    return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp
    import det3d_tpu.ops.sparse as sp
    from det3d_tpu.models.backbones import SpMiddleFHD

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    v = 20000
    grid = (1408, 1600, 40)
    shape0 = (41, 1600, 1408)
    rng = np.random.RandomState(0)
    n_cells = shape0[0] * shape0[1] * shape0[2]
    lin = rng.choice(n_cells, v, replace=False)
    co = np.stack([lin // (shape0[1] * shape0[2]),
                   (lin // shape0[2]) % shape0[1],
                   lin % shape0[2]], -1).astype(np.int32)
    co = jnp.asarray(np.broadcast_to(co, (batch, v, 3)).copy())
    feats = jnp.asarray(rng.randn(batch, v, 4).astype(np.float32))

    # cost-model variant: strided backward as a mirror window conv (only
    # shape-valid because stage caps keep O == V at this scale)
    @partial(jax.custom_vjp, nondiff_argnums=(4,))
    def acw_fake(f, r0, pres, w, center_shift=False):
        return sp._window_conv_impl(f, r0, pres, w, center_shift)

    def _fwd(f, r0, pres, w, cs):
        return sp._window_conv_impl(f, r0, pres, w, cs), (f, r0, pres, w)

    def _bwd(cs, res, dy):
        f, r0, pres, w = res
        wrev = w[::-1].transpose(0, 2, 1)
        df = sp._window_conv_impl(dy, r0, pres, wrev, cs)
        dw = sp._window_conv_dw(f, r0, pres, dy, cs)
        return (df.astype(f.dtype), np.zeros(r0.shape, jax.dtypes.float0),
                np.zeros(pres.shape, jax.dtypes.float0), dw)

    acw_fake.defvjp(_fwd, _bwd)

    real = sp.apply_conv_window
    m = SpMiddleFHD(num_input_features=4)
    vs = jax.jit(lambda k, f, c: m.init(k, f, c, grid, train=False))(
        jax.random.PRNGKey(0), feats, co)

    @jax.jit
    def fwd(p, f):
        return (m.apply({"params": p, "batch_stats": vs["batch_stats"]},
                        f, co, grid, train=False) ** 2).sum()

    t = timeit(lambda: fwd(vs["params"], feats),
               lambda: float(fwd(vs["params"], feats)))
    print(f"fwd only                  : {t*1e3:8.2f} ms "
          f"({t/batch*1e3:7.2f} ms/scan)")

    for tag, impl in (("grad, real bwd           ", real),
                      ("grad, gather-bwd model   ", acw_fake)):
        sp.apply_conv_window = impl

        @jax.jit
        def vg(p, f):
            def loss(pp):
                return (m.apply(
                    {"params": pp, "batch_stats": vs["batch_stats"]},
                    f, co, grid, train=False) ** 2).sum()
            l, g = jax.value_and_grad(loss)(p)
            return l + sum(jnp.sum(jnp.abs(x))
                           for x in jax.tree_util.tree_leaves(g))

        t = timeit(lambda: vg(vs["params"], feats),
                   lambda: float(vg(vs["params"], feats)))
        print(f"{tag}: {t*1e3:8.2f} ms ({t/batch*1e3:7.2f} ms/scan)")
    sp.apply_conv_window = real


if __name__ == "__main__":
    main()
