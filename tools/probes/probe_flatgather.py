"""A/B the window conv's gather batching: vmapped per-sample slice-gather
vs one flat global gather with per-sample rank offsets.

Run: python tools/probes/probe_flatgather.py [batch] [v] [channels]
"""

import sys
import time
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    v = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    kz, kbev = 3, 9
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(batch, v, c).astype(np.float32))
    r0 = jnp.asarray(
        np.sort(rng.randint(0, v, (batch, v, kbev)).astype(np.int32), 1))
    pres = jnp.asarray(rng.rand(batch, v, kbev, kz) < 0.6)
    w = jnp.asarray(rng.randn(kz * kbev, c, c).astype(np.float32) * .05)

    def impl_vmap(features, r0, pres, weights, center_shift):
        b, o, _ = r0.shape
        kz = pres.shape[-1]
        cout = weights.shape[-1]
        w_cols, cols, cc = sp._split_cols(r0, pres, weights, center_shift)
        out = None
        if center_shift:
            for j, tap in enumerate(
                    sp._center_taps(features, pres[:, :, cc])):
                y = jnp.einsum("boc,cd->bod", tap, w_cols[cc, j],
                               preferred_element_type=jnp.float32)
                out = y if out is None else out + y
        fpad = jnp.pad(features, ((0, 0), (0, kz - 1), (0, 0)))
        r0c = jnp.minimum(r0, features.shape[1] - 1)
        r_s = r0c[:, :, cols].transpose(2, 0, 1)
        p_s = pres[:, :, cols].transpose(2, 0, 1, 3)
        w_s = w_cols[cols]

        def body(acc, args):
            rk, pk, wk = args
            y = jax.vmap(sp._window_column, in_axes=(0, 0, 0, None))(
                fpad, rk, pk, wk)
            return acc + y, None

        init = (jnp.zeros((b, o, cout), jnp.float32) if out is None else out)
        out, _ = jax.lax.scan(body, init, (r_s, p_s, w_s))
        return out

    impl_flat = sp._window_conv_impl

    for cs in (True, False):
        for tag, impl in (("vmap", impl_vmap), ("flat", impl_flat)):
            f = jax.jit(lambda ff, rr, pp, ww, _impl=impl, _cs=cs:
                        _impl(ff, rr, pp, ww, _cs))
            t = timeit(lambda: f(feats, r0, pres, w),
                       lambda: float(f(feats, r0, pres, w).sum()))
            print(f"center_shift={cs} {tag}: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
