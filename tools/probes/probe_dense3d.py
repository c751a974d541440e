"""Dense-tail conv3d formulation shootout (round 5).

The CBGS dense tail's stage-2 convs — (B=2, 11, 256, 256, 64) 3x3x3 —
measured 8.58 ms/conv bf16 (probe_mid_attrib), ~19% MFU: XLA's conv3d
tiling underuses the MXU at this D-shallow shape. Candidates, all exactly
equal to the straight conv3d (padding 1, stride 1):

  conv3d       — lax.conv_general_dilated NDHWC (production r4)
  conv3d_hwd   — same op, D as the LAST spatial dim (NHWDC layout)
  zslab        — 3 conv2d taps over (B*D, H, W, C) with z-shifted sums
                 (re-test at THIS scale; lost 2x at the res3 (2,5,200,176)
                 scale per backbones.py's comment)
  zfold        — one conv2d over (B, H, W, D*C) with a block-banded
                 (3,3,D*C,D*Cout) weight: z taps become channel bands;
                 wasted FLOPs ~ 2/D, MXU-friendly K dim (D*C wide)

Run: python tools/probes/probe_dense3d.py
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
    from jax import lax

    rng = np.random.default_rng(0)
    out = [None]

    def fence():
        out[0].block_until_ready()
        float(out[0].sum())

    for (B, D, H, W, C, Co) in ((2, 11, 256, 256, 64, 64),
                                (2, 5, 128, 128, 128, 128)):
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, C, Co)) * .1,
                        jnp.bfloat16)

        c3 = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
        ref = np.asarray(c3(x, w), np.float32)
        def f3():
            out[0] = c3(x, w)
        t3 = timeit(f3, fence)

        xh = jnp.transpose(x, (0, 2, 3, 1, 4))          # (B, H, W, D, C)
        wh = jnp.transpose(w, (1, 2, 0, 3, 4))          # (ky,kx,kz,ci,co)
        ch = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
        err = (np.abs(np.transpose(np.asarray(ch(xh, wh), np.float32),
                                   (0, 3, 1, 2, 4)) - ref).max()
               / np.abs(ref).max())
        assert err < 2e-2, err
        def fh():
            out[0] = ch(xh, wh)
        th = timeit(fh, fence)

        def zslab_f(x, w):
            xr = x.reshape(B * D, H, W, C)
            y = None
            for dz in (-1, 0, 1):
                y2 = lax.conv_general_dilated(
                    xr, w[dz + 1], (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y2 = y2.reshape(B, D, H, W, Co)
                if dz < 0:
                    # tap reads x[z-1]: slab z' feeds output z'+1
                    y2 = jnp.pad(y2[:, :-1], ((0, 0), (1, 0), (0, 0),
                                              (0, 0), (0, 0)))
                elif dz > 0:
                    y2 = jnp.pad(y2[:, 1:], ((0, 0), (0, 1), (0, 0),
                                             (0, 0), (0, 0)))
                y = y2 if y is None else y + y2
            return y
        cz = jax.jit(zslab_f)
        err = (np.abs(np.asarray(cz(x, w), np.float32) - ref).max()
               / np.abs(ref).max())
        assert err < 2e-2, err
        def fz():
            out[0] = cz(x, w)
        tz = timeit(fz, fence)

        # zfold: channels = D*C; weight (3, 3, D*C, D*Co) with band
        # structure w2[:, :, d*C:(d+1)*C, e*Co:(e+1)*Co] = w[e-d+1] for
        # |e-d| <= 1 (z padding 1 == zero bands)
        w2 = np.zeros((3, 3, D * C, D * Co), np.float32)
        wn = np.asarray(w, np.float32)
        for d in range(D):
            for e in range(max(0, d - 1), min(D, d + 2)):
                w2[:, :, d * C:(d + 1) * C, e * Co:(e + 1) * Co] = \
                    wn[d - e + 1]
        w2 = jnp.asarray(w2, jnp.bfloat16)
        xf = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, H, W, D * C)
        cf = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        yf = np.asarray(cf(xf, w2), np.float32).reshape(B, H, W, D, Co)
        err = (np.abs(np.transpose(yf, (0, 3, 1, 2, 4)) - ref).max()
               / np.abs(ref).max())
        assert err < 2e-2, err
        def ff():
            out[0] = cf(xf, w2)
        tf = timeit(ff, fence)

        gf = 2 * B * D * H * W * 27 * C * Co / 1e9
        print(f"({B},{D},{H},{W},{C})->{Co}  {gf:.0f} GFLOP")
        for name, t in (("conv3d", t3), ("conv3d_hwd", th),
                        ("zslab", tz), ("zfold", tf)):
            print(f"  {name:11s} {t*1e3:7.2f} ms  "
                  f"{gf / t / 1e3:6.1f} TF/s")


if __name__ == "__main__":
    main()
