"""Per-conv attribution of the plan-fed serving middle (round 5).

Times, on the chip, each formulation of each conv kind at the REAL plan
shapes of a config (rulebooks unpacked from an actual host plan over
structured scans; random features):

  * subm conv per stage: slice-gather vs band(S) vs band(S, col_band),
    fp32 vs bf16
  * strided (down) conv per stage: slice-gather vs band(col) variants
  * dense tail: to_dense + the DenseConvBN chain at stage shapes

Run: python tools/probes/probe_mid_attrib.py [config] [batch] [points]
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
    from det3d_tpu.apis.train import build_stack, host_plan_fn
    from det3d_tpu.models.backbones import middle_plan_spec
    from det3d_tpu.ops import sparse as sp
    from det3d_tpu.ops.band_conv import band_window_conv, plan_band
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch

    config = sys.argv[1] if len(sys.argv) > 1 else "configs/nusc_cbgs_voxelnet.py"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    points = int(sys.argv[3]) if len(sys.argv) > 3 else 300000

    cfg = Config.fromfile(config)
    model, voxel_gen, assigners, class_ids, test_cfg = build_stack(cfg)
    pc_range = tuple(cfg["voxel_generator"]["range"])
    n_feats = cfg["model"]["reader"].get("num_input_features", 4)

    b = structured_batch(batch, points, pc_range, seed=3)
    pts = np.asarray(b["points"])[..., :4]
    if n_feats > 4:
        pts = np.concatenate(
            [pts, np.zeros(pts.shape[:-1] + (n_feats - 4,), np.float32)],
            axis=-1)
    plan_fn = host_plan_fn(model, voxel_gen, train=False)
    plan = plan_fn(pts, np.asarray(b["num_points"]))

    rng = np.random.default_rng(0)

    def feats(v, c, dt):
        return jnp.asarray(rng.standard_normal((batch, v, c)), dt)

    out = [None]

    def fence():
        float(jax.tree_util.tree_leaves(out[0])[0].sum())

    def bench_conv(name, r0, pres, cin, cout, center_shift):
        pk = np.asarray(plan[f"plan_{name}"])
        bd = int(np.ceil(plan_band(pk) / 128) * 128)
        cb = plan_band(pk, per_col=True)
        v = r0.shape[1]
        rows = []
        for dt in (jnp.float32, jnp.bfloat16):
            x = feats(v, cin, dt)
            w = jnp.asarray(
                rng.standard_normal((27 if r0.shape[-1] == 9 else
                                     3 * r0.shape[-1], cin, cout)) * .1, dt)
            zt = sp.center_column_taps(3) if center_shift else None

            g = jax.jit(lambda x, w: sp.apply_conv(x, r0, pres, w,
                                                   z_shift_taps=zt))
            def fg():
                out[0] = g(x, w)
            t_g = timeit(fg, fence)

            bb = jax.jit(lambda x, w: band_window_conv(
                x, r0, pres, w, band=bd, center_shift=center_shift))
            def fb():
                out[0] = bb(x, w)
            t_b = timeit(fb, fence)

            bc = jax.jit(lambda x, w: band_window_conv(
                x, r0, pres, w, band=bd, col_band=cb,
                center_shift=center_shift))
            def fc():
                out[0] = bc(x, w)
            t_c = timeit(fc, fence)
            rows.append((str(np.dtype(dt).name), t_g, t_b, t_c))
        print(f"{name} V={v} {cin}->{cout} band={bd} col={cb}")
        for dtn, t_g, t_b, t_c in rows:
            print(f"  {dtn:9s} gather {t_g*1e3:7.2f}  band {t_b*1e3:7.2f}"
                  f"  band+col {t_c*1e3:7.2f} ms/conv")

    spec = middle_plan_spec(model.backbone, voxel_gen.grid_size,
                            voxel_gen.max_voxels)
    shape = tuple(spec["shape0"])
    # channel plan per stage for the two middle families
    resnet = "ResNet" in type(model.backbone).__name__
    ch = [16, 32, 64, 128] if resnet else [16, 32, 64, 64]

    s0 = sp.unpack_windows(jnp.asarray(plan["plan_s0"]), 3)
    bench_conv("s0", s0[0], s0[1], ch[0], ch[0], True)
    for i, st in enumerate(spec["stages"], start=1):
        d = sp.unpack_windows(jnp.asarray(plan[f"plan_down{i}"]),
                              st["kernel"][0])
        bench_conv(f"down{i}", d[0], d[1], ch[i - 1], ch[i], False)
        if st["subm"]:
            s = sp.unpack_windows(jnp.asarray(plan[f"plan_subm{i}"]), 3)
            bench_conv(f"subm{i}", s[0], s[1], ch[i], ch[i], True)

    # dense tail at this config's stage shapes (ResNet/CBGS: from stage 2)
    from det3d_tpu.models.backbones import _cover_mask
    import jax.lax as lax
    if model.backbone.dense_tail:
        start = max(1, model.backbone.dense_from)
        shp = shape
        for i, (k, s, p) in enumerate(
                ((3, 2, (1, 1, 1)), (3, 2, (1, 1, 1)), (3, 2, (0, 1, 1))),
                start=1):
            shp = sp.out_spatial_shape(shp, k, s, p)
            if i < start:
                continue
            c = ch[i]
            for dt in (jnp.float32, jnp.bfloat16):
                x = jnp.asarray(rng.standard_normal((batch,) + shp + (c,)),
                                dt)
                w = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * .1,
                                dt)
                conv = jax.jit(lambda x, w: lax.conv_general_dilated(
                    x, w, (1, 1, 1), ((1, 1),) * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
                def fd():
                    out[0] = conv(x, w)
                t = timeit(fd, fence)
                print(f"dense conv3d {shp} c={c} {np.dtype(dt).name}: "
                      f"{t*1e3:7.2f} ms/conv")


if __name__ == "__main__":
    main()
