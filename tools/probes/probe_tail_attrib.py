"""CBGS middle internals: sparse prefix vs dense tail vs band-prep cost
(round 5).

probe_mid_attrib's per-conv sums (~105 ms/call at B=2 bf16) leave ~45
ms/call of the measured 149.6 ms reader+middle unattributed. This probe
splits the REAL plan-fed middle (same params, same plan) into

  middle_full    — the production forward (probe_serve_attrib's mid_f)
  sparse_prefix  — res0 + stage1 + down2 only (stop before to_dense)
  prep_s0        — band_window_conv's plan-pure prep (packed/offs/lo) for
                   the s0 rulebook, alone: the per-conv int overhead the
                   stage could hoist/share (5 s0 convs share one rulebook)
  xw_prep        — the per-conv super-row concat + band slice (feature-
                   dependent, not hoistable across convs; sets the floor)

Run: python tools/probes/probe_tail_attrib.py [config] [batch] [points]
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
    from det3d_tpu.parallel.train import (TrainState, build_example)
    from det3d_tpu.solver import build_optimizer, one_cycle
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch
    from det3d_tpu.ops import sparse as sp

    config = (sys.argv[1] if len(sys.argv) > 1
              else "configs/nusc_cbgs_voxelnet.py")
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
    data = {"points": jnp.asarray(pts),
            "num_points": jnp.asarray(b["num_points"])}
    plan_fn = host_plan_fn(model, voxel_gen, train=False, voxelize=True)
    plan = plan_fn(pts, np.asarray(b["num_points"]))
    data.update({k: jnp.asarray(v) for k, v in plan.items()})

    example = build_example(data, voxel_gen, [], [], with_targets=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(1e-3, 10)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    from det3d_tpu.parallel.train import TrainState
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)

    out = [None]

    def fence():
        float(jax.tree_util.tree_leaves(out[0])[0].sum())

    def run_mid(d, dense_tail):
        ex = build_example(d, voxel_gen, [], [], with_targets=False)
        plan_d = {k[5:]: v for k, v in d.items() if k.startswith("plan_")}

        def m(mdl):
            feats = mdl.reader(ex["voxels"], ex["num_points_per_voxel"],
                               train=False)
            bk = mdl.backbone
            if not dense_tail:
                bk = bk.clone(dense_tail=False)
            return bk(feats, ex["coordinates"], mdl.grid_size,
                      train=False, plan=plan_d)

        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            method=m)

    full_j = jax.jit(lambda d: run_mid(d, True))
    def full():
        out[0] = full_j(data)
    t_full = timeit(full, fence)
    print(f"middle full (dense tail)  : {t_full*1e3:7.2f} ms")

    # all-sparse variant (dense_tail=False runs stages 1-4 sparse): not a
    # prefix, but the A/B for dense_from retirement
    try:
        sp_j = jax.jit(lambda d: run_mid(d, False))
        def allsp():
            out[0] = sp_j(data)
        t_sp = timeit(allsp, fence)
        print(f"middle all-sparse         : {t_sp*1e3:7.2f} ms")
    except Exception as e:
        print(f"middle all-sparse         : n/a ({type(e).__name__}: {e})")

    # band prep cost for the s0 rulebook (plan-pure ints)
    from det3d_tpu.ops.band_conv import plan_band, _PACK_MASK, _PACK_SHIFT
    pk = np.asarray(plan["plan_s0"])
    bd = int(np.ceil(plan_band(pk) / 128) * 128)
    cb = plan_band(pk, per_col=True)
    s0 = sp.unpack_windows(jnp.asarray(plan["plan_s0"]), 3)
    r0, pres = s0[0], s0[1]
    B, V, K = r0.shape
    R = 256
    S = bd
    Sc = int(np.ceil(cb / 128) * 128)
    cc = K // 2
    cols = np.asarray([c for c in range(K) if c != cc], np.int32)
    Kc = len(cols)

    @jax.jit
    def prep(r0, pres):
        O = r0.shape[1]
        nb = -(-O // R)
        Vp = nb * R
        r0s = r0[:, :, cols]
        press = pres[:, :, cols]
        r0p = jnp.pad(r0s, ((0, 0), (0, Vp - O), (0, 0)))
        presp = jnp.pad(press, ((0, 0), (0, Vp - O), (0, 0), (0, 0)))
        pany = presp.any(-1)
        r0b = r0p.reshape(B, nb, R * Kc)
        panyb = pany.reshape(B, nb, R * Kc)
        lo = jnp.min(jnp.where(panyb, r0b, V), axis=-1)
        lo = jnp.minimum(lo, V + 2).astype(jnp.int32)
        r0k = r0p.reshape(B, nb, R, Kc)
        pak = pany.reshape(B, nb, R, Kc)
        lok = jnp.min(jnp.where(pak, r0k, V), axis=2)
        offs = jnp.clip((lok - lo[:, :, None]) & ~7, 0, S - Sc)
        base = lo[:, :, None] + offs.astype(jnp.int32)
        loc = (r0k - base[:, :, None, :]).reshape(B, nb, R * Kc)
        loc = jnp.where(panyb, loc, Sc).reshape(B, Vp, Kc)
        pbits = jnp.zeros(presp.shape[:-1], jnp.int32)
        for j in range(3):
            pbits = pbits | (presp[..., j].astype(jnp.int32) << j)
        packed = (loc & _PACK_MASK) | (pbits << _PACK_SHIFT)
        return packed, offs.astype(jnp.int32), lo

    def fprep():
        out[0] = prep(r0, pres)
    t_prep = timeit(fprep, fence)
    print(f"band prep (s0, per conv)  : {t_prep*1e3:7.2f} ms "
          f"(5 s0 convs pay it each today)")

    # xw concat + xs slice at s0 scale (feature-dependent part)
    x16 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, V, 16)), jnp.bfloat16)
    packed, offs, lo = jax.tree_util.tree_map(jnp.asarray, prep(r0, pres))

    @jax.jit
    def xwprep(features, lo):
        kz = 3
        fpad = jnp.pad(features, ((0, 0), (0, kz - 1), (0, 0)))
        xw = jnp.concatenate([fpad[:, j:j + V] for j in range(kz)], axis=-1)
        xpad = jnp.pad(xw, ((0, 0), (0, S), (0, 0)))
        xs = jax.vmap(lambda xp, st: jax.vmap(
            lambda s: jax.lax.dynamic_slice(xp, (s, 0), (S, xw.shape[-1])))(
                st))(xpad, lo)
        return xs

    def fxw():
        out[0] = xwprep(x16, lo)
    t_xw = timeit(fxw, fence)
    print(f"xw+xs prep (s0, per conv) : {t_xw*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
