"""Driver benchmark: the serving workloads on one chip, one JSON line
each — flagship LAST (the driver parses the final line; the tail keeps
the rest).

  1. second_kitti_predict   — SECOND (sparse middle) predict ms/scan @ B=2
  2. cbgs_nusc_predict      — CBGS nuScenes predict ms/scan @ B=2
                              (300k-point 10-sweep clouds, 60k voxels,
                              10 classes, 6 heads, dense_from=2)
  3. nusc_pointpillars_predict — nuScenes PointPillars ms/scan @ B=2
                              (lyft_cbgs shares this stack; no extra row)
  4. pointpillars_kitti_e2e_inference — scans/s @ B=8 (headline)

Each times the per-scan serving step on device — network, box decode,
rotated NMS — under the reference's timed contract
(tools/dist_test.py:179-217, "Total time per frame", which keeps CPU
voxelization outside the timed region: the reference's DataLoader workers
build the ``voxels`` tensors the timed step consumes). The three config
rows match that contract exactly: apis.train.host_plan_fn(voxelize=True)
voxelizes on the host (ops/voxelize_host.py, bit-exact vs the on-device
voxelizer) and builds the packed rulebook plans (sparse middles), exactly
as the reference's CPU voxelize + spconv host-side index-pair build; both
are CPU work that pipelines under serving prefetch (cost printed as a
comment line). The FLAGSHIP row keeps voxelization ON-chip inside the
timed region (a stricter-than-reference e2e contract it clears anyway).

Inputs: structured synthetic scans (ring/azimuth geometry + ground plane +
object clusters; uniform noise under-states voxel clustering and NMS load).

Baselines (the reference publishes no latency numbers; assumptions stated):
  * pillars: 60 scans/s assumed PyTorch-Det3D-on-A100 (PointPillars paper
    reports 62 Hz on a 1080ti for the same 0.16m config; Det3D's CPU
    voxelize + python overhead vs A100 roughly cancel). vs_baseline =
    measured / (2 * 60) against the >=2x-A100 target.
  * SECOND KITTI: 30 scans/s assumed A100 (SECOND paper: ~25 fps on a
    1080Ti for the 0.05m config; spconv2+A100 buys ~20%).
  * CBGS nuScenes: 15 scans/s assumed A100 (10-sweep 300k-point clouds,
    60k voxels, 6 task heads — the production-heavy config).
  * nuScenes PointPillars: 25 scans/s assumed A100 (same 10-sweep clouds,
    0.2m pillars, 6 task heads; pillar scatter+2D trunk is ~2.4x the
    KITTI config's work but the head count dominates).

A persistent XLA compilation cache (.jax_bench_cache/, gitignored) makes
repeat runs compile-free. Sparse sections respect a wall-clock budget
(BENCH_BUDGET_S, default 2400 s) and are individually fault-isolated; the
flagship line always prints, and always prints last.
"""

import json
import os
import time


BATCH = 8
POINTS = 16384
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2400"))
_T0 = time.time()


def _slope(run, k_lo=10, k_hi=50):
    """Two-point fit removes the fixed dispatch+readback RTT of the axon
    tunnel (block_until_ready does not actually block there)."""
    run(5)
    return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)


def bench_flagship():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_flagship
    from det3d_tpu.parallel.train import (TrainState, build_example,
                                          make_predict_step)
    from det3d_tpu.solver import build_optimizer, one_cycle
    from det3d_tpu.utils.synth import structured_batch

    pc_range = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    model, voxel_gen, assigners, class_ids = _build_flagship(
        voxel_size=(0.16, 0.16, 4.0), pc_range=pc_range,
        max_points=32, max_voxels=12000)
    test_cfg = dict(
        nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
                 nms_pre_max_size=1000, nms_post_max_size=300,
                 nms_iou_threshold=0.5),
        score_threshold=0.05,
        post_center_limit_range=[0, -40.0, -5.0, 70.4, 40.0, 5.0],
        max_per_img=100,
    )

    batch = {k: jnp.asarray(v)
             for k, v in structured_batch(BATCH, POINTS, pc_range,
                                          seed=3).items()}
    example = build_example(batch, voxel_gen, [], [], with_targets=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(1e-3, 10)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    predict_step = make_predict_step(model, voxel_gen, assigners, class_ids,
                                     test_cfg)
    out = predict_step(state, batch)
    float(out["scores"].sum())                 # warmup fence (see _slope)

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = predict_step(state, batch)
        float(out["scores"].sum())
        return time.perf_counter() - t0

    per_step = _slope(run)
    scans_per_sec = BATCH / per_step
    return {
        "metric": "pointpillars_kitti_e2e_inference",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / 120.0, 3),
    }


def bench_config(config_path, metric, batch, points, baseline_scans):
    """Predict ms/scan for a parity config through the public API.

    Sparse-middle configs get host-precomputed rulebook plans fed with the
    batch (see module docstring for why that matches the reference's timed
    contract); the plan-build cost is printed as a comment line."""
    import numpy as np
    import jax.numpy as jnp
    from det3d_tpu.apis.train import build_stack, host_plan_fn
    from det3d_tpu.parallel.train import (TrainState, build_example,
                                          make_predict_step)
    from det3d_tpu.solver import build_optimizer, one_cycle
    from det3d_tpu.utils.synth import structured_batch
    import jax

    from det3d_tpu.utils.config import Config
    cfg = Config.fromfile(config_path)
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
    if plan_fn is not None:
        plan_fn(pts, np.asarray(b["num_points"]))     # warm (lazy g++ etc.)
        t0 = time.perf_counter()
        plan = plan_fn(pts, np.asarray(b["num_points"]))
        plan_ms = (time.perf_counter() - t0) / batch * 1e3
        print(f"# {metric}: host plan build {plan_ms:.1f} ms/scan "
              f"(CPU, one core; pipelines under serving prefetch)",
              flush=True)
        data.update({k: jnp.asarray(v) for k, v in plan.items()})

    example = build_example(data, voxel_gen, [], [], with_targets=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(1e-3, 10)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    predict_step = make_predict_step(model, voxel_gen, assigners, class_ids,
                                     test_cfg)
    out = predict_step(state, data)
    float(out["scores"].sum())

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = predict_step(state, data)
        float(out["scores"].sum())
        return time.perf_counter() - t0

    per_step = _slope(run, k_lo=5, k_hi=25)
    ms_per_scan = per_step / batch * 1e3
    scans_per_sec = batch / per_step
    return {
        "metric": metric,
        "value": round(ms_per_scan, 2),
        "unit": "ms/scan",
        "vs_baseline": round(scans_per_sec / (2.0 * baseline_scans), 3),
    }


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_bench_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    lines = []
    for fn, args in (
            (bench_config, ("configs/kitti_car_second.py",
                            "second_kitti_predict", 2, POINTS, 30.0)),
            (bench_config, ("configs/nusc_cbgs_voxelnet.py",
                            "cbgs_nusc_predict", 2, 300000, 15.0)),
            (bench_config, ("configs/nusc_pointpillars.py",
                            "nusc_pointpillars_predict", 2, 300000, 25.0)),
    ):
        if time.time() - _T0 > BUDGET_S:
            print(f"# skipped {args[1]}: over BENCH_BUDGET_S", flush=True)
            continue
        try:
            lines.append(fn(*args))
            print(json.dumps(lines[-1]), flush=True)
        except Exception as e:           # never let a sparse section kill
            print(f"# {args[1]} failed: {type(e).__name__}: {e}",
                  flush=True)

    print(json.dumps(bench_flagship()), flush=True)


if __name__ == "__main__":
    main()
