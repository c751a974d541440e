"""Headline benchmark: PointPillars KITTI-car end-to-end inference, one chip.

Measures scans/sec for the FULL per-scan pipeline on device — voxelization,
pillar encoder, RPN, head, box decode, rotated NMS (fused Pallas kernel) —
matching what the reference times in tools/dist_test.py:179-217 ("Total time
per frame"), except the reference voxelizes on CPU outside the timed region
and we run it on-chip inside it.

Input: structured synthetic scans (ring/azimuth geometry + ground plane +
object clusters, tools/make_synthetic_kitti.py's generator) at the serving
operating point B=8 — uniform noise under-states voxel clustering and NMS
load, and B=1 under-states chip utilization (see docs/DESIGN_NOTES.md §6).

Baseline: the reference publishes no latency numbers. We use 60 scans/s as
the assumed PyTorch-Det3D-on-A100 single-GPU figure (original PointPillars
paper reports 62 Hz on a 1080ti for the same 0.16m config; the Det3D stack
adds CPU voxelization + python overhead, A100 buys it back). vs_baseline is
measured / (2 * 60) against the BASELINE.json target of >=2x A100.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time


BATCH = 8
POINTS = 16384


def main():
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

    # warmup / compile (readback forces completion; under the axon relay
    # block_until_ready returns before the device is done, so all timing
    # below uses a scalar host readback as the fence)
    out = predict_step(state, batch)
    float(out["scores"].sum())

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = predict_step(state, batch)
        float(out["scores"].sum())
        return time.perf_counter() - t0

    # two-point fit removes the fixed dispatch+readback RTT of the tunnel
    run(5)
    t_lo, k_lo = run(10), 10
    t_hi, k_hi = run(50), 50
    per_step = (t_hi - t_lo) / (k_hi - k_lo)
    scans_per_sec = BATCH / per_step

    print(json.dumps({
        "metric": "pointpillars_kitti_e2e_inference",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / 120.0, 3),
    }))


if __name__ == "__main__":
    main()
