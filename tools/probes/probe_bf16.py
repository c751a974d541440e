"""bf16 serving probe: speed + box parity of the flagship predict path.

PointPillars predict measures HBM-bound at fp32 (tools/mfu.py: 96.8%
bandwidth utilization, 7.2% MFU) — bf16 activations should convert
bandwidth into throughput nearly 1:1. This probe times fp32 vs bf16
predict on the same weights and checks detection parity (same kept boxes
within tolerance) on structured synthetic scans.

Run on the real TPU: python tools/probe_bf16.py [batch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def timeit(fn, fence, k_lo=10, k_hi=50):
    fn(); fence()
    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            fn()
        fence()
        return time.perf_counter() - t0
    run(5)
    return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_flagship
    from det3d_tpu.parallel.train import (TrainState, build_example,
                                          make_predict_step)
    from det3d_tpu.solver import build_optimizer, one_cycle
    from det3d_tpu.utils.synth import structured_batch

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    precisions = (sys.argv[2].split(",") if len(sys.argv) > 2
                  else ["fp32", "bf16"])
    pc_range = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    test_cfg = dict(
        nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
                 nms_pre_max_size=1000, nms_post_max_size=300,
                 nms_iou_threshold=0.5),
        score_threshold=0.05,
        post_center_limit_range=[0, -40.0, -5.0, 70.4, 40.0, 5.0],
        max_per_img=100)

    b = structured_batch(batch_size, 16384, pc_range, seed=3)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    results = {}
    state = None
    for prec in precisions:
        model, voxel_gen, assigners, class_ids = _build_flagship(
            voxel_size=(0.16, 0.16, 4.0), pc_range=pc_range,
            max_points=32, max_voxels=12000, precision=prec)
        example = build_example(batch, voxel_gen, [], [],
                                with_targets=False)
        if state is None:
            variables = jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), example["voxels"],
                example["num_points_per_voxel"], example["coordinates"],
                train=False)
            lr_fn, mom_fn = one_cycle(1e-3, 10)
            tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                                      FIXED_WD=True), lr_fn, mom_fn)
            state = TrainState.create(variables["params"],
                                      variables["batch_stats"], tx)
        predict = make_predict_step(model, voxel_gen, assigners, class_ids,
                                    test_cfg)
        out = predict(state, batch)
        t = timeit(lambda: predict(state, batch),
                   lambda: float(predict(state, batch)["scores"].sum()))
        results[prec] = (t, {k: np.asarray(v) for k, v in out.items()})
        print(f"{prec}: {t * 1e3:7.2f} ms/step "
              f"({batch_size / t:6.1f} scans/s)")

    if not ("fp32" in results and "bf16" in results):
        return
    (t32, o32), (t16, o16) = results["fp32"], results["bf16"]
    print(f"speedup: {t32 / t16:.2f}x")
    n32 = int((o32["scores"] > 0.3).sum())
    n16 = int((o16["scores"] > 0.3).sum())
    print(f"detections >0.3: fp32={n32} bf16={n16}")
    m32, m16 = o32["scores"] > 0.3, o16["scores"] > 0.3
    if n32 == n16 and n32 > 0 and (m32 == m16).all():
        d = np.abs(o32["box3d_lidar"][m32] - o16["box3d_lidar"][m16])
        s = np.abs(o32["scores"][m32] - o16["scores"][m16])
        print(f"box parity: max center/dim delta {d[:, :6].max():.4f} m, "
              f"max angle delta {d[:, 6].max():.4f} rad, "
              f"max score delta {s.max():.4f}")
    else:
        print("kept sets differ — inspect before flipping the default")


if __name__ == "__main__":
    main()
