"""Op-level profile of the plan-fed serving middle (round 5).

Captures a jax.profiler device trace of probe_serve_attrib's mid_f and
aggregates XLA op durations from the XSpace proto (parsed with the
baked-in tensorflow's xplane_pb2) — the definitive attribution behind
DESIGN_NOTES §11's round-5 levers.

Run: python tools/probes/probe_trace.py [config] [batch] [points] [top_n]
"""

import collections
import glob
import gzip
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from det3d_tpu.apis.train import build_stack, host_plan_fn
    from det3d_tpu.parallel.train import TrainState, build_example
    from det3d_tpu.solver import build_optimizer, one_cycle
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch

    config = (sys.argv[1] if len(sys.argv) > 1
              else "configs/nusc_cbgs_voxelnet.py")
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    points = int(sys.argv[3]) if len(sys.argv) > 3 else 300000
    top_n = int(sys.argv[4]) if len(sys.argv) > 4 else 40

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
    if plan_fn is not None:
        plan = plan_fn(pts, np.asarray(b["num_points"]))
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

    @jax.jit
    def mid_f(d):
        ex = build_example(d, voxel_gen, [], [], with_targets=False)
        plan_d = {k[5:]: v for k, v in d.items() if k.startswith("plan_")}

        def m(mdl):
            feats = mdl.reader(ex["voxels"], ex["num_points_per_voxel"],
                               train=False)
            kw = {"plan": plan_d} if plan_d else {}
            return mdl.backbone(feats, ex["coordinates"], mdl.grid_size,
                                train=False, **kw)

        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            method=m)

    out = mid_f(data)
    float(jax.tree_util.tree_leaves(out)[0].sum())

    trace_dir = "/tmp/jax_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = mid_f(data)
        float(jax.tree_util.tree_leaves(out)[0].sum())

    # parse the xplane proto
    from tensorflow.core.profiler.protobuf import xplane_pb2
    files = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True),
                   key=lambda f: Path(f).stat().st_mtime)
    assert files, "no xplane capture"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())

    tot = collections.Counter()
    cnt = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name.strip():
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                # strip fusion instance suffixes: fusion.123 -> fusion
                key = re.sub(r"[.\d]+$", "", name)
                tot[key] += ev.duration_ps / 1e9   # -> ms
                cnt[key] += 1
    n_iters = 3
    total = sum(tot.values()) / n_iters
    print(f"device op total: {total:.2f} ms/call "
          f"({len(tot)} op groups, planes={[p.name for p in xs.planes]})")
    for name, ms in tot.most_common(top_n):
        print(f"  {ms / n_iters:8.3f} ms  x{cnt[name] // n_iters:4d}  {name}")


if __name__ == "__main__":
    main()
