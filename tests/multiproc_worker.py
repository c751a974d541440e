"""Worker for tests/test_multiprocess.py: one JAX process of a 2-process
CPU cluster (4 virtual devices each -> 8-device global mesh).

Runs one sharded train step on the small flagship stack + a sharded eval
gather, writes {loss, gathered, reduced} JSON to the given path. Parity
target: reference torchie/apis/env.py:13-52 init_dist + trainer/utils.py:
114-154 all_gather — here jax.distributed over localhost.

Invoked as:
  python multiproc_worker.py <coordinator_port> <process_id> <num_processes>
                             <out_path>
"""

import json
import os
import sys

port, pid, nproc, out_path = sys.argv[1:5]
pid, nproc = int(pid), int(nproc)

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from det3d_tpu.parallel.mesh import initialize_distributed  # noqa: E402

initialize_distributed(f"localhost:{port}", nproc, pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from __graft_entry__ import _build_flagship, _synth_batch  # noqa: E402
from det3d_tpu.parallel.dist_utils import (all_gather_objects,  # noqa: E402
                                           get_dist_info, reduce_dict,
                                           synchronize)
from det3d_tpu.parallel.train import (TrainState, build_example,  # noqa: E402
                                      make_train_step)
from det3d_tpu.solver import build_optimizer, one_cycle  # noqa: E402


def main():
    rank, world = get_dist_info()
    assert world == nproc and rank == pid, (rank, world)
    devices = jax.devices()
    assert len(devices) == 4 * nproc, devices
    mesh = Mesh(np.asarray(devices), ("data",))

    pc_range = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
    model, voxel_gen, assigners, class_ids = _build_flagship(
        voxel_size=(0.2, 0.2, 4.0), pc_range=pc_range, max_points=8,
        max_voxels=256, small=True)

    # identical global batch on every process; each contributes its
    # addressable half via make_array_from_process_local_data
    gbatch = _synth_batch(8, 512, pc_range, seed=7)
    lo, hi = rank * 4, rank * 4 + 4
    sharded = NamedSharding(mesh, P("data"))
    batch = {k: jax.make_array_from_process_local_data(sharded, v[lo:hi])
             for k, v in gbatch.items()}

    example = build_example(
        {k: jnp.asarray(v[:1]) for k, v in gbatch.items()},
        voxel_gen, [], [], with_targets=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(1e-3, 10)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)

    train_step = make_train_step(model, voxel_gen, assigners, class_ids,
                                 mesh=mesh)
    state, metrics = train_step(state, batch)
    loss = float(metrics["loss"])

    # sharded-eval merge path: per-rank detection dicts -> global merge
    local_dets = {f"tok{rank}_{i}": np.full((2,), rank * 10 + i, np.float32)
                  for i in range(3)}
    gathered = all_gather_objects(local_dets)
    merged = {}
    for d in gathered:
        merged.update(d)

    red = reduce_dict({"loss": loss, "rank": float(rank)})
    synchronize()

    with open(f"{out_path}.{rank}", "w") as f:
        json.dump({"loss": loss,
                   "merged_tokens": sorted(merged),
                   "merged_sum": float(sum(v.sum() for v in merged.values())),
                   "reduced": red}, f)


if __name__ == "__main__":
    main()
