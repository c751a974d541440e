"""Two-PROCESS distributed execution test (not just two devices).

Spawns 2 subprocesses that form a real jax.distributed cluster over
localhost (4 virtual CPU devices each -> one 8-device global mesh), run
one sharded train step, and merge per-rank detections through the pickled
all_gather path. Asserts both ranks agree and that the 2-process loss
equals a single-process 8-device run of the same step — the multi-host
story the reference exercises via init_dist + slurm
(torchie/apis/env.py:13-52, trainer/utils.py:114-154).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_and_eval_gather(tmp_path):
    root = Path(__file__).resolve().parents[1]
    worker = root / "tests" / "multiproc_worker.py"
    port = _free_port()
    out = tmp_path / "out"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    env["PYTHONPATH"] = str(root)

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(r), "2", str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for r in range(2)]
    outputs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    results = []
    for r in range(2):
        with open(f"{out}.{r}") as f:
            results.append(json.load(f))

    # both ranks computed the same globally-reduced loss
    assert np.isfinite(results[0]["loss"])
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-5)

    # the eval merge saw every rank's detections, identically on all ranks
    expect = sorted(f"tok{r}_{i}" for r in range(2) for i in range(3))
    for res in results:
        assert res["merged_tokens"] == expect
        assert res["merged_sum"] == pytest.approx(
            sum(2 * (r * 10 + i) for r in range(2) for i in range(3)))

    # reduce_dict averaged over ranks: mean rank = 0.5
    assert results[0]["reduced"]["rank"] == pytest.approx(0.5)

    # and the 2-process global step matches a single-process 8-device run
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from __graft_entry__ import _build_flagship, _synth_batch
    from det3d_tpu.parallel.train import (TrainState, build_example,
                                          make_train_step)
    from det3d_tpu.solver import build_optimizer, one_cycle

    pc_range = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
    model, voxel_gen, assigners, class_ids = _build_flagship(
        voxel_size=(0.2, 0.2, 4.0), pc_range=pc_range, max_points=8,
        max_voxels=256, small=True)
    gbatch = {k: jnp.asarray(v)
              for k, v in _synth_batch(8, 512, pc_range, seed=7).items()}
    example = build_example(
        {k: v[:1] for k, v in gbatch.items()}, voxel_gen, [], [],
        with_targets=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(1e-3, 10)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    train_step = make_train_step(model, voxel_gen, assigners, class_ids,
                                 mesh=mesh)
    _, metrics = train_step(state, gbatch)
    assert results[0]["loss"] == pytest.approx(float(metrics["loss"]),
                                               rel=2e-4)
