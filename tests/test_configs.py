"""Every shipped config must build and trace end-to-end (shapes only)."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"
CONFIGS = sorted(p.name for p in CONFIG_DIR.glob("*.py"))


@pytest.mark.parametrize("name", CONFIGS)
def test_config_builds_and_traces(name, monkeypatch):
    monkeypatch.setenv("KITTI_DATA", "/nonexistent")
    monkeypatch.setenv("NUSC_DATA", "/nonexistent")
    from det3d_tpu.apis.train import build_stack
    from det3d_tpu.parallel.train import build_example
    from det3d_tpu.utils.config import Config

    cfg = Config.fromfile(CONFIG_DIR / name)
    model, voxel_gen, assigners, class_ids, test_cfg = build_stack(cfg)

    # anchors exist per task, flat count matches feature map x 2 rotations
    grid = voxel_gen.grid_size
    osf = int(cfg["assigner"]["out_size_factor"])
    fm_cells = (grid[0] // osf) * (grid[1] // osf)
    for a in assigners:
        assert a.anchors_flat.shape[0] % fm_cells == 0
        assert a.anchors_flat.shape[-1] in (7, 9)

    # abstract end-to-end trace: voxelize -> init -> forward (no compute)
    n_feats = int(cfg["model"]["reader"].get("num_input_features", 4))
    pts = jax.ShapeDtypeStruct((1, 2048, n_feats), jnp.float32)
    npts = jax.ShapeDtypeStruct((1,), jnp.int32)

    def init_fn(points, num_points):
        ex = build_example({"points": points, "num_points": num_points},
                           voxel_gen, [], [], with_targets=False)
        return model.init(jax.random.PRNGKey(0), ex["voxels"],
                          ex["num_points_per_voxel"], ex["coordinates"],
                          train=False)

    variables = jax.eval_shape(init_fn, pts, npts)
    assert "params" in variables
    n_params = sum(np.prod(v.shape) for v in
                   jax.tree_util.tree_leaves(variables["params"]))
    assert n_params > 1e4, n_params
