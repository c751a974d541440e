"""Config-driven train/resume/eval API tests on the synthetic mini-KITTI."""

import numpy as np
import pytest

from tests import mini_kitti as mk


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("apis_kitti")
    gt = mk.make_tree(root, n_scenes=8)
    return root, gt


def test_train_resume_eval(tree, tmp_path_factory):
    root, _ = tree
    work = tmp_path_factory.mktemp("work")
    cfg = mk.mini_config(str(root), total_epochs=2)

    from det3d_tpu.apis import eval_detector, train_detector
    trainer = train_detector(cfg, work_dir=str(work))
    assert trainer.epoch == 2
    assert (work / "ckpt").exists()
    first_loss = trainer.log_buffer.output.get("loss")

    # resume continues the epoch counter
    cfg["total_epochs"] = 3
    trainer2 = train_detector(cfg, work_dir=str(work),
                              resume_from=str(work))
    assert trainer2.epoch == 3
    # optimizer step count matches the trainer's global iter counter
    assert int(np.asarray(trainer2.state.step)) == trainer2.iter > 0

    results, dets = eval_detector(cfg, trainer2.state, work_dir=str(work))
    assert "Car_3d_easy" in results["detail"]["eval.kitti"]["official"]
    assert len(dets) == 4                       # every val token present
    assert first_loss is None or np.isfinite(first_loss)


def test_train_eval_sparse_with_host_plan(tree, tmp_path_factory):
    """SECOND-family train/eval through the public API with the HostPlan
    stage auto-injected and multiprocess loader workers — the fast smoke
    twin of the slow sparse learning gate."""
    root, _ = tree
    work = tmp_path_factory.mktemp("work_sp")
    cfg = mk.mini_second_config(str(root), total_epochs=1, workers=2)
    cfg["checkpoint_interval"] = 10
    cfg["log_interval"] = 100

    from det3d_tpu.apis import eval_detector, train_detector
    trainer = train_detector(cfg, work_dir=str(work))
    # the injection actually happened and the loader shipped plans
    stages = [p.get("type") for p in cfg["data"]["train"]["pipeline"]]
    assert "HostPlan" in stages
    loss = trainer.log_buffer.output.get("loss")
    assert loss is None or np.isfinite(loss)

    results, _ = eval_detector(cfg, trainer.state, work_dir=str(work))
    assert "Car_3d_easy" in results["detail"]["eval.kitti"]["official"]
    val_stages = [p.get("type") for p in cfg["data"]["val"]["pipeline"]]
    assert "HostPlan" in val_stages
