"""Installed console entry points (``det3d-tpu-train`` etc.).

The same mains back the in-repo ``tools/*.py`` scripts; packaging them
inside the wheel makes a ``pip install det3d-tpu`` usable without a
checkout. Parity: reference setup.py + tools/train.py:56-147,
tools/test.py, tools/create_data.py.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def train_main():
    from det3d_tpu.utils.env import setup_jax_from_env
    setup_jax_from_env()

    parser = argparse.ArgumentParser(description="Train a detector")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--work_dir", default=None)
    parser.add_argument("--resume_from", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--coordinator", default=None,
                        help="coordinator addr for multi-host runs")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args()

    from det3d_tpu.apis import train_detector
    from det3d_tpu.parallel.mesh import initialize_distributed
    from det3d_tpu.utils.config import Config

    if args.coordinator:
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or f"work_dirs/{Path(args.config).stem}"
    cfg["_text"] = cfg.text
    train_detector(cfg, work_dir=work_dir, resume_from=args.resume_from,
                   seed=args.seed)


def test_main():
    from det3d_tpu.utils.env import setup_jax_from_env
    setup_jax_from_env()

    parser = argparse.ArgumentParser(description="Evaluate a detector")
    parser.add_argument("config")
    parser.add_argument("checkpoint", help="work_dir containing ckpt/")
    parser.add_argument("--work_dir", default=None)
    parser.add_argument("--split", default="val")
    parser.add_argument("--epoch", type=int, default=None)
    args = parser.parse_args()

    from det3d_tpu.apis import eval_detector
    from det3d_tpu.apis.train import batch_to_device, build_stack, init_state
    from det3d_tpu.datasets import build_dataset
    from det3d_tpu.datasets.loader.loader import collate
    from det3d_tpu.runtime.checkpoint import CheckpointManager
    from det3d_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    model, voxel_gen, assigners, class_ids, test_cfg = build_stack(cfg)

    # template state (shapes only), then restore weights
    ds = build_dataset(cfg["data"][args.split])
    sample = collate([ds[0]])
    state, _ = init_state(cfg, model, voxel_gen, batch_to_device(sample),
                          total_steps=1)
    mgr = CheckpointManager(str(Path(args.checkpoint) / "ckpt"))
    state, epoch = mgr.restore(state, epoch=args.epoch)
    print(f"restored checkpoint @ epoch {epoch}")

    results, detections = eval_detector(
        cfg, state, work_dir=args.work_dir or args.checkpoint,
        split=args.split)
    print(results["results"]["official"])


def _kitti_data_prep(root_path):
    from det3d_tpu.datasets.kitti.kitti_common import (
        create_kitti_info_file, create_reduced_point_cloud)
    from det3d_tpu.datasets.utils.create_gt_database import (
        create_groundtruth_database)
    create_kitti_info_file(root_path)
    for split in ("train", "val", "test"):
        info = Path(root_path) / f"kitti_infos_{split}.pkl"
        if info.exists():
            create_reduced_point_cloud(root_path, str(info))
    create_groundtruth_database(
        "KittiDataset", root_path,
        str(Path(root_path) / "kitti_infos_train.pkl"))


def _nuscenes_data_prep(root_path, version="v1.0-trainval", nsweeps=10):
    from det3d_tpu.datasets.nuscenes.nusc_common import create_nuscenes_infos
    from det3d_tpu.datasets.utils.create_gt_database import (
        create_groundtruth_database)
    create_nuscenes_infos(root_path, version=version, nsweeps=nsweeps)
    if "test" not in version:
        create_groundtruth_database(
            "NuScenesDataset", root_path,
            str(Path(root_path)
                / f"infos_train_{nsweeps:02d}sweeps_withvelo.pkl"),
            dbinfo_path=str(Path(root_path)
                            / f"dbinfos_train_{nsweeps:02d}sweeps.pkl"),
            nsweeps=nsweeps)


def _lyft_data_prep(root_path, version="v1.0-trainval", nsweeps=10):
    from det3d_tpu.datasets.lyft.lyft import create_lyft_infos
    create_lyft_infos(root_path, version=version, nsweeps=nsweeps)


def create_data_main():
    parser = argparse.ArgumentParser(description="Dataset preparation")
    sub = parser.add_subparsers(dest="cmd", required=True)

    k = sub.add_parser("kitti_data_prep")
    k.add_argument("--root_path", required=True)

    n = sub.add_parser("nuscenes_data_prep")
    n.add_argument("--root_path", required=True)
    n.add_argument("--version", default="v1.0-trainval")
    n.add_argument("--nsweeps", type=int, default=10)

    ly = sub.add_parser("lyft_data_prep")
    ly.add_argument("--root_path", required=True)
    ly.add_argument("--version", default="v1.0-trainval")
    ly.add_argument("--nsweeps", type=int, default=10)

    args = parser.parse_args()
    if args.cmd == "kitti_data_prep":
        _kitti_data_prep(args.root_path)
    elif args.cmd == "nuscenes_data_prep":
        _nuscenes_data_prep(args.root_path, args.version, args.nsweeps)
    elif args.cmd == "lyft_data_prep":
        _lyft_data_prep(args.root_path, args.version, args.nsweeps)
