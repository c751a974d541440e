"""Offline data preparation. Parity: reference tools/create_data.py (fire
CLI there; argparse subcommands here).

Usage:
  python tools/create_data.py kitti_data_prep --root_path /data/kitti
  python tools/create_data.py nuscenes_data_prep --root_path /data/nuscenes \
      --version v1.0-trainval --nsweeps 10
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def kitti_data_prep(root_path):
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


def nuscenes_data_prep(root_path, version="v1.0-trainval", nsweeps=10):
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


def lyft_data_prep(root_path, version="v1.0-trainval", nsweeps=10):
    from det3d_tpu.datasets.lyft.lyft import create_lyft_infos
    create_lyft_infos(root_path, version=version, nsweeps=nsweeps)


def main():
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
        kitti_data_prep(args.root_path)
    elif args.cmd == "nuscenes_data_prep":
        nuscenes_data_prep(args.root_path, args.version, args.nsweeps)
    elif args.cmd == "lyft_data_prep":
        lyft_data_prep(args.root_path, args.version, args.nsweeps)


if __name__ == "__main__":
    main()
