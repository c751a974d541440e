"""Generate a synthetic mini-KITTI tree for smoke runs without real data.

Writes velodyne/label_2/calib + ImageSets, then runs the full offline prep
(infos, reduced clouds, gt database). Pair with
configs/smoke_kitti_pointpillars.py:

  python tools/make_synthetic_kitti.py --out /tmp/mini_kitti
  KITTI_DATA=/tmp/mini_kitti python tools/train.py \
      configs/smoke_kitti_pointpillars.py --work_dir /tmp/smoke_run
  KITTI_DATA=/tmp/mini_kitti python tools/test.py \
      configs/smoke_kitti_pointpillars.py /tmp/smoke_run
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--scenes", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from tests import mini_kitti as mk

    root = Path(args.out)
    root.mkdir(parents=True, exist_ok=True)
    mk.make_tree(root, n_scenes=args.scenes, seed=args.seed)

    from det3d_tpu.datasets.kitti.kitti_common import (
        create_reduced_point_cloud)
    for split in ("train", "val"):
        create_reduced_point_cloud(
            str(root), str(root / f"kitti_infos_{split}.pkl"))
    print(f"synthetic KITTI at {root}: {args.scenes} scenes "
          f"(train/val split + infos + gt database + reduced clouds)")


if __name__ == "__main__":
    main()
