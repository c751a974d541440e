"""Offline data preparation. Parity: reference tools/create_data.py (fire
CLI there; argparse subcommands here).

Usage:
  python tools/create_data.py kitti_data_prep --root_path /data/kitti
  python tools/create_data.py nuscenes_data_prep --root_path /data/nuscenes \
      --version v1.0-trainval --nsweeps 10

Installed twin: the ``det3d-tpu-create-data`` console script
(det3d_tpu/cli.py).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from det3d_tpu.cli import create_data_main as main  # noqa: E402
from det3d_tpu.cli import (_kitti_data_prep as kitti_data_prep,  # noqa: E402,F401
                           _lyft_data_prep as lyft_data_prep,
                           _nuscenes_data_prep as nuscenes_data_prep)

if __name__ == "__main__":
    main()
