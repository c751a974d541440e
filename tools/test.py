"""Eval entry + per-frame speed benchmark.

Parity: reference tools/test.py + tools/dist_test.py (predict over the val
split, official evaluation, middle-third per-frame timing).

Usage:
  python tools/test.py <config.py> <checkpoint_dir> [--work_dir DIR]
                       [--split val]

Installed twin: the ``det3d-tpu-test`` console script (det3d_tpu/cli.py).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from det3d_tpu.cli import test_main as main  # noqa: E402

if __name__ == "__main__":
    main()
