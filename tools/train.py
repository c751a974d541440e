"""Train entry. Parity: reference tools/train.py:56-147.

Usage:
  python tools/train.py <config.py> [--work_dir DIR] [--resume_from DIR]
                        [--seed N]

No launcher/NCCL plumbing: single-host runs see all local devices through
one mesh; multi-host runs call jax.distributed.initialize when
--coordinator is passed (the JAX runtime replaces init_process_group).
Installed twin: the ``det3d-tpu-train`` console script (det3d_tpu/cli.py).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from det3d_tpu.cli import train_main as main  # noqa: E402

if __name__ == "__main__":
    main()
