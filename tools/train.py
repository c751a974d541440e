"""Train entry. Parity: reference tools/train.py:56-147.

Usage:
  python tools/train.py <config.py> [--work_dir DIR] [--resume_from DIR]
                        [--seed N]

No launcher/NCCL plumbing: single-host runs see all local devices through
one mesh; multi-host runs call jax.distributed.initialize when
--coordinator is passed (the JAX runtime replaces init_process_group).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from det3d_tpu.utils.env import setup_jax_from_env  # noqa: E402

setup_jax_from_env()


def parse_args():
    parser = argparse.ArgumentParser(description="Train a detector")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--work_dir", default=None)
    parser.add_argument("--resume_from", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--coordinator", default=None,
                        help="coordinator addr for multi-host runs")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser.parse_args()


def main():
    args = parse_args()

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


if __name__ == "__main__":
    main()
