"""Eval entry + per-frame speed benchmark.

Parity: reference tools/test.py + tools/dist_test.py (predict over the val
split, official evaluation, middle-third per-frame timing).

Usage:
  python tools/test.py <config.py> <checkpoint_dir> [--work_dir DIR]
                       [--split val]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from det3d_tpu.utils.env import setup_jax_from_env  # noqa: E402

setup_jax_from_env()


def parse_args():
    parser = argparse.ArgumentParser(description="Evaluate a detector")
    parser.add_argument("config")
    parser.add_argument("checkpoint", help="work_dir containing ckpt/")
    parser.add_argument("--work_dir", default=None)
    parser.add_argument("--split", default="val")
    parser.add_argument("--epoch", type=int, default=None)
    return parser.parse_args()


def main():
    args = parse_args()

    import jax

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


if __name__ == "__main__":
    main()
