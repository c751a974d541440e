"""Training-log analysis over `{timestamp}.log.json` files.

Parity: reference tools/analyze_logs.py — plot metric curves and report
per-epoch timing statistics from the JSON-lines logs TextLoggerHook writes.

Usage:
  python tools/analyze_logs.py plot_curve log1.json [log2.json ...] \
      --keys loss --out curves.png
  python tools/analyze_logs.py cal_train_time log.json
"""

import argparse
import json
from collections import defaultdict

import numpy as np


def load_json_log(path):
    epochs = defaultdict(list)
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("mode") == "train":
                epochs[rec["epoch"]].append(rec)
    return epochs


def plot_curve(paths, keys, out=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 5))
    for path in paths:
        log = load_json_log(path)
        for key in keys:
            xs, ys = [], []
            for epoch in sorted(log):
                for rec in log[epoch]:
                    if key in rec and rec[key] is not None:
                        xs.append(len(xs))
                        ys.append(rec[key])
            plt.plot(xs, ys, label=f"{path}:{key}")
    plt.xlabel("log step")
    plt.legend()
    plt.grid(alpha=0.3)
    if out:
        plt.savefig(out, dpi=120, bbox_inches="tight")
        print(f"saved {out}")
    else:
        plt.show()


def cal_train_time(paths):
    for path in paths:
        log = load_json_log(path)
        print(f"-- {path}")
        all_times = []
        for epoch in sorted(log):
            times = [r["time"] for r in log[epoch] if "time" in r]
            if times:
                all_times.append(np.mean(times))
                print(f"epoch {epoch}: mean iter time {np.mean(times):.4f}s")
        if all_times:
            print(f"overall mean: {np.mean(all_times):.4f}s/iter")


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("plot_curve")
    p1.add_argument("logs", nargs="+")
    p1.add_argument("--keys", nargs="+", default=["loss"])
    p1.add_argument("--out", default=None)
    p2 = sub.add_parser("cal_train_time")
    p2.add_argument("logs", nargs="+")
    args = parser.parse_args()
    if args.cmd == "plot_curve":
        plot_curve(args.logs, args.keys, args.out)
    else:
        cal_train_time(args.logs)


if __name__ == "__main__":
    main()
