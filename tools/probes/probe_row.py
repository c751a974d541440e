"""Run ONE bench.py config row (A/B harness for serving levers).

Usage: python tools/probes/probe_row.py <config> [batch] [points] [baseline]
Prints bench_config's JSON line for just that row.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import json


def main():
    import jax
    cache = str(Path(__file__).resolve().parents[2] / ".jax_bench_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import bench
    config = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    points = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
    base = float(sys.argv[4]) if len(sys.argv) > 4 else 30.0
    print(json.dumps(bench.bench_config(config, "probe_row", batch,
                                        points, base)), flush=True)


if __name__ == "__main__":
    main()
