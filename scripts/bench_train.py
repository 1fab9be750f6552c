"""Training-throughput benchmark — thin wrapper over bench.bench_train
(the canonical implementation lives in bench.py so the driver-run benchmark
and this script can never diverge)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_train  # noqa: E402

if __name__ == "__main__":
    fps, dt, _ = bench_train()
    print(f"train step: {dt * 1000:.1f} ms -> {fps:.1f} frames/sec")
