"""XLA flag sweep on the flagship train/eval steps.

Round-2 VERDICT (weak #2) asked for one measured experiment on the 37%-MFU
train step beyond the per-op ablation; the ablation attributed the gap to
BN statistics + maxpool backward + the stem's dw conv, all of which sit
inside XLA's fusion/scheduling decisions. The one user-visible knob that
changes those decisions on a single chip is the scoped-vmem fusion budget
(``--xla_tpu_scoped_vmem_limit_kib``) — this harness measures the flagship
train and eval step under each setting, one subprocess per value (XLA reads
the flags once at backend init).

Run: python scripts/bench_flag_sweep.py            # sweep driver
     python scripts/bench_flag_sweep.py --measure  # single measurement
                                                   # (XLA_FLAGS from env)

The persistent compile cache is disabled for the measured children: flag
values must not share compiled programs.
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEP = [
    None,  # default
    "--xla_tpu_scoped_vmem_limit_kib=16384",
    "--xla_tpu_scoped_vmem_limit_kib=32768",
    "--xla_tpu_scoped_vmem_limit_kib=65536",
    "--xla_tpu_scoped_vmem_limit_kib=98304",
]


def measure():
    import bench  # noqa: E402  (enables nothing; cache is off via env)

    eval_fps, eval_dt, _ = bench.bench_eval(batch=20, k_lo=2, k_hi=6)
    train_fps, train_dt = bench.bench_train(batch=20, k_lo=1, k_hi=4)
    print(json.dumps({
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "eval_ms": round(eval_dt * 1e3, 2),
        "train_ms": round(train_dt * 1e3, 2),
        "eval_fps": round(eval_fps, 1),
        "train_fps": round(train_fps, 1),
    }))


def main():
    rows = []
    for flag in SWEEP:
        env = dict(os.environ, MAP_COMPILE_CACHE="off")
        env.pop("XLA_FLAGS", None)
        if flag:
            env["XLA_FLAGS"] = flag
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure"],
            env=env, capture_output=True, text=True, timeout=1800)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            row = {"xla_flags": flag or "(default)", "error": r.stderr[-400:]}
        rows.append(row)
        print(f"{flag or '(default)':>45s}  "
              f"train {row.get('train_ms', 'ERR'):>7} ms  "
              f"eval {row.get('eval_ms', 'ERR'):>6} ms", flush=True)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--measure", action="store_true")
    a = p.parse_args()
    measure() if a.measure else main()
