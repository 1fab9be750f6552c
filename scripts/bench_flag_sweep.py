"""XLA TPU-compiler option sweep on the flagship train/eval steps.

Round-2 VERDICT (weak #2) asked for one measured compiler-level experiment
on the 37%-MFU train step beyond the per-op ablation. The per-op ablation
attributed the gap to BN statistics + maxpool backward + the stem's dw
conv — all placed by XLA's fusion/scheduling, whose main user-visible knob
is the scoped-vmem fusion budget (``xla_tpu_scoped_vmem_limit_kib``).

Route discovery (this image): the client-side XLA_FLAGS parser hard-exits
on TPU backend flags (``Unknown flag in XLA_FLAGS``) because the TPU
compiler lives on the far side of the axon tunnel. PJRT ``compiler_options``
DO ship with the compile request and are validated server-side (an invalid
option name returns a remote-compile 500), so the sweep drives
``jit(...).lower(...).compile(compiler_options=...)`` via
``bench._amortized_device_time``.

Run: python scripts/bench_flag_sweep.py
The persistent compile cache is force-disabled: sweep points must not share
compiled programs. Run alone — CPU/TPU contention pollutes the numbers.
"""

import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["MAP_COMPILE_CACHE"] = "off"  # before bench's import-time enable

import bench  # noqa: E402

SWEEP = [None, "16384", "32768", "65536", "98304"]


def _alarm(_sig, _frm):
    raise TimeoutError("sweep point exceeded 1800 s (remote-compile hang?)")


def main():
    signal.signal(signal.SIGALRM, _alarm)
    rows = []
    for v in SWEEP:
        opts = {"xla_tpu_scoped_vmem_limit_kib": v} if v else None
        label = f"scoped_vmem={v}kib" if v else "(default)"
        signal.alarm(1800)  # bound each point like the old subprocess driver
        try:
            eval_fps, eval_dt, _ = bench.bench_eval(
                batch=20, k_lo=2, k_hi=6, compiler_options=opts,
                count_flops=False)
            train_fps, train_dt, _ = bench.bench_train(
                batch=20, k_lo=1, k_hi=4, compiler_options=opts,
                count_flops=False)
            row = {"option": label,
                   "eval_ms": round(eval_dt * 1e3, 2),
                   "train_ms": round(train_dt * 1e3, 2),
                   "eval_fps": round(eval_fps, 1),
                   "train_fps": round(train_fps, 1)}
        except Exception as e:  # rejected option / timeout → record, go on
            row = {"option": label, "error": f"{type(e).__name__}: {e}"[:300]}
        finally:
            signal.alarm(0)
        rows.append(row)
        print(f"{label:>22s}  train {row.get('train_ms', 'ERR'):>7} ms  "
              f"eval {row.get('eval_ms', 'ERR'):>6} ms", flush=True)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
