#!/usr/bin/env python
"""Round-4g unattended TPU queue: real-capture LOO fine-tune experiment.

Runs strictly AFTER r4f (waits for its completion line or pid exit) — it
never preempts the rf35mm chain. Chip work:

  1. set-wise holdout fine-tune (3 folds, quick cross-set signal):
     does fine-tuning on two real sets transfer to the third?
  2. per-scene leave-one-scene-out fine-tune (19 folds — the honest
     estimate of what in-domain fine-tuning buys on each real set),
     plus an all-scenes fine-tune saved to ckpt/rf50mm/Sdirt_real_ft
     (shipped as a SEPARATE artifact; Sdirt_best_acc1 stays
     synthetic-only so the standing real-scene promotion rule remains
     honest).
  3. fresh idle-chip bench (re-banks bench.py's busy-chip fallback).

Rationale: BACKLOG round-5 candidates — if v6 doesn't clear box >= 0.80,
synthetic composition realism is likely exhausted and real-capture
fine-tuning is the named next lever; this banks the measurement either
way. See scripts/finetune_real_loo.py for the protocol.
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)

LOG = os.path.join(HERE, "logs", "r4g_tpu_queue.log")
PROM = "ckpt/rf50mm/Sdirt_best_acc1"


def log(msg):
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run(cmd, logfile, timeout):
    """Group-killing bounded step (r4e pattern: a timed-out training step
    must not orphan a python grandchild that wedges the exclusive chip)."""
    log(f"RUN ({timeout}s cap) -> {logfile}: {' '.join(cmd)}")
    with open(logfile, "w") as f:
        proc = subprocess.Popen(cmd, stdout=f, stderr=subprocess.STDOUT,
                                start_new_session=True)
        try:
            rc = proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            log(f"TIMEOUT after {timeout}s — killing process group {proc.pid}")
            try:
                os.killpg(proc.pid, 9)
            except OSError:
                pass
            proc.wait()
            return -1
    log(f"rc={rc}")
    return rc


def r4f_alive(pidfile="/tmp/r4f_queue.pid"):
    """The live r4f queue pid, or None; guards against pid reuse."""
    try:
        pid = int(open(pidfile).read().strip())
    except (OSError, ValueError):
        return None
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            if b"r4f_tpu_queue" not in f.read():
                return None
    except OSError:
        return None
    return pid


def wait_for_r4f():
    log("waiting for r4f to finish (completion line or pid exit)")
    while True:
        done = os.path.exists("logs/r4f_tpu_queue.log") and any(
            "r4f queue complete" in line
            for line in open("logs/r4f_tpu_queue.log"))
        if done:
            log("r4f reported complete")
            break
        if r4f_alive() is None:
            log("r4f pid gone")
            break
        time.sleep(120)
    # let the last step's TPU client release the exclusive chip
    time.sleep(120)


def main():
    os.makedirs("logs", exist_ok=True)
    wait_for_r4f()

    # 1. quick cross-set signal: 3 folds, each holds out a whole set
    run([sys.executable, "scripts/finetune_real_loo.py", "--ckpt", PROM,
         "--holdout-set"],
        "logs/finetune_real_setwise.log", 5400)

    # 2. per-scene LOO (19 folds) + all-scenes artifact
    run([sys.executable, "scripts/finetune_real_loo.py", "--ckpt", PROM,
         "--save-all-ckpt", "ckpt/rf50mm/Sdirt_real_ft"],
        "logs/finetune_real_loo.log", 14400)

    # 3. fresh idle-chip bench (re-banks the busy-chip fallback source)
    run([sys.executable, "bench.py"], "logs/bench_idle_r04g.log", 2400)
    log("r4g queue complete — chip idle")


if __name__ == "__main__":
    main()
