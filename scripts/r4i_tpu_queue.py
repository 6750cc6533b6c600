#!/usr/bin/env python
"""Round-4i unattended TPU queue: re-gate the optimized fused trace.

The fused-trace kernel was restructured this session (fused sag/dsag,
rsqrt Snell normal — commit 16b8867) while the chip was held by the r4h
recovery chain, so ckpt/FUSED_TRACE.json still carries numbers measured
on the pre-optimization kernel. This queue waits for r4h (r4f + r4g) to
finish, then:

  1. scripts/bench_fused_trace.py — the standing promotion gate: on-chip
     PSF parity on EVERY served lens (max L1 <= 1e-3) + fused >= 1.1x
     scan, rewriting the manifest with honestly re-measured numbers for
     the kernel actually shipped.
  2. bench.py — fresh idle-chip bench, re-banking the busy-chip fallback
     that the end-of-round driver run serves.

Runs strictly after r4h: waits for its completion line or pid exit (the
same non-preempting pattern as r4g's wait_for_r4f).
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)

LOG = os.path.join(HERE, "logs", "r4i_tpu_queue.log")


def log(msg):
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run(cmd, logfile, timeout):
    """Group-killing bounded step (r4e pattern: a timed-out step must not
    orphan a python grandchild that wedges the exclusive chip)."""
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


def r4h_alive(pidfile="/tmp/r4h_queue.pid"):
    """The live r4h queue pid, or None; guards against pid reuse."""
    try:
        pid = int(open(pidfile).read().strip())
    except (OSError, ValueError):
        return None
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            if b"r4h_tpu_queue" not in f.read():
                return None
    except OSError:
        return None
    return pid


def wait_for_r4h():
    log("waiting for r4h to finish (completion line or pid exit)")
    seen_alive = False   # ADVICE r4: "pid gone" counts only after the pid
    #                      was observed alive once, so starting before r4h
    #                      writes its pidfile (or a /tmp wipe mid-relaunch)
    #                      cannot grab the exclusive chip mid-chain
    while True:
        done = os.path.exists("logs/r4h_tpu_queue.log") and any(
            "r4h recovery queue complete" in line
            for line in open("logs/r4h_tpu_queue.log"))
        if done:
            log("r4h reported complete")
            break
        if r4h_alive() is None:
            if seen_alive:
                log("r4h pid gone")
                break
            log("r4h pid not (yet) visible — waiting for it to appear")
        else:
            seen_alive = True
        time.sleep(120)
    # let the last step's TPU client release the exclusive chip
    time.sleep(120)


def main():
    os.makedirs("logs", exist_ok=True)
    wait_for_r4h()

    # 1. re-gate the optimized fused trace (parity on every served lens
    #    + speed vs scan); rewrites ckpt/FUSED_TRACE.json
    run([sys.executable, "scripts/bench_fused_trace.py"],
        "logs/bench_fused_trace_r4i.log", 2400)

    # 2. fresh idle-chip bench with whatever the gate decided
    run([sys.executable, "bench.py"], "logs/bench_idle_r04i.log", 2400)
    log("r4i queue complete — chip idle")


if __name__ == "__main__":
    main()
