#!/usr/bin/env python
"""Guard the banked v6 depth candidate across the post-outage retrain.

The host recycle restored the repo to its committed state: the v6
trainer's resumable train state (untracked ckpt/train_state_512_v6) was
lost, so the r4h-relaunched trainer restarted v6 from epoch 0 and its
fresh best-acc1 watermark immediately overwrote the banked epoch-8
checkpoint (val acc1 0.8986, commit d820a2d) on disk with an epoch-0
export. The rerun is epoch-keyed-RNG deterministic and now has the full
16 epochs, so it should end >= the banked value — but if it doesn't
(another tunnel blip mid-run, cap timeout), r4f's eval/promotion step
must not judge v6 by a worse-than-banked candidate.

This guard waits for the v6 train step to finish (the rc= line after the
last train RUN line in r4f's queue log), reads the last 'saved epoch K
(val acc1 X)' line from the train log (= what is on disk), and restores
the git-committed epoch-8 checkpoint iff the rerun ended below it. It
races r4f's eval step for the checkpoint read, but wins comfortably: the
restore is a <5 s git checkout while eval spends >30 s in interpreter
boot + jax/lens init before touching the checkpoint.
"""

import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)

LOG = os.path.join(HERE, "logs", "r4j_v6_guard.log")
QLOG = "logs/r4f_tpu_queue.log"
TLOG = "logs/train_512_v6.log"
CKPT = "ckpt/rf50mm/Sdirt_best_acc1_v6"
BANKED_ACC1 = 0.8986


def log(msg):
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def train_step_rc():
    """rc of the v6 train step, or None while still running: the first
    rc= line AFTER the last 'RUN ... train_512_v6.log' line."""
    try:
        lines = open(QLOG).read().splitlines()
    except OSError:
        return None
    last_run = None
    for i, ln in enumerate(lines):
        if "RUN" in ln and "logs/train_512_v6.log" in ln:
            last_run = i
    if last_run is None:
        return None
    for ln in lines[last_run + 1:]:
        m = re.search(r"\brc=(-?\d+)", ln)
        if m:
            return int(m.group(1))
        if "TIMEOUT" in ln:
            return -1
    return None


def disk_best_acc1():
    """val acc1 of the checkpoint currently on disk = the LAST 'saved
    epoch' line in the train log (each supervised relaunch resets the
    watermark, so max() over the file would lie)."""
    best = None
    try:
        for ln in open(TLOG):
            m = re.search(r"saved epoch (\d+) \(val acc1 ([0-9.]+)\)", ln)
            if m:
                best = (int(m.group(1)), float(m.group(2)))
    except OSError:
        pass
    return best


def main():
    os.makedirs("logs", exist_ok=True)
    log(f"waiting for the v6 train step to finish (banked {BANKED_ACC1})")
    while True:
        rc = train_step_rc()
        if rc is not None:
            log(f"train step finished rc={rc}")
            break
        time.sleep(10)

    best = disk_best_acc1()
    if best is None:
        log("no 'saved epoch' line found — restoring the banked checkpoint")
        ended = -1.0
    else:
        log(f"rerun's on-disk candidate: epoch {best[0]} val acc1 {best[1]}")
        ended = best[1]

    if ended >= BANKED_ACC1:
        log("rerun >= banked — keeping the rerun's checkpoint")
        return
    log(f"rerun ({ended}) < banked ({BANKED_ACC1}) — restoring git HEAD copy")
    r = subprocess.run(["git", "checkout", "--", CKPT],
                       capture_output=True, text=True)
    log(f"git checkout rc={r.returncode} {r.stderr.strip()}")


if __name__ == "__main__":
    main()
