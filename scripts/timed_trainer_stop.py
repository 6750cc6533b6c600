#!/usr/bin/env python
"""Stop the v4ws trainer tree at a planned time (by PID, never by pattern).

Round-3 scheduling: the v4 warm-start fine-tune anneals its LR over 40
epochs, so epochs past ~33 move the weights very little (cosine LR < 8% of
base) — while the basis-student fit + gate (scripts/basis_student_queue.py)
needs ~45 min of chip before the 20:45 hard stop. Stopping the trainer at
STOP_AT trades the low-value tail epochs for the render-path milestone.
The best-acc1 checkpoint is exported continuously, so stopping early only
truncates, never loses, training progress; scripts/post_v4ws_pipeline.py
picks it up the moment the supervisor exits.
"""

import os
import subprocess
import sys
import time

STOP_AT = time.mktime(time.strptime("2026-08-18 19:10", "%Y-%m-%d %H:%M"))
PID_FILE = "/tmp/train_v4ws.pid"


def alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except (OSError, TypeError):
        return False


def main():
    while time.time() < STOP_AT:
        try:
            pid = int(open(PID_FILE).read().strip())
        except (OSError, ValueError):
            print("no trainer pid file; nothing to do", flush=True)
            return
        if not alive(pid):
            print("trainer already finished; nothing to do", flush=True)
            return
        time.sleep(30)

    pid = int(open(PID_FILE).read().strip())
    if not alive(pid):
        print("trainer finished on its own before the stop time", flush=True)
        return
    out = subprocess.run(["ps", "--ppid", str(pid), "-o", "pid="],
                         capture_output=True, text=True).stdout
    kids = [int(p) for p in out.split()]
    print(f"stopping trainer tree: supervisor {pid}, children {kids}",
          flush=True)
    for p in [pid] + kids:
        try:
            os.kill(p, 15)
        except OSError:
            pass
    time.sleep(20)
    for p in [pid] + kids:
        if alive(p):
            try:
                os.kill(p, 9)
            except OSError:
                pass
    print("trainer tree stopped", flush=True)


if __name__ == "__main__":
    main()
