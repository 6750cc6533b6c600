"""Stall watchdog: detect a wedged process, dump stacks, exit for resume.

Long runs on this rig have twice hung with zero CPU, all threads parked on
futexes and one on a socket read — the signature of a lost TPU-tunnel RPC
(both times immediately after a checkpoint D2H burst). There is no way to
recover a lost RPC in-process, but every trainer here checkpoints its full
train state each epoch and auto-resumes, so the correct production behavior
is: notice the stall quickly, dump every thread's Python stack to the log
(the only forensics this box can produce — no py-spy/gdb), and exit with a
distinctive code so a supervisor (scripts/run_train_supervised.sh) relaunches
into the resume path.

The reference framework has no failure detection at all (SURVEY §5 —
its trainer would hold a dead GPU forever); this is the TPU-native
equivalent of a cluster babysitter.
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time

STALL_EXIT_CODE = 43


class StallWatchdog:
    """Exit the process if `beat()` is not called within `timeout_s`.

    Usage:
        wd = StallWatchdog(timeout_s=2400)   # arm
        ... wd.beat() at every progress point ...
        wd.close()                            # disarm (end of run)
    """

    def __init__(self, timeout_s: float = 2400.0, poll_s: float = 30.0,
                 label: str = "train"):
        self.timeout_s = float(timeout_s)
        self.poll_s = float(poll_s)
        self.label = label
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="stall-watchdog")
        self._thread.start()

    def beat(self):
        self._last = time.monotonic()

    def close(self):
        self._stop.set()

    def _run(self):
        while not self._stop.wait(self.poll_s):
            idle = time.monotonic() - self._last
            if idle > self.timeout_s:
                # stderr is the training log (redirected); flush a marker,
                # the stacks, then exit hard — a lost tunnel RPC never
                # completes, and the epoch-checkpointed state resumes.
                print(f"\n=== STALL WATCHDOG [{self.label}]: no progress for "
                      f"{idle:.0f}s (> {self.timeout_s:.0f}s); dumping all "
                      f"thread stacks and exiting {STALL_EXIT_CODE} for "
                      f"supervised resume ===", file=sys.stderr, flush=True)
                faulthandler.dump_traceback(file=sys.stderr)
                sys.stderr.flush()
                os._exit(STALL_EXIT_CODE)
