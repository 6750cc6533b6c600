#!/usr/bin/env python
"""Fail-fast TPU-tunnel preflight for unattended queue steps.

Motivation (2026-08-20 outage): when the tunnel to the chip goes down,
`jax.devices()` BLOCKS ~25 minutes inside backend init before raising
UNAVAILABLE. A queue step that starts during an outage therefore burns
most of its wall-clock cap discovering the chip is gone (the v6 trainer
lost ~2 h of its 4 h cap to init-retry loops). This module probes the
backend in a bounded subprocess instead, so a queue can either skip a
step quickly or sit out an outage cheaply before spending a step cap.

Usage from a queue script (before each chip-touching step):

    import tpu_preflight
    if not tpu_preflight.wait_for_tpu(max_wait_s=7200):
        log("TPU still unavailable after 2 h — skipping step")

or standalone:  python scripts/tpu_preflight.py --max-wait 7200

The probe itself briefly opens a TPU client, so only call it while this
queue owns the chip slot (i.e. between its own steps) — the same
discipline every other chip-touching step already follows.
"""

import argparse
import os
import subprocess
import sys
import time

# The probe must not silently fall back to CPU and fake a healthy chip:
# run with the session's inherited JAX_PLATFORMS (the TPU plugin) and
# require the reported platform to NOT be cpu.
_PROBE_SRC = (
    "import jax; d = jax.devices()[0]; "
    "assert d.platform != 'cpu', d.platform; "
    "print('TPU_PREFLIGHT_OK', d.platform)"
)


def probe(timeout_s=90, probe_cmd=None):
    """One bounded backend probe. True iff a non-CPU backend came up
    within timeout_s. The subprocess gets its own session so a blocked
    init can be group-killed without orphaning a grandchild on the chip.
    """
    cmd = probe_cmd or [sys.executable, "-c", _PROBE_SRC]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True)
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, 9)
        except OSError:
            pass
        proc.wait()
        return False
    return proc.returncode == 0 and b"TPU_PREFLIGHT_OK" in out


def wait_for_tpu(max_wait_s=7200, probe_timeout_s=90, interval_s=120,
                 probe_cmd=None, log=print, now=time.monotonic,
                 sleep=time.sleep):
    """Probe until the backend answers or the wait budget runs out.
    Returns True as soon as a probe succeeds. Probes are spaced
    interval_s apart so a dead tunnel isn't hammered with clients.
    """
    deadline = now() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = now()
        if probe(probe_timeout_s, probe_cmd=probe_cmd):
            log(f"tpu_preflight: backend up (attempt {attempt}, "
                f"{now() - t0:.0f}s)")
            return True
        remaining = deadline - now()
        log(f"tpu_preflight: backend unavailable (attempt {attempt}); "
            f"{remaining:.0f}s of wait budget left")
        if remaining <= 0:
            return False
        sleep(min(interval_s, max(remaining, 0)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-wait", type=float, default=7200,
                    help="total seconds to wait for the backend")
    ap.add_argument("--probe-timeout", type=float, default=90)
    ap.add_argument("--interval", type=float, default=120)
    args = ap.parse_args()
    ok = wait_for_tpu(args.max_wait, args.probe_timeout, args.interval)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
