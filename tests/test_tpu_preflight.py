"""tpu_preflight: bounded backend probe used by unattended queues.

No real TPU involved — probe_cmd is injected so the timeout-kill path
and the success/failure parsing are testable on the CPU host.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import tpu_preflight  # noqa: E402


def test_probe_success_requires_marker():
    ok = tpu_preflight.probe(
        timeout_s=10,
        probe_cmd=[sys.executable, "-c", "print('TPU_PREFLIGHT_OK axon')"])
    assert ok


def test_probe_rejects_rc0_without_marker():
    # a probe that "succeeds" without initializing the backend is a lie
    ok = tpu_preflight.probe(
        timeout_s=10, probe_cmd=[sys.executable, "-c", "print('hello')"])
    assert not ok


def test_probe_rejects_nonzero_rc():
    ok = tpu_preflight.probe(
        timeout_s=10,
        probe_cmd=[sys.executable, "-c", "raise SystemExit(1)"])
    assert not ok


def test_probe_kills_blocked_init():
    # simulates the 25-minute UNAVAILABLE block: sleeps forever, gets
    # group-killed at the timeout, reports failure promptly
    import time
    t0 = time.monotonic()
    ok = tpu_preflight.probe(
        timeout_s=2,
        probe_cmd=[sys.executable, "-c", "import time; time.sleep(600)"])
    assert not ok
    assert time.monotonic() - t0 < 30


def test_wait_for_tpu_retries_then_succeeds():
    calls = []
    clock = [0.0]

    def fake_now():
        return clock[0]

    def fake_sleep(s):
        clock[0] += s

    orig_probe = tpu_preflight.probe
    outcomes = iter([False, False, True])

    def fake_probe(timeout_s, probe_cmd=None):
        calls.append(timeout_s)
        clock[0] += 1
        return next(outcomes)

    tpu_preflight.probe = fake_probe
    try:
        ok = tpu_preflight.wait_for_tpu(
            max_wait_s=1000, probe_timeout_s=5, interval_s=60,
            log=lambda *_: None, now=fake_now, sleep=fake_sleep)
    finally:
        tpu_preflight.probe = orig_probe
    assert ok and len(calls) == 3


def test_wait_for_tpu_budget_exhaustion():
    clock = [0.0]

    def fake_now():
        return clock[0]

    def fake_sleep(s):
        clock[0] += s

    orig_probe = tpu_preflight.probe

    def fake_probe(timeout_s, probe_cmd=None):
        clock[0] += 90  # each probe burns its full timeout
        return False

    tpu_preflight.probe = fake_probe
    try:
        ok = tpu_preflight.wait_for_tpu(
            max_wait_s=300, probe_timeout_s=90, interval_s=120,
            log=lambda *_: None, now=fake_now, sleep=fake_sleep)
    finally:
        tpu_preflight.probe = orig_probe
    assert not ok
    # never sleeps past the deadline by more than one interval
    assert clock[0] < 300 + 120 + 90
