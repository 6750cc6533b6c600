"""StallWatchdog behavior (utils/stall.py): fires on stall, stays quiet
under heartbeats. Runs in subprocesses because firing calls os._exit."""

import subprocess
import sys

CODE_STALL = """
import sys, time
sys.path.insert(0, {repo!r})
from sdirt_tpu.utils.stall import StallWatchdog, STALL_EXIT_CODE
wd = StallWatchdog(timeout_s=1.0, poll_s=0.2, label="test")
time.sleep(10)      # never beats -> watchdog must exit the process
sys.exit(0)
"""

CODE_HEALTHY = """
import sys, time
sys.path.insert(0, {repo!r})
from sdirt_tpu.utils.stall import StallWatchdog
wd = StallWatchdog(timeout_s=1.0, poll_s=0.2, label="test")
for _ in range(8):
    time.sleep(0.4)
    wd.beat()
wd.close()
sys.exit(0)
"""


def _run(code):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run([sys.executable, "-c", code.format(repo=repo)],
                          capture_output=True, text=True, timeout=60)


def test_watchdog_fires_on_stall():
    from sdirt_tpu.utils.stall import STALL_EXIT_CODE

    r = _run(CODE_STALL)
    assert r.returncode == STALL_EXIT_CODE, (r.returncode, r.stderr[-500:])
    assert "STALL WATCHDOG" in r.stderr
    assert "Thread" in r.stderr or "File" in r.stderr   # faulthandler dump


def test_watchdog_quiet_with_heartbeats():
    r = _run(CODE_HEALTHY)
    assert r.returncode == 0, (r.returncode, r.stderr[-500:])
    assert "STALL WATCHDOG" not in r.stderr
