#!/usr/bin/env python
"""Round-4h recovery queue: re-run the r4f+r4g chain behind a preflight.

The TPU tunnel went down at ~01:56Z (2026-08-20) while r4f was in its
first step (v6 training, epoch 8 of 16 banked). Backend init blocks ~25
minutes per attempt during an outage, so the already-running r4f/r4g
queues — launched before tpu_preflight existed — would burn every
remaining step cap discovering the chip is gone, and the v6 trainer
would lose its shot at epochs 9-15.

Recovery: r4f has banked NOTHING past step 1 (the train step was still
in flight), so the safe move is to take over and re-run the whole chain
with fresh caps once the chip answers again:

  0. kill r4g FIRST (it launches the moment r4f's pid vanishes — must
     not be allowed to start into a dead tunnel), then r4f, then the
     orphaned train-step session (bash run_train_supervised.sh + the
     blocked dfdp_net trainer share its pgid).
  1. tpu_preflight.wait_for_tpu — sit out the outage cheaply (bounded
     90s probes every 3 min, 8 h budget) instead of burning step caps.
  2. r4f.main() verbatim — v6 train resumes from the banked epoch-8
     state with a FRESH 14400s cap, then eval/promote, the rf35mm
     teacher/w256b/basis48 chain, final bench. Writes r4f's own log,
     including the "r4f queue complete" line.
  3. r4g.main() verbatim — its wait_for_r4f() sees the completion line
     immediately, then runs the real-capture LOO fine-tune chain.

Process identification is pid-file + exact-argv based (never substring
pattern matching, which can catch this session's own shell commands).
"""

import os
import signal
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

import tpu_preflight                            # noqa: E402
import r4f_tpu_queue as r4f                     # noqa: E402
import r4g_tpu_queue as r4g                     # noqa: E402

LOG = os.path.join(HERE, "logs", "r4h_tpu_queue.log")


def log(msg):
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def pid_from_file(pidfile, marker):
    """Pid recorded in pidfile, iff that pid is alive and its cmdline
    names `marker` (guards stale files and pid reuse)."""
    try:
        pid = int(open(pidfile).read().strip())
    except (OSError, ValueError):
        return None
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            if marker.encode() not in f.read():
                return None
    except OSError:
        return None
    return pid


def argv_of(pid):
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return [a.decode(errors="replace")
                    for a in f.read().split(b"\0") if a]
    except OSError:
        return []


def is_train_step(argv):
    """True iff argv is the supervised-train wrapper itself, matched by
    EXACT argv positions (argv[1] == the wrapper script), so this can
    never match an interactive `bash -c '...'` shell whose command text
    merely mentions the script."""
    return (len(argv) >= 2 and os.path.basename(argv[0]) == "bash"
            and argv[1] == "scripts/run_train_supervised.sh")


def train_step_sessions():
    """Session-leader pids of in-flight supervised train steps."""
    out = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        pid = int(entry)
        if is_train_step(argv_of(pid)):
            try:
                if os.getsid(pid) == pid:       # session leader only
                    out.append(pid)
            except OSError:
                pass
    return out


def kill_pid(pid, what):
    if pid is None:
        return
    log(f"killing {what} (pid {pid})")
    try:
        os.kill(pid, signal.SIGKILL)
    except OSError as e:
        log(f"  kill failed: {e}")


def takeover():
    # r4g first: it triggers on r4f's pid vanishing
    kill_pid(pid_from_file("/tmp/r4g_queue.pid", "r4g_tpu_queue"),
             "r4g queue")
    kill_pid(pid_from_file("/tmp/r4f_queue.pid", "r4f_tpu_queue"),
             "r4f queue")
    for sid in train_step_sessions():
        log(f"killing train-step process group {sid}")
        try:
            os.killpg(sid, signal.SIGKILL)
        except OSError as e:
            log(f"  killpg failed: {e}")
    # let any killed TPU client release the exclusive chip
    time.sleep(120)


def main():
    os.makedirs("logs", exist_ok=True)
    takeover()

    log("waiting out the tunnel outage (8h budget, 90s probes / 3 min)")
    if not tpu_preflight.wait_for_tpu(max_wait_s=8 * 3600,
                                      probe_timeout_s=90, interval_s=180,
                                      log=log):
        log("TPU never came back within the wait budget — giving up")
        sys.exit(1)

    log("chip is back — re-running the r4f chain with fresh caps")
    r4f.main()

    log("r4f chain done — running the r4g chain")
    r4g.main()
    log("r4h recovery queue complete — chip idle")


if __name__ == "__main__":
    main()
