#!/usr/bin/env python
"""Round-5 unattended TPU queue.

Waits for the r4h recovery chain (r4f + r4g) AND the r4i fused-trace
re-gate to release the exclusive chip, then runs the round-5 on-chip work:

  1. scripts/gate_scan_right.py — promote a fix for the TPU-scan bf16
     right-view divergence (VERDICT r4 item 3); writes ckpt/SCAN_RIGHT.json.
  2. Fit the 5 m-focused F/4 surrogate (apps/fit_psfnet.py --focus-mm
     -5000, 30k iters) and install it at ckpt/rf50mm/F4_PSFNet_mlp_foc5m.
  3. Train the 2-focus far-field arm (configs/dfdp_f4_2focus_256.yml,
     12 epochs @ 256x384 — the controlled architecture experiment VERDICT
     r4 item 5 asks for; recipe identical to the r4d single-focus arms).
  4. scripts/eval_farfield_ab.py — 3-way far-field table: F/4 single-focus
     baseline vs the 2-focus stack net on the same v2 val scenes.
  5. bench.py — fresh idle-chip record.

Same conventions as r4h/r4i: pid file, group-killing bounded steps,
non-preempting waits that only trust 'pid gone' after seeing it alive.
"""

import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)

LOG = os.path.join(HERE, "logs", "r5_tpu_queue.log")


def log(msg):
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run(cmd, logfile, timeout):
    """Group-killing bounded step (r4e pattern)."""
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


def queue_alive(pidfile, marker):
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


def wait_for(name, pidfile, marker, logpath, done_line, grace_s=120):
    log(f"waiting for {name} (completion line or pid exit)")
    seen_alive = False
    while True:
        done = os.path.exists(logpath) and any(
            done_line in line for line in open(logpath))
        if done:
            log(f"{name} reported complete")
            break
        if queue_alive(pidfile, marker) is None:
            if seen_alive or not os.path.exists(pidfile):
                log(f"{name} pid gone")
                break
            log(f"{name} pidfile stale — proceeding")
            break
        seen_alive = True
        time.sleep(120)
    time.sleep(grace_s)   # let the last step's TPU client release the chip


def main():
    os.makedirs("logs", exist_ok=True)
    with open("/tmp/r5_queue.pid", "w") as f:
        f.write(str(os.getpid()))

    wait_for("r4h", "/tmp/r4h_queue.pid", "r4h_tpu_queue",
             "logs/r4h_tpu_queue.log", "r4h recovery queue complete")
    wait_for("r4i", "/tmp/r4i_queue.pid", "r4i_tpu_queue",
             "logs/r4i_tpu_queue.log", "r4i queue complete")

    run([sys.executable, "scripts/tpu_preflight.py"],
        "logs/r5_preflight.log", 1200)

    # 1. scan-right promotion gate
    run([sys.executable, "scripts/gate_scan_right.py"],
        "logs/gate_scan_right.log", 2400)

    # 2. 5 m-focused F/4 surrogate for the 2-focus stack
    rc = run([sys.executable, "apps/fit_psfnet.py",
              "--focus-mm", "-5000", "--iters", "30000",
              "--result-dir", "results/f4_foc5m_fit", "--skip-analysis"],
             "logs/f4_foc5m_fit.log", 7200)
    src = "results/f4_foc5m_fit/psfnet_mlp"
    dst = "ckpt/rf50mm/F4_PSFNet_mlp_foc5m"
    if rc == 0 and os.path.isdir(src):
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        log(f"installed {dst}")
    else:
        log("5 m fit failed — skipping the 2-focus train + eval")
        run([sys.executable, "bench.py"], "logs/bench_idle_r05.log", 2400)
        log("r5 queue complete — chip idle")
        return

    # 3. 2-focus far-field arm (supervised: stall exit 43 -> auto-resume)
    run(["bash", "scripts/run_train_supervised.sh",
         "configs/dfdp_f4_2focus_256.yml"],
        "logs/train_f4_2focus.log", 12600)

    # 4. far-field 3-way table (single-focus baseline vs 2-focus stack)
    run([sys.executable, "scripts/eval_farfield_ab.py",
         "--arm", "f4", "ckpt/rf50mm/Sdirt_f4_farfield",
         "ckpt/rf50mm/F4_PSFNet_mlp", "21",
         "--arm", "2focus", "ckpt/rf50mm/Sdirt_f4_2focus",
         "ckpt/rf50mm/F4_PSFNet_mlp@-1000,"
         "ckpt/rf50mm/F4_PSFNet_mlp_foc5m@-5000", "21"],
        "logs/eval_farfield_2focus.log", 3600)

    # 5. fresh idle-chip bench
    run([sys.executable, "bench.py"], "logs/bench_idle_r05.log", 2400)
    log("r5 queue complete — chip idle")


if __name__ == "__main__":
    main()
