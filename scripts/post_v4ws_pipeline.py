#!/usr/bin/env python
"""Post-training pipeline for the v4 warm-start run (unattended, round 3).

Waits for the supervised trainer (pid file /tmp/train_v4ws.pid) to finish,
then on the TPU:

  1. scripts/eval_depth_ckpt.py on the v4 candidate AND the shipped v3
     checkpoint (same protocol, logs/eval_{v4ws,v3_baseline}.log)
  2. promotes the v4 candidate to ckpt/rf50mm/Sdirt_best_acc1 iff it wins
     real-set acc1 on >= 2 of the 3 bundled scenes (v3 kept as
     ckpt/rf50mm/Sdirt_best_acc1_v3pre)
  3. if >= 2 h remain before the DEADLINE: the 256x384 TPU deblur training
     demo (logs/train_256_deblur.log)
  4. final idle-chip python bench.py (logs/bench_final_r03.log)

DEADLINE (default 18:45 UTC): if the trainer is still running then, the
supervisor and its python child are killed BY PID (never by pattern) so the
chip is idle for the driver's end-of-round bench; eval/promotion still run
against whatever best-acc1 checkpoint the run exported.
"""

import os
import re
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)
LOG = os.path.join(HERE, "logs", "post_v4ws_pipeline.log")
DEADLINE = time.mktime(time.strptime("2026-08-18 20:45", "%Y-%m-%d %H:%M"))
V4 = "ckpt/rf50mm/Sdirt_best_acc1_v4"
V3 = "ckpt/rf50mm/Sdirt_best_acc1"


def log(msg):
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except (OSError, TypeError):
        return False


def read_pid(path):
    try:
        return int(open(path).read().strip())
    except (OSError, ValueError):
        return None


def kill_tree(pid):
    """Kill the supervisor and its direct children by explicit pid."""
    out = subprocess.run(["ps", "--ppid", str(pid), "-o", "pid="],
                         capture_output=True, text=True).stdout
    kids = [int(p) for p in out.split()]
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


def run(cmd, logfile, timeout):
    log(f"RUN ({timeout}s cap) -> {logfile}: {' '.join(cmd)}")
    with open(logfile, "w") as f:
        try:
            rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                                timeout=timeout).returncode
        except subprocess.TimeoutExpired:
            log(f"TIMEOUT after {timeout}s")
            return -1
    log(f"rc={rc}")
    return rc


def real_acc1(path):
    """{scene: acc1} parsed from an eval_depth_ckpt.py log."""
    vals = {}
    if os.path.exists(path):
        for line in open(path):
            m = re.match(r"\[real (\w+)\] acc1 ([\d.]+)", line)
            if m:
                vals[m.group(1)] = float(m.group(2))
    return vals


def main():
    os.makedirs("logs", exist_ok=True)
    # the trainer may not have been launched yet (queue runner order);
    # wait for the pid file to appear and the supervisor to exit
    log("waiting for v4ws trainer to finish")
    while True:
        pid = read_pid("/tmp/train_v4ws.pid")
        if pid and not alive(pid):
            log(f"trainer supervisor {pid} exited")
            break
        if time.time() > DEADLINE and pid and alive(pid):
            log(f"DEADLINE reached; stopping trainer tree at pid {pid}")
            kill_tree(pid)
            break
        time.sleep(60)
    time.sleep(30)   # let the TPU admission settle

    if not os.path.isdir(V4):
        log(f"no v4 candidate at {V4}; skipping eval/promotion")
    else:
        run([sys.executable, "scripts/eval_depth_ckpt.py", "--ckpt", V4],
            "logs/eval_v4ws.log", 3600)
        run([sys.executable, "scripts/eval_depth_ckpt.py", "--ckpt", V3],
            "logs/eval_v3_baseline.log", 3600)
        a4 = real_acc1("logs/eval_v4ws.log")
        a3 = real_acc1("logs/eval_v3_baseline.log")
        log(f"real-set acc1 v4={a4} v3={a3}")
        wins = sum(1 for s in a4 if s in a3 and a4[s] >= a3[s])
        if len(a4) == 3 and wins >= 2:
            log(f"PROMOTING v4 ({wins}/3 scene wins)")
            shutil.move(V3, "ckpt/rf50mm/Sdirt_best_acc1_v3pre")
            shutil.copytree(V4, V3)
        else:
            log(f"keeping v3 (v4 wins only {wins}/3)")

    # optional deblur TPU demo if comfortably inside the deadline
    remaining = DEADLINE - time.time()
    if remaining > 7200:
        run([sys.executable, "apps/dfdp_net.py", "--config",
             "configs/dfdp_synthetic_train_256_deblur.yml", "--stage",
             "train", "--train-mode", "deblur"],
            "logs/train_256_deblur.log", int(remaining - 3600))
    else:
        log(f"skipping TPU deblur demo ({remaining/60:.0f} min to deadline)")

    run([sys.executable, "bench.py"], "logs/bench_final_r03.log", 2400)
    log("post pipeline complete")


if __name__ == "__main__":
    main()
