#!/usr/bin/env python
"""Round-4 unattended TPU queue (runs behind the v4c depth training).

Waits for the v4c supervised trainer (pid file /tmp/train_v4c.pid) to exit,
then executes, in order, each step bounded and logged:

  1. eval v4c + the currently promoted depth ckpt on the bundled real scenes
     (scripts/eval_depth_ckpt.py --skip-synth); promote v4c iff it wins
     acc1 on >= 2 of 3 scenes (VERDICT r3 item 1)
  2. idle-chip python bench.py -> logs/bench_idle_r04.log (first TPU numbers
     for the statically-unrolled trace; VERDICT item 3)
  3. distill mlpb@256x48 from the w512 teacher's predicted taps
     (dense supervision; VERDICT item 2), trunk warm-started from w256
  4. speed: bench_render_variants basis/basis_int8 on the distilled student
  5. fidelity: gate_render_variants --f32-baseline for the student AND a
     w512 reference run; promotion decision is left to the interactive
     session (logged here), since it edits PROMOTED_SURROGATE.json
  6. distill an rf35mm mlp@256 student from ckpt/rf35mm/F4_PSFNet_mlp
     (VERDICT item 4) and run the teacher-relative gate
     (scripts/gate_rf35_student.py)

A DEADLINE guard kills the trainer tree by explicit pid (never by pattern)
if it overruns, and the queue always leaves the chip idle at the end.
"""

import os
import re
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)
LOG = os.path.join(HERE, "logs", "r4_tpu_queue.log")
TRAIN_DEADLINE = time.mktime(time.strptime("2026-08-19 14:10", "%Y-%m-%d %H:%M"))
V4C = "ckpt/rf50mm/Sdirt_best_acc1_v4c"
PROM = "ckpt/rf50mm/Sdirt_best_acc1"


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
    vals = {}
    if os.path.exists(path):
        for line in open(path):
            m = re.match(r"\[real (\w+)\] acc1 ([\d.]+)", line)
            if m:
                vals[m.group(1)] = float(m.group(2))
    return vals


def main():
    os.makedirs("logs", exist_ok=True)
    log("waiting for v4c trainer to finish")
    while True:
        pid = read_pid("/tmp/train_v4c.pid")
        if pid and not alive(pid):
            log(f"trainer supervisor {pid} exited")
            break
        if time.time() > TRAIN_DEADLINE and pid and alive(pid):
            log(f"TRAIN_DEADLINE reached; stopping trainer tree at pid {pid}")
            kill_tree(pid)
            break
        time.sleep(60)
    time.sleep(30)

    # 1. depth eval + promotion
    if os.path.isdir(V4C):
        run([sys.executable, "scripts/eval_depth_ckpt.py", "--ckpt", V4C,
             "--skip-synth"], "logs/eval_v4c.log", 3600)
        run([sys.executable, "scripts/eval_depth_ckpt.py", "--ckpt", PROM,
             "--skip-synth"], "logs/eval_prom_r4.log", 3600)
        a_new, a_old = real_acc1("logs/eval_v4c.log"), real_acc1("logs/eval_prom_r4.log")
        log(f"real-set acc1 v4c={a_new} promoted={a_old}")
        wins = sum(1 for s in a_new if s in a_old and a_new[s] >= a_old[s])
        if len(a_new) == 3 and wins >= 2:
            log(f"PROMOTING v4c ({wins}/3 scene wins)")
            shutil.move(PROM, "ckpt/rf50mm/Sdirt_best_acc1_prev_r4")
            shutil.copytree(V4C, PROM)
        else:
            log(f"keeping current promoted ckpt (v4c wins only {wins}/3)")
    else:
        log(f"no v4c candidate at {V4C}")

    # 2. idle-chip bench with the specialized trace
    run([sys.executable, "bench.py"], "logs/bench_idle_r04.log", 2400)

    # 3. dense-tap distill of the K=48 basis student from the w512 teacher
    st48 = "results/distill_basis48/psfnet_mlpb@256x48"
    rc = run([sys.executable, "scripts/distill_basis_student.py",
              "--teacher", "mlp", "--teacher-ckpt", "ckpt/rf50mm/F4_PSFNet_mlp",
              "--student", "mlpb@256x48",
              "--warm", "ckpt/rf50mm/F4_PSFNet_mlp@256",
              "--out", "results/distill_basis48",
              "--iters", "200000", "--lr", "1e-4"],
             "logs/distill_basis48.log", 7200)
    if rc == -1:   # timed out: resume once with a shorter horizon
        run([sys.executable, "scripts/distill_basis_student.py",
             "--teacher", "mlp", "--teacher-ckpt", "ckpt/rf50mm/F4_PSFNet_mlp",
             "--student", "mlpb@256x48",
             "--out", "results/distill_basis48",
             "--iters", "200000", "--lr", "1e-4", "--resume"],
            "logs/distill_basis48_resume.log", 3600)

    if os.path.isdir(st48):
        # 4. speed
        run([sys.executable, "scripts/bench_render_variants.py",
             "--model", "mlpb@256x48", "--psfnet", st48,
             "--only", "pipe:scan", "pipe:basis", "pipe:basis_int8"],
            "logs/bench_basis48.log", 2400)
        # 5. fidelity: student vs the w512 scan_f32 reference
        run([sys.executable, "scripts/gate_render_variants.py",
             "--model", "mlpb@256x48", "--psfnet", st48,
             "--f32-baseline", "--variants", "basis", "basis_int8"],
            "logs/gate_basis48.log", 3600)
        run([sys.executable, "scripts/gate_render_variants.py",
             "--f32-baseline", "--variants", "fused"],
            "logs/gate_w512_f32ref.log", 2400)
    else:
        log(f"no distilled student at {st48}; skipping basis48 bench/gate")

    # 6. rf35mm w256 student (dense-tap distill) + teacher-relative gate
    st35 = "results/distill_rf35_w256/psfnet_mlp@256"
    run([sys.executable, "scripts/distill_basis_student.py",
         "--lens", "lenses/rf35mm/lens_web.json",
         "--teacher", "mlp", "--teacher-ckpt", "ckpt/rf35mm/F4_PSFNet_mlp",
         "--student", "mlp@256",
         "--warm", "ckpt/rf50mm/F4_PSFNet_mlp@256",
         "--out", "results/distill_rf35_w256",
         "--iters", "150000", "--lr", "1e-4"],
        "logs/distill_rf35_w256.log", 7200)
    if os.path.isdir(st35):
        run([sys.executable, "scripts/gate_rf35_student.py",
             "--student-ckpt", st35],
            "logs/gate_rf35_w256.log", 3600)
        run([sys.executable, "scripts/bench_render_variants.py",
             "--lens", "lenses/rf35mm/lens_web.json",
             "--model", "mlp@256", "--psfnet", st35,
             "--only", "pipe:scan", "pipe:fused", "pipe:fused_int8"],
            "logs/bench_rf35_w256.log", 2400)
    else:
        log(f"no rf35mm student at {st35}; skipping gate/bench")

    log("r4 queue complete — chip idle")


if __name__ == "__main__":
    main()
