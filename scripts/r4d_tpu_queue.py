#!/usr/bin/env python
"""Round-4d unattended TPU queue (replaces r4c; runs behind the v5 trainer).

Reordered so the not-yet-satisfied VERDICT r3 items bank their artifacts
BEFORE the long rf35mm repair chain (an improvement to an already-satisfied
item), in case the round ends mid-queue:

  1. eval v5 vs the promoted depth ckpt on the real scenes; promote on
     >= 2/3 acc1 wins (the standing promotion rule)
  2. Pallas fused-trace on-chip A/B + promotion manifest (headline rays/s;
     gates parity on BOTH lenses so the fit/probe supervision below is safe)
  3. F/1.8 ks35 surrogate fit (30k) -> ckpt/rf50mm/F18_PSFNet_mlp_ks35
  4. far-field A/B trainings (F/4 vs F/1.8, 12 epochs @ 256x384) and the
     shared-val comparison (VERDICT r3 item 8)
  5. mid-queue bench (banks a bench artifact with the promotions so far)
  6. rf35mm teacher repair: probe the fit-era teacher's truth L1, REFIT the
     w512 teacher (90k iters), swap if better; re-distill the w256 student
     from the refit teacher; gate + bench
  7. final idle-chip bench

Every step bounded and logged; later steps degrade gracefully if the round
ends first (each banks its own artifact on completion).
"""

import os
import re
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)
LOG = os.path.join(HERE, "logs", "r4d_tpu_queue.log")
PROM = "ckpt/rf50mm/Sdirt_best_acc1"
V5 = "ckpt/rf50mm/Sdirt_best_acc1_v5"
RF35_TEACHER = "ckpt/rf35mm/F4_PSFNet_mlp"


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


def teacher_l1(path):
    if os.path.exists(path):
        for line in open(path):
            m = re.search(r"truth L1 ([\d.]+)", line)
            if m:
                return float(m.group(1))
    return None


def main():
    os.makedirs("logs", exist_ok=True)
    log("waiting for v5 trainer to finish")
    while True:
        try:
            pid = int(open("/tmp/train_v5.pid").read().strip())
        except (OSError, ValueError):
            pid = None
        if pid and not alive(pid):
            log(f"trainer supervisor {pid} exited")
            break
        time.sleep(60)
    time.sleep(30)

    # 1. depth eval + promotion
    if os.path.isdir(V5):
        run([sys.executable, "scripts/eval_depth_ckpt.py", "--ckpt", V5,
             "--skip-synth"], "logs/eval_v5.log", 3600)
        run([sys.executable, "scripts/eval_depth_ckpt.py", "--ckpt", PROM,
             "--skip-synth"], "logs/eval_prom_r4c.log", 3600)
        a_new = real_acc1("logs/eval_v5.log")
        a_old = real_acc1("logs/eval_prom_r4c.log")
        log(f"real-set acc1 v5={a_new} promoted={a_old}")
        wins = sum(1 for s in a_new if s in a_old and a_new[s] >= a_old[s])
        if len(a_new) == 3 and wins >= 2:
            log(f"PROMOTING v5 ({wins}/3 scene wins)")
            shutil.move(PROM, "ckpt/rf50mm/Sdirt_best_acc1_prev_v5")
            shutil.copytree(V5, PROM)
        else:
            log(f"keeping current promoted ckpt (v5 wins only {wins}/3)")
    else:
        log(f"no v5 candidate at {V5}")

    # 2. Pallas fused-trace A/B + promotion (feeds the headline rays/s bench
    #    AND the fit/probe supervision default via ckpt/FUSED_TRACE.json)
    run([sys.executable, "scripts/bench_fused_trace.py"],
        "logs/bench_fused_trace_r4.log", 2400)

    # 3. F/1.8 ks35 surrogate fit (VERDICT item 8 prerequisite; the r3 fit
    #    artifact was lost with a host recycle)
    rc = run([sys.executable, "apps/fit_psfnet.py", "--fnum", "1.8",
              "--ks", "35", "--iters", "30000",
              "--result-dir", "results/f18_fit", "--skip-analysis"],
             "logs/f18_fit_r4.log", 5400)
    f18 = "results/f18_fit/psfnet_mlp"
    if rc == 0 and os.path.isdir(f18):
        if os.path.isdir("ckpt/rf50mm/F18_PSFNet_mlp_ks35"):
            shutil.rmtree("ckpt/rf50mm/F18_PSFNet_mlp_ks35")
        shutil.copytree(f18, "ckpt/rf50mm/F18_PSFNet_mlp_ks35")

        # 4. far-field A/B trainings + shared-val comparison (VERDICT item 8)
        run(["bash", "scripts/run_train_supervised.sh",
             "configs/dfdp_f4_farfield_256.yml"],
            "logs/train_f4_farfield.log", 7200)
        run(["bash", "scripts/run_train_supervised.sh",
             "configs/dfdp_f18_farfield_256.yml"],
            "logs/train_f18_farfield.log", 7200)
        if (os.path.isdir("ckpt/rf50mm/Sdirt_f4_farfield")
                and os.path.isdir("ckpt/rf50mm/Sdirt_f18_farfield")):
            run([sys.executable, "scripts/eval_farfield_ab.py",
                 "--arm", "f4", "ckpt/rf50mm/Sdirt_f4_farfield",
                 "ckpt/rf50mm/F4_PSFNet_mlp", "21",
                 "--arm", "f18", "ckpt/rf50mm/Sdirt_f18_farfield",
                 "ckpt/rf50mm/F18_PSFNet_mlp_ks35", "35"],
                "logs/eval_farfield_ab.log", 3600)

    # 5. mid-queue bench: bank the headline with promotions so far
    run([sys.executable, "bench.py"], "logs/bench_idle_r04_mid.log", 2400)

    # 6. rf35mm teacher repair
    run([sys.executable, "scripts/probe_teacher_l1.py",
         "--lens", "lenses/rf35mm/lens_web.json", "--ckpt", RF35_TEACHER],
        "logs/probe_rf35_teacher_old.log", 2400)
    old_l1 = teacher_l1("logs/probe_rf35_teacher_old.log")
    log(f"fit-era rf35 teacher truth L1 = {old_l1}")
    rc = run([sys.executable, "apps/fit_psfnet.py",
              "--lens", "lenses/rf35mm/lens_web.json",
              "--iters", "90000", "--result-dir", "results/rf35_refit",
              "--skip-analysis"],
             "logs/rf35_teacher_refit.log", 7200)
    new_t = "results/rf35_refit/psfnet_mlp"
    if rc == 0 and os.path.isdir(new_t):
        run([sys.executable, "scripts/probe_teacher_l1.py",
             "--lens", "lenses/rf35mm/lens_web.json", "--ckpt", new_t],
            "logs/probe_rf35_teacher_new.log", 2400)
        new_l1 = teacher_l1("logs/probe_rf35_teacher_new.log")
        log(f"refit rf35 teacher truth L1 = {new_l1}")
        if new_l1 is not None and (old_l1 is None or new_l1 < old_l1):
            log("swapping in the refit rf35 teacher")
            shutil.move(RF35_TEACHER, "ckpt/rf35mm/F4_PSFNet_mlp_r2fit")
            shutil.copytree(new_t, RF35_TEACHER)

            # re-distill the rf35mm w256 student from the refit teacher
            st35 = "results/distill_rf35_w256b/psfnet_mlp@256"
            run([sys.executable, "scripts/distill_basis_student.py",
                 "--lens", "lenses/rf35mm/lens_web.json",
                 "--teacher", "mlp", "--teacher-ckpt", RF35_TEACHER,
                 "--student", "mlp@256",
                 "--warm", "ckpt/rf50mm/F4_PSFNet_mlp@256",
                 "--out", "results/distill_rf35_w256b",
                 "--iters", "200000", "--lr", "1e-4"],
                "logs/distill_rf35_w256b.log", 10800)
            if os.path.isdir(st35):
                run([sys.executable, "scripts/gate_rf35_student.py",
                     "--student-ckpt", st35],
                    "logs/gate_rf35_w256b.log", 3600)
                run([sys.executable, "scripts/bench_render_variants.py",
                     "--lens", "lenses/rf35mm/lens_web.json",
                     "--model", "mlp@256", "--psfnet", st35,
                     "--only", "pipe:scan", "pipe:fused", "pipe:fused_int8"],
                    "logs/bench_rf35_w256b.log", 2400)
        else:
            log("refit teacher not better; skipping re-distill")

    # 7. final idle-chip bench
    run([sys.executable, "bench.py"], "logs/bench_idle_r04_final.log", 2400)
    log("r4d queue complete — chip idle")


if __name__ == "__main__":
    main()
