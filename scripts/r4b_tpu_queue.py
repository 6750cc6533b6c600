#!/usr/bin/env python
"""Round-4b unattended TPU queue: the distill items the r4 queue lost to
the eval OOM (fixed in psfnet/train.py make_eval_fn — point-axis chunking).

  1. distill mlpb@256x48 from the w512 teacher's predicted taps (VERDICT
     item 2), trunk warm-started from w256; speed + fidelity gates
  2. distill an rf35mm mlp@256 student (VERDICT item 4); teacher-relative
     gate + bench

Each step bounded and logged; the queue leaves the chip idle at the end.
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)
LOG = os.path.join(HERE, "logs", "r4b_tpu_queue.log")


def log(msg):
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


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


def main():
    os.makedirs("logs", exist_ok=True)

    # 1. dense-tap distill of the K=48 basis student from the w512 teacher
    st48 = "results/distill_basis48/psfnet_mlpb@256x48"
    rc = run([sys.executable, "scripts/distill_basis_student.py",
              "--teacher", "mlp", "--teacher-ckpt", "ckpt/rf50mm/F4_PSFNet_mlp",
              "--student", "mlpb@256x48",
              "--warm", "ckpt/rf50mm/F4_PSFNet_mlp@256",
              "--out", "results/distill_basis48",
              "--iters", "200000", "--lr", "1e-4"],
             "logs/distill_basis48.log", 10800)
    if rc == -1:   # timed out: resume once with the banked state
        run([sys.executable, "scripts/distill_basis_student.py",
             "--teacher", "mlp", "--teacher-ckpt", "ckpt/rf50mm/F4_PSFNet_mlp",
             "--student", "mlpb@256x48",
             "--out", "results/distill_basis48",
             "--iters", "200000", "--lr", "1e-4", "--resume"],
            "logs/distill_basis48_resume.log", 3600)

    if os.path.isdir(st48):
        run([sys.executable, "scripts/bench_render_variants.py",
             "--model", "mlpb@256x48", "--psfnet", st48,
             "--only", "pipe:scan", "pipe:basis", "pipe:basis_int8"],
            "logs/bench_basis48.log", 2400)
        run([sys.executable, "scripts/gate_render_variants.py",
             "--model", "mlpb@256x48", "--psfnet", st48,
             "--f32-baseline", "--variants", "basis", "basis_int8"],
            "logs/gate_basis48.log", 3600)
    else:
        log(f"no distilled student at {st48}; skipping basis48 bench/gate")

    # 2. rf35mm w256 student (dense-tap distill) + teacher-relative gate
    st35 = "results/distill_rf35_w256/psfnet_mlp@256"
    run([sys.executable, "scripts/distill_basis_student.py",
         "--lens", "lenses/rf35mm/lens_web.json",
         "--teacher", "mlp", "--teacher-ckpt", "ckpt/rf35mm/F4_PSFNet_mlp",
         "--student", "mlp@256",
         "--warm", "ckpt/rf50mm/F4_PSFNet_mlp@256",
         "--out", "results/distill_rf35_w256",
         "--iters", "150000", "--lr", "1e-4"],
        "logs/distill_rf35_w256.log", 10800)
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

    log("r4b queue complete — chip idle")


if __name__ == "__main__":
    main()
