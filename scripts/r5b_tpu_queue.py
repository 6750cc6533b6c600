#!/usr/bin/env python
"""Round-5b unattended TPU queue: fused-trace re-gate + K=40 basis student.

Waits for the r5 queue, then:

  1. scripts/bench_fused_trace.py — re-gate the fused trace with the
     pure-sphere fast path (plane-recentered polished quadratic + exact
     center normal — dp/fused_trace.py). 10/12 rf50mm and 19/21 rf35mm
     surfaces take it; the kernel was VPU-transcendental bound, so this is
     the VERDICT r4 item-4 push toward >=400 Mrays/s. Rewrites
     ckpt/FUSED_TRACE.json with honestly re-measured numbers (gate: parity
     on EVERY served lens + >=1.1x scan, else demotes itself).
  2. mlpb@256x40 student: dense-tap distill from the w512 teacher (the
     recipe that made K=48 gate), real-capture fidelity gate, speed A/B —
     promote iff it passes the gate AND beats the K=48 incumbent's ms/pair.
     (BACKLOG: conv term ~0.27 ms/K — K=40 targets ~16 ms/pair.)
  3. bench.py — final idle-chip record.
"""

import json
import os
import re
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)

LOG = os.path.join(HERE, "logs", "r5b_tpu_queue.log")
MODEL = "mlpb@256x40"
FIT_DIR = "results/distill_basis40"
CKPT = f"{FIT_DIR}/psfnet_{MODEL}"
SHIP = f"ckpt/rf50mm/F4_PSFNet_{MODEL}"
# incumbent: K=48 basis (RESULTS round 4): gate PSNR / speed
INCUMBENT_PSNR = (37.242, 37.189)
INCUMBENT_MS = 18.08


def log(msg):
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run(cmd, logfile, timeout):
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


def gate_rows(path):
    """{variant: (psnr_l, psnr_r)} from a gate_render_variants log."""
    rows = {}
    if os.path.exists(path):
        for line in open(path):
            m = re.match(r"--- (\S+): psnr_l ([\d.]+) psnr_r ([\d.]+)", line)
            if m:
                rows[m.group(1)] = (float(m.group(2)), float(m.group(3)))
    return rows


def bench_ms(path):
    ms = {}
    if os.path.exists(path):
        for line in open(path):
            m = re.match(r"pipe:(\S+)\s+([\d.]+) ms/pair", line)
            if m:
                ms[m.group(1)] = float(m.group(2))
    return ms


def r5_alive():
    try:
        pid = int(open("/tmp/r5_queue.pid").read().strip())
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return pid if b"r5_tpu_queue" in f.read() else None
    except (OSError, ValueError):
        return None


def wait_for_r5():
    log("waiting for r5 (completion line or pid exit)")
    seen_alive = False
    while True:
        done = os.path.exists("logs/r5_tpu_queue.log") and any(
            "r5 queue complete" in line
            for line in open("logs/r5_tpu_queue.log"))
        if done:
            log("r5 reported complete")
            break
        if r5_alive() is None:
            if seen_alive:
                log("r5 pid gone")
                break
            log("r5 pid not (yet) visible — waiting for it to appear")
        else:
            seen_alive = True
        time.sleep(120)
    time.sleep(120)


def main():
    os.makedirs("logs", exist_ok=True)
    with open("/tmp/r5b_queue.pid", "w") as f:
        f.write(str(os.getpid()))
    wait_for_r5()

    # 1. fused-trace re-gate with the sphere fast path
    run([sys.executable, "scripts/bench_fused_trace.py"],
        "logs/bench_fused_trace_r5.log", 2400)

    # 2. K=40 basis student: distill -> gate -> speed -> promote-if-wins
    rc = run([sys.executable, "scripts/distill_basis_student.py",
              "--teacher", "mlp", "--teacher-ckpt", "ckpt/rf50mm/F4_PSFNet_mlp",
              "--student", MODEL, "--warm", "ckpt/rf50mm/F4_PSFNet_mlp@256",
              "--out", FIT_DIR, "--iters", "200000", "--lr", "1e-4"],
             "logs/distill_basis40.log", 10800)
    if rc == 0 and os.path.isdir(CKPT):
        run([sys.executable, "scripts/gate_render_variants.py",
             "--model", MODEL, "--psfnet", CKPT,
             "--variants", "scan", "basis", "--f32-baseline"],
            "logs/gate_basis40.log", 3600)
        run([sys.executable, "scripts/bench_render_variants.py",
             "--model", MODEL, "--psfnet", CKPT, "--only", "pipe:basis"],
            "logs/bench_basis40.log", 2400)
        rows = gate_rows("logs/gate_basis40.log")
        ms = bench_ms("logs/bench_basis40.log").get("basis")
        log(f"gate rows: {rows}  basis ms/pair: {ms}")
        base = rows.get("scan_f32", rows.get("scan"))
        ok = ("basis" in rows and base is not None
              and rows["basis"][0] >= base[0] - 0.1
              and rows["basis"][1] >= base[1] - 0.1
              and rows["basis"][0] >= INCUMBENT_PSNR[0] - 0.1
              and rows["basis"][1] >= INCUMBENT_PSNR[1] - 0.1)
        if ok and ms is not None and ms < INCUMBENT_MS:
            log(f"PROMOTING {MODEL} basis ({ms} ms/pair < {INCUMBENT_MS})")
            if os.path.isdir(SHIP):
                shutil.rmtree(SHIP)
            shutil.copytree(CKPT, SHIP)
            with open("ckpt/rf50mm/PROMOTED_SURROGATE.json", "w") as f:
                json.dump({
                    "model": MODEL, "ckpt": SHIP, "variant": "basis",
                    "gate": "logs/gate_basis40.log",
                    "speed": "logs/bench_basis40.log",
                    "note": (f"K=40 basis student (dense-tap distilled from "
                             f"the w512 teacher, trunk warm-started from "
                             f"w256): {ms} ms/pair, gate PSNR L/R "
                             f"{rows['basis'][0]:.3f}/{rows['basis'][1]:.3f} "
                             f"vs f32-scan {base[0]:.3f}/{base[1]:.3f}."),
                }, f, indent=2)
        else:
            log("K=40 not promoted (gate fail or not faster); "
                "incumbent K=48 stands")
    else:
        log("K=40 distill failed; skipping gate")

    # 3. final idle-chip bench
    run([sys.executable, "bench.py"], "logs/bench_idle_r05b.log", 2400)
    log("r5b queue complete — chip idle")


if __name__ == "__main__":
    main()
