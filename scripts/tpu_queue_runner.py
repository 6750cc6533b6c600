#!/usr/bin/env python
"""Unattended TPU-queue runner for the axon-tunnel outage (BACKLOG round 3).

The axon relay died at 06:05 UTC 2026-08-18 and can only be revived host-side.
This runner polls the relay port, and the moment the tunnel is back it executes
the bounded TPU QUEUE items in order, then launches the long v4 warm-start
training under the supervised relauncher and exits:

  1. scripts/bench_render_variants.py   (A/B of the render pipeline variants)
  2. scripts/gate_render_variants.py    (real-capture PSNR fidelity gate)
     -> programmatically flip _DEFAULT_VARIANT in sdirt_tpu/render/pipeline.py
        to the fastest variant within 0.1 dB PSNR of "scan"
  3. python bench.py on the idle chip   (BENCH_r03 snapshot, logs/bench_idle_r03.log)
  4. F/1.8 ks=35 PSF fit, 30k iters (~15-30 min on chip; VERDICT item 4)
  5. nohup scripts/run_train_supervised.sh configs/dfdp_synthetic_train_512_v4_warmstart.yml

Every step is timeout-bounded and logged under logs/; a step failure is logged
and the queue continues (the training launch is the one thing that must
happen). State notes go to logs/tpu_queue_runner.log for the interactive
session to pick up.
"""

import os
import re
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(HERE)
LOG = os.path.join(HERE, "logs", "tpu_queue_runner.log")
PORT = 8082


def log(msg):
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def port_open():
    try:
        with socket.create_connection(("127.0.0.1", PORT), timeout=2):
            return True
    except OSError:
        return False


def run(cmd, logfile, timeout):
    log(f"RUN ({timeout}s cap) -> {logfile}: {' '.join(cmd)}")
    with open(logfile, "w") as f:
        try:
            rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                                timeout=timeout).returncode
        except subprocess.TimeoutExpired:
            log(f"TIMEOUT after {timeout}s: {' '.join(cmd)}")
            return -1
    log(f"rc={rc}: {' '.join(cmd)}")
    return rc


def wait_for_tunnel():
    log(f"waiting for relay port {PORT} ...")
    while True:
        if port_open():
            log("port open; confirming stability (60s)")
            time.sleep(60)
            if port_open():
                break
            log("port flapped; continuing to wait")
        time.sleep(30)
    # a real device round-trip is the only proof the TPU answers
    while True:
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print('DEVOK', jax.devices())"],
                capture_output=True, text=True, timeout=180)
            if "DEVOK" in out.stdout:
                log(f"TPU answers: {out.stdout.strip().splitlines()[-1]}")
                return
            log(f"device probe failed rc={out.returncode}: "
                f"{(out.stderr or out.stdout)[-300:]}")
        except subprocess.TimeoutExpired:
            log("device probe timed out; retrying in 60s")
        time.sleep(60)


def parse_gate(path):
    """Return {variant: psnr_l} from gate_render_variants.py output."""
    vals = {}
    if not os.path.exists(path):
        return vals
    for line in open(path):
        m = re.match(r"--- (\w+): psnr_l ([\d.]+) ", line)
        if m:
            vals[m.group(1)] = float(m.group(2))
    return vals


def parse_bench_variants(path):
    """Return {pipe-variant: ms_per_pair} from bench_render_variants output."""
    vals = {}
    if not os.path.exists(path):
        return vals
    for line in open(path):
        m = re.match(r"pipe:(\w+)\s+([-\d.]+) ms/pair", line)
        if m:
            vals[m.group(1)] = float(m.group(2))
    return vals


def flip_default_variant(winner):
    path = os.path.join(HERE, "sdirt_tpu", "render", "pipeline.py")
    src = open(path).read()
    new = re.sub(r'_DEFAULT_VARIANT = "\w+"',
                 f'_DEFAULT_VARIANT = "{winner}"', src, count=1)
    if new == src and f'"{winner}"' not in src:
        log(f"FAILED to flip default variant to {winner}")
        return
    open(path, "w").write(new)
    log(f"flipped _DEFAULT_VARIANT -> {winner}")


def main():
    os.makedirs("logs", exist_ok=True)
    wait_for_tunnel()

    # 1. variant A/B timings
    bv_log = "logs/bench_render_variants_tpu.log"
    run([sys.executable, "scripts/bench_render_variants.py"], bv_log, 2400)

    # 2. fidelity gate + default flip
    gate_log = "logs/gate_render_variants.log"
    run([sys.executable, "scripts/gate_render_variants.py"], gate_log, 2400)
    times = parse_bench_variants(bv_log)
    psnr = parse_gate(gate_log)
    log(f"variant times {times}; gate psnr_l {psnr}")
    winner = "scan"
    if "scan" in psnr and times:
        ok = [v for v in times
              if v in psnr and psnr[v] >= psnr["scan"] - 0.1]
        if ok:
            winner = min(ok, key=lambda v: times[v])
    if winner != "scan":
        flip_default_variant(winner)
    else:
        log("keeping scan as default (no gated faster variant)")

    # 3. idle-chip bench snapshot
    run([sys.executable, "bench.py"], "logs/bench_idle_r03.log", 2400)

    # 4. F/1.8 ks=35 wide-aperture PSF fit (30k iters ~= 13 min at F/4 ks=21;
    #    the 2.8x splat window makes this the stress case — cap at 2.5 h)
    run([sys.executable, "apps/fit_psfnet.py", "--fnum", "1.8", "--ks", "35",
         "--iters", "30000", "--result-dir", "results/f18_fit"],
        "logs/f18_fit.log", 9000)

    # 5. launch the v4 warm-start training under the supervisor
    with open("logs/train_512_v4ws.log", "a") as f:
        p = subprocess.Popen(
            ["bash", "scripts/run_train_supervised.sh",
             "configs/dfdp_synthetic_train_512_v4_warmstart.yml"],
            stdout=f, stderr=subprocess.STDOUT,
            start_new_session=True)
    open("/tmp/train_v4ws.pid", "w").write(str(p.pid))
    log(f"launched v4 warm-start supervisor pid={p.pid}")

    # 6. post-training pipeline (waits on the fresh pid just written):
    #    eval + promotion decision, optional TPU deblur demo, final bench
    with open("logs/post_v4ws_pipeline.out", "a") as f:
        q = subprocess.Popen([sys.executable, "scripts/post_v4ws_pipeline.py"],
                             stdout=f, stderr=subprocess.STDOUT,
                             start_new_session=True)
    open("/tmp/post_v4ws.pid", "w").write(str(q.pid))
    log(f"launched post-training pipeline pid={q.pid}")
    log("queue complete")


if __name__ == "__main__":
    main()
