#!/usr/bin/env python
"""Round-4e unattended TPU queue (runs after r4d): rf35mm basis student.

Two pieces of unfinished rf35mm business once r4d drains:

  0. r4d's step 6 re-distills the w256 student from a refit teacher and
     gates/benches it, but never PROMOTES it — if logs/gate_rf35_w256b.log
     shows a PASS, swap the passing (and faster) variant into
     ckpt/rf35mm/PROMOTED_SURROGATE.json and replace the student ckpt.
  1. The serving record path (K=48 linear-head basis student,
     render/basis.py) is rf50mm-only — the BACKLOG's top round-5
     candidate. Distill an mlpb@256x48 student for the 21-surface rf35mm
     lens from whatever w512 teacher r4d leaves at
     ckpt/rf35mm/F4_PSFNet_mlp (it may have swapped in a refit), gate it
     teacher-relative (scripts/gate_rf35_student.py), and promote iff it
     PASSES and beats the promoted variant's ms/pair.

Every step is bounded and banks its artifact; promotion decisions are
parsed from the step logs by the module-level helpers below (covered by
tests/test_queue_parsing.py, like the r4d parsers).
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
LOG = os.path.join(HERE, "logs", "r4e_tpu_queue.log")
RF35 = "lenses/rf35mm/lens_web.json"
RF35_TEACHER = "ckpt/rf35mm/F4_PSFNet_mlp"
RF35_W256 = "ckpt/rf35mm/F4_PSFNet_mlp@256"
MANIFEST = "ckpt/rf35mm/PROMOTED_SURROGATE.json"


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
    """Run a bounded step in its own process GROUP and kill the whole group
    on timeout. subprocess.run(timeout=...) SIGKILLs only the direct child;
    a step that wraps a shell launcher (run_train_supervised.sh) would
    otherwise orphan its python grandchild, which keeps holding the
    exclusive TPU chip and wedges every later step."""
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


def gate_passes(path):
    """Variants whose gate verdict line reads PASS, from a
    gate_rf35_student.py log: 'GATE rf35 basis: PASS (bar 47.84/44.90)'."""
    out = set()
    if os.path.exists(path):
        for line in open(path):
            m = re.match(r"GATE rf35 (\S+): (PASS|FAIL)", line)
            if m and m.group(2) == "PASS":
                out.add(m.group(1))
    return out


def bench_ms(path):
    """variant -> ms/pair from a bench_render_variants.py log:
    'pipe:basis             18.08 ms/pair   max|diff vs base| ...'."""
    out = {}
    if os.path.exists(path):
        for line in open(path):
            m = re.match(r"pipe:(\S+)\s+([\d.]+) ms/pair", line)
            if m:
                out[m.group(1)] = float(m.group(2))
    return out


def promoted_ms(manifest=MANIFEST):
    """ms/pair of the currently promoted rf35 variant, read from the
    manifest's own speed log; None if either is unreadable."""
    try:
        man = json.load(open(manifest))
        return bench_ms(man["speed"]).get(man["variant"])
    except (OSError, ValueError, KeyError):
        return None


def pick_promotion(passes, ms, incumbent_ms):
    """Fastest gate-passing variant that beats the incumbent, or None."""
    timed = [(ms[v], v) for v in passes if v in ms]
    if not timed:
        return None
    best_ms, best = min(timed)
    if incumbent_ms is not None and best_ms >= incumbent_ms:
        return None
    return best


def write_manifest(model, ckpt, variant, gate_log, speed_log, note):
    with open(MANIFEST, "w") as f:
        json.dump({"model": model, "ckpt": ckpt, "variant": variant,
                   "gate": gate_log, "speed": speed_log, "note": note},
                  f, indent=2)
    log(f"manifest -> {model}/{variant} ({ckpt})")


def main():
    os.makedirs("logs", exist_ok=True)
    log("waiting for the r4d queue to finish")
    while True:
        try:
            pid = int(open("/tmp/r4d_queue.pid").read().strip())
        except (OSError, ValueError):
            pid = None
        if pid is None or not alive(pid):
            log(f"r4d queue ({pid}) exited")
            break
        time.sleep(120)
    time.sleep(30)

    # 0. promote r4d's re-distilled w256 student if it gated PASS
    w256b = "results/distill_rf35_w256b/psfnet_mlp@256"
    passes = gate_passes("logs/gate_rf35_w256b.log")
    ms = bench_ms("logs/bench_rf35_w256b.log")
    pick = pick_promotion(passes, ms, promoted_ms())
    if os.path.isdir(w256b) and pick:
        log(f"promoting re-distilled w256 student ({pick} {ms[pick]} ms/pair)")
        if os.path.isdir(RF35_W256):
            shutil.rmtree(RF35_W256 + "_r1distill", ignore_errors=True)
            shutil.move(RF35_W256, RF35_W256 + "_r1distill")
        shutil.copytree(w256b, RF35_W256)
        write_manifest(
            "mlp@256", RF35_W256, pick,
            "logs/gate_rf35_w256b.log", "logs/bench_rf35_w256b.log",
            "w256 student re-distilled from the refit rf35mm w512 teacher "
            "(r4d step 6); teacher-relative gate PASS "
            "(scripts/gate_rf35_student.py). Promoted by r4e step 0.")
    else:
        log(f"no w256b promotion (dir={os.path.isdir(w256b)} "
            f"passes={sorted(passes)} pick={pick})")

    # 1. distill the rf35mm K=48 basis student (trunk warm from w256)
    st = "results/distill_rf35_basis48/psfnet_mlpb@256x48"
    rc = run([sys.executable, "scripts/distill_basis_student.py",
              "--lens", RF35, "--teacher", "mlp",
              "--teacher-ckpt", RF35_TEACHER,
              "--student", "mlpb@256x48", "--warm", RF35_W256,
              "--out", "results/distill_rf35_basis48",
              "--iters", "200000", "--lr", "1e-4"],
             "logs/distill_rf35_basis48.log", 10800)
    if rc != 0 or not os.path.isdir(st):
        log("distill failed; stopping before gate/bench")
    else:
        # 2. teacher-relative gate on the basis variants
        run([sys.executable, "scripts/gate_rf35_student.py",
             "--student", "mlpb@256x48", "--student-ckpt", st,
             "--variants", "basis", "basis_int8"],
            "logs/gate_rf35_basis48.log", 3600)

        # 3. speed on the same ckpt; promote iff PASS and faster
        run([sys.executable, "scripts/bench_render_variants.py",
             "--lens", RF35, "--model", "mlpb@256x48", "--psfnet", st,
             "--only", "pipe:scan", "pipe:basis", "pipe:basis_int8"],
            "logs/bench_rf35_basis48.log", 2400)
        passes = gate_passes("logs/gate_rf35_basis48.log")
        ms = bench_ms("logs/bench_rf35_basis48.log")
        incumbent = promoted_ms()
        pick = pick_promotion(passes, ms, incumbent)
        log(f"basis gate passes={sorted(passes)} ms={ms} "
            f"incumbent={incumbent} pick={pick}")
        if pick:
            dst = "ckpt/rf35mm/F4_PSFNet_mlpb@256x48"
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(st, dst)
            write_manifest(
                "mlpb@256x48", dst, pick,
                "logs/gate_rf35_basis48.log", "logs/bench_rf35_basis48.log",
                "K=48 linear-head basis student for the 21-surface rf35mm "
                "lens, dense-tap distilled from the rf35mm w512 teacher "
                "(200k iters, trunk warm-started from the rf35mm w256 "
                "student). Teacher-relative gate PASS within 1 dB of the "
                "rf50mm precedent pair; promoted over the w256 student on "
                "speed (see the speed log). Brings the basis render record "
                "path (render/basis.py) to both shipped optics.")

    # 4. final idle-chip bench
    run([sys.executable, "bench.py"], "logs/bench_idle_r04e.log", 2400)
    log("r4e queue complete — chip idle")


if __name__ == "__main__":
    main()
