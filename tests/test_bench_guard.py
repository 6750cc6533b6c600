"""Busy-chip guard of bench.py: the driver runs `python bench.py` at round
end, but only ONE process can hold the TPU — if an unattended queue is
mid-flight the bench would block silently for hours. The guard serves the
last banked idle-chip bench instead; its two predicates (live-holder
detection with ancestor exemption, banked-log selection) decide whether a
real measurement happens, so they get direct coverage."""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import banked_bench, chip_holder  # noqa: E402


def test_chip_holder_detects_live_queue(tmp_path):
    # a live TRAINER entry point holds the chip directly
    p = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)",
                          "dfdp_net_marker"])
    try:
        pf = tmp_path / "train_x.pid"
        pf.write_text(str(p.pid))
        # /proc cmdline shows the pre-exec image briefly after fork; on a
        # loaded 1-core host the exec can lag the assert, so poll
        deadline = time.time() + 10
        seen = None
        while time.time() < deadline:
            seen = chip_holder((str(pf),))
            if seen == p.pid:
                break
            time.sleep(0.2)
        assert seen == p.pid
    finally:
        p.kill()
        p.wait()
    # dead pid -> stale file rejected
    assert chip_holder((str(pf),)) is None


def test_chip_holder_queue_needs_live_step(tmp_path):
    """A queue pid counts as a holder only while a step CHILD is running;
    a queue idle-waiting on another queue leaves the chip free (the r4f
    wait wedged the r4d mid-bench into the stale fallback otherwise)."""
    pf = tmp_path / "x_queue.pid"
    # childless queue -> not a holder
    p = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)",
                          "_tpu_queue_marker"])
    try:
        pf.write_text(str(p.pid))
        assert chip_holder((str(pf),)) is None
    finally:
        p.kill()
        p.wait()
    # queue with a live child step -> holder
    q = subprocess.Popen([sys.executable, "-c",
                          "import subprocess, sys, time;"
                          "c = subprocess.Popen([sys.executable, '-c',"
                          "'import time; time.sleep(30)']);"
                          "time.sleep(30)",
                          "_tpu_queue_marker"])
    try:
        pf.write_text(str(q.pid))
        deadline = time.time() + 10
        seen = None
        while time.time() < deadline:
            seen = chip_holder((str(pf),))
            if seen == q.pid:
                break
            time.sleep(0.2)
        assert seen == q.pid
    finally:
        q.kill()
        q.wait()


def test_chip_holder_skips_self_and_ancestors(tmp_path):
    pf = tmp_path / "x_queue.pid"
    # a queue's own bench step sees its parent queue in the pid file; the
    # queue is idle-waiting on the bench, so it must NOT count as a holder
    pf.write_text(str(os.getppid()))
    assert chip_holder((str(pf),)) is None
    pf.write_text(str(os.getpid()))
    assert chip_holder((str(pf),)) is None
    # garbage pid file
    pf.write_text("not-a-pid")
    assert chip_holder((str(pf),)) is None
    assert chip_holder((str(tmp_path / "absent.pid"),)) is None


def test_banked_bench_picks_newest_complete_log(tmp_path):
    assert banked_bench(str(tmp_path)) is None
    old = tmp_path / "bench_idle_r03.log"
    old.write_text(
        '{"metric": "dp_image_pairs_per_sec", "value": 43.3, '
        '"unit": "pairs/s", "vs_baseline": 5971.7}\n'
        '{"metric": "dp_psf_trace_and_splat_rays_per_sec_per_chip", '
        '"value": 142780465, "unit": "rays/s", "vs_baseline": 1036.7}\n')
    t = time.time()
    os.utime(old, (t - 100, t - 100))
    # a newer but INCOMPLETE log (one metric only) must not win
    partial = tmp_path / "bench_idle_r04_cut.log"
    partial.write_text(
        'WARNING: axon experimental\n'
        '{"metric": "dp_image_pairs_per_sec", "value": 55.3, '
        '"unit": "pairs/s", "vs_baseline": 7627.6}\n')
    os.utime(partial, (t - 50, t - 50))
    ts, path, objs = banked_bench(str(tmp_path))
    assert path == str(old) and len(objs) == 2
    assert objs[0]["value"] == 43.3
    # a newer complete log wins
    new = tmp_path / "bench_idle_r04.log"
    new.write_text(
        '# promoted surrogate: noise line\n'
        '{"metric": "dp_image_pairs_per_sec", "value": 55.3, '
        '"unit": "pairs/s", "vs_baseline": 7627.6}\n'
        '{"metric": "dp_psf_trace_and_splat_rays_per_sec_per_chip", '
        '"value": 318306524, "unit": "rays/s", "vs_baseline": 2311.1}\n')
    ts, path, objs = banked_bench(str(tmp_path))
    assert path == str(new)
    assert [o["value"] for o in objs] == [55.3, 318306524]
    assert json.dumps(objs[0])  # objects are re-serializable
    # a NEWER log whose lines are themselves fallback output (banked_from
    # tag) must be ignored — a re-bank is not a fresh measurement
    rebank = tmp_path / "bench_idle_r04_mid.log"
    rebank.write_text(
        '{"metric": "dp_image_pairs_per_sec", "value": 39.6, '
        '"unit": "pairs/s", "vs_baseline": 5458.7, '
        '"banked_from": "logs/bench_idle_r04.log", '
        '"banked_utc": "2026-08-19T13:58:12Z"}\n'
        '{"metric": "dp_psf_trace_and_splat_rays_per_sec_per_chip", '
        '"value": 105355560, "unit": "rays/s", "vs_baseline": 764.9, '
        '"banked_from": "logs/bench_idle_r04.log", '
        '"banked_utc": "2026-08-19T13:58:12Z"}\n')
    os.utime(rebank, (t + 50, t + 50))
    ts, path, objs = banked_bench(str(tmp_path))
    assert path == str(new), "re-banked fallback lines must not win"
