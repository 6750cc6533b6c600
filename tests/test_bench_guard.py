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
    # a live process whose cmdline names a chip-holding entry point
    p = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)",
                          "_tpu_queue_marker"])
    try:
        pf = tmp_path / "x_queue.pid"
        pf.write_text(str(p.pid))
        assert chip_holder((str(pf),)) == p.pid
    finally:
        p.kill()
        p.wait()
    # dead pid -> stale file rejected
    assert chip_holder((str(pf),)) is None


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
