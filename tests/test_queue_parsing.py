"""Log-parsing units of the unattended TPU queue scripts: promotion
decisions hinge on these regexes, so they get direct tests."""

import importlib.util
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(HERE, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    saved = os.getcwd()
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        os.chdir(saved)
    return mod


def test_gate_rows_parses_variant_lines(tmp_path):
    q = _load("basis_student_queue")
    p = tmp_path / "gate.log"
    p.write_text(
        "noise line\n"
        "--- scan: psnr_l 37.405 psnr_r 36.833 ssim_l 0.9842 ssim_r 0.9820\n"
        "--- basis: psnr_l 37.301 psnr_r 37.100 ssim_l 0.9830 ssim_r 0.9835\n"
        "--- basis_int8: FAILED ValueError: boom\n")
    rows = q.gate_rows(str(p))
    assert rows == {"scan": (37.405, 36.833), "basis": (37.301, 37.1)}
    assert q.gate_rows(str(tmp_path / "missing.log")) == {}


def test_eval_real_acc1_parses_scene_lines(tmp_path):
    q = _load("post_v4ws_pipeline")
    p = tmp_path / "eval.log"
    p.write_text("[real box] acc1 0.7369  mae 0.239\n"
                 "[real f2d] acc1 0.7153  mae 0.210\n"
                 "garbage\n"
                 "[real casual] acc1 0.5822  mae 0.789\n")
    assert q.real_acc1(str(p)) == {"box": 0.7369, "f2d": 0.7153,
                                   "casual": 0.5822}


def test_speed_line_regex_matches_bench_output():
    import re

    line = "pipe:basis             12.34 ms/pair   max|diff vs base| 1.2e-02"
    m = re.match(r"pipe:(\S+)\s+([\d.]+) ms/pair", line)
    assert m and m.group(1) == "basis" and float(m.group(2)) == 12.34


def test_r4e_promotion_parsers(tmp_path):
    """r4e promotes on (gate PASS) AND (faster than the incumbent); both
    halves are parsed from logs, so the regexes and the decision rule get
    direct coverage."""
    q = _load("r4e_tpu_queue")
    g = tmp_path / "gate.log"
    g.write_text("--- rf35 basis: agree_l 58.1 agree_r 58.0\n"
                 "GATE rf35 basis: PASS (bar 47.84/44.90)\n"
                 "GATE rf35 basis_int8: FAIL (bar 47.84/44.90)\n")
    assert q.gate_passes(str(g)) == {"basis"}
    assert q.gate_passes(str(tmp_path / "missing.log")) == set()

    b = tmp_path / "bench.log"
    b.write_text("loaded mlpb@256x48 surrogate from X\n"
                 "pipe:scan              28.75 ms/pair   max|diff| 0.0e+00\n"
                 "pipe:basis             17.20 ms/pair   max|diff| 1.2e-02\n"
                 "pipe:basis_int8        16.00 ms/pair   max|diff| 3.1e-01\n")
    ms = q.bench_ms(str(b))
    assert ms == {"scan": 28.75, "basis": 17.2, "basis_int8": 16.0}

    # fastest PASSING variant wins; a failing-but-faster one must not
    assert q.pick_promotion({"basis"}, ms, 20.75) == "basis"
    assert q.pick_promotion({"basis", "basis_int8"}, ms, 20.75) == "basis_int8"
    # slower than the incumbent -> no promotion; unknown incumbent -> promote
    assert q.pick_promotion({"basis"}, ms, 17.0) is None
    assert q.pick_promotion({"basis"}, ms, None) == "basis"
    assert q.pick_promotion(set(), ms, 20.75) is None
    assert q.pick_promotion({"basis"}, {}, 20.75) is None

    man = tmp_path / "man.json"
    man.write_text('{"variant": "basis", "speed": "%s"}' % b)
    assert q.promoted_ms(str(man)) == 17.2
    assert q.promoted_ms(str(tmp_path / "missing.json")) is None


def test_r4d_promotion_parsers(tmp_path):
    """The r4d queue's promotion/swap decisions parse real-scene acc1 and
    teacher truth-L1 lines; a silent regex miss would skip a promotion or
    swap a worse teacher, so both parsers get direct coverage."""
    q = _load("r4d_tpu_queue")
    ev = tmp_path / "eval.log"
    ev.write_text("[real box] acc1 0.7471  mae 0.261\n"
                  "preamble\n"
                  "[real f2d] acc1 0.8164  mae 0.198\n"
                  "[real casual] acc1 0.6226  mae 0.789\n")
    assert q.real_acc1(str(ev)) == {"box": 0.7471, "f2d": 0.8164,
                                    "casual": 0.6226}
    pr = tmp_path / "probe.log"
    pr.write_text("ckpt/rf35mm/F4_PSFNet_mlp: truth L1 0.003512  L2 1.2e-05\n")
    assert q.teacher_l1(str(pr)) == 0.003512
    assert q.teacher_l1(str(tmp_path / "missing.log")) is None
    assert q.real_acc1(str(tmp_path / "missing.log")) == {}


def test_r4f_cutover_predicates(tmp_path):
    """r4f kills the r4d process group only once the mid-queue bench has
    banked its JSON line; a false positive would discard the far-field A/B
    step mid-flight, so the predicate gets direct coverage."""
    q = _load("r4f_tpu_queue")
    p = tmp_path / "bench.log"
    assert q.bench_banked(str(p)) is False                # missing file
    p.write_text("WARNING: axon experimental\n"
                 "dp pairs/s 55.3\n")
    assert q.bench_banked(str(p)) is False                # no JSON yet
    p.write_text("WARNING: axon experimental\n"
                 '{"metric": "dp_image_pairs_per_sec", "value": 55.3, '
                 '"unit": "pairs/s", "vs_baseline": 7627.6}\n')
    assert q.bench_banked(str(p)) is True

    # r4d_pid guards against a stale pid file and pid reuse
    assert q.r4d_pid(str(tmp_path / "absent.pid")) is None
    pf = tmp_path / "r4d.pid"
    pf.write_text("not-a-pid\n")
    assert q.r4d_pid(str(pf)) is None
    pf.write_text("999999999\n")                          # no such process
    assert q.r4d_pid(str(pf)) is None
    import os as _os
    pf.write_text(f"{_os.getpid()}\n")                    # alive, wrong cmd
    assert q.r4d_pid(str(pf)) is None


def test_r4g_wait_predicate(tmp_path):
    """r4g must start only after r4f finishes; a false 'alive' would make
    it wait forever, a false 'dead' would contend for the exclusive chip."""
    q = _load("r4g_tpu_queue")
    assert q.r4f_alive(str(tmp_path / "absent.pid")) is None
    pf = tmp_path / "r4f.pid"
    pf.write_text("not-a-pid\n")
    assert q.r4f_alive(str(pf)) is None
    pf.write_text("999999999\n")                          # no such process
    assert q.r4f_alive(str(pf)) is None
    import os as _os
    pf.write_text(f"{_os.getpid()}\n")                    # alive, wrong cmd
    assert q.r4f_alive(str(pf)) is None


def test_r4h_train_step_argv_matching():
    q = _load("r4h_tpu_queue")
    # the real wrapper invocation
    assert q.is_train_step(
        ["bash", "scripts/run_train_supervised.sh", "configs/x.yml"])
    assert q.is_train_step(
        ["/usr/bin/bash", "scripts/run_train_supervised.sh"])
    # an interactive shell whose COMMAND TEXT mentions the script must
    # never match (this is the self-kill hazard of substring matching)
    assert not q.is_train_step(
        ["/bin/bash", "-c", "nohup bash scripts/run_train_supervised.sh"])
    assert not q.is_train_step(["python", "apps/dfdp_net.py"])
    assert not q.is_train_step([])


def test_r4h_pid_from_file_guards(tmp_path):
    q = _load("r4h_tpu_queue")
    # stale / missing / garbage pid files resolve to None
    assert q.pid_from_file(str(tmp_path / "absent.pid"), "x") is None
    bad = tmp_path / "bad.pid"
    bad.write_text("not-a-pid\n")
    assert q.pid_from_file(str(bad), "x") is None
    # live pid whose cmdline lacks the marker is rejected (pid reuse)
    me = tmp_path / "me.pid"
    me.write_text(f"{os.getpid()}\n")
    assert q.pid_from_file(str(me), "definitely-not-in-our-cmdline") is None

