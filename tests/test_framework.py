"""Framework subsystems: lens optimization, perturbation, checkpoint/resume,
failure detection, coherent OPL, data tools, synthetic dataset, sharded
multi-chip steps, graft entry."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import RF50


@pytest.mark.slow
def test_lens_optimizer_reduces_spot():
    """Differentiable lens design: a few optimizer steps on surface params
    shrink the RMS spot of a defocused singlet-like objective."""
    from sdirt_tpu.core.rays import Rays
    from sdirt_tpu.optics.lens import Lens
    from sdirt_tpu.optics.optimize import (apply_params, make_lens_optimizer,
                                           optimizable_params,
                                           surface_param_labels)
    from sdirt_tpu.optics.surfaces import trace_rays

    lens = Lens(RF50, sensor_res=(512, 768))
    eta, skip = lens.eta_arrays(0.589, True)
    rays = lens.sample_from_points(jax.random.PRNGKey(0),
                                   np.array([[0, 0, -800.0]], np.float32), spp=512)

    def rms(params):
        stack = apply_params(lens.stack, params)
        out = trace_rays(rays, stack, eta, skip).propagate_to(lens.d_sensor)
        xy = out.o[..., :2]
        m = out.ra
        ctr = (xy * m[..., None]).sum(0) / (m.sum(0) + 1e-9)
        return jnp.sum(((xy - ctr) ** 2) * m[..., None]) / (m.sum() + 1e-9)

    params = optimizable_params(lens.stack)
    scales = surface_param_labels(lens.stack, aper_idx=lens.aper_idx)
    tx = make_lens_optimizer(scales, base_lr=1.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(rms)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = float(rms(params))
    last = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        last.append(float(loss))
    # Adam wobbles for the first ~20 steps; converged loss must beat start
    assert min(last[-5:]) < 0.5 * loss0, (last[-5:], loss0)


def test_perturb_stack():
    from sdirt_tpu.optics.lens import Lens
    from sdirt_tpu.optics.optimize import perturb_stack

    lens = Lens(RF50, sensor_res=(512, 768))
    pert = perturb_stack(lens.stack, jax.random.PRNGKey(0))
    dc = np.abs(np.asarray(pert.c) - np.asarray(lens.stack.c))
    nz = np.asarray(lens.stack.c) != 0
    assert (dc[nz] > 0).all() and (dc[nz] / np.abs(np.asarray(lens.stack.c))[nz] < 0.01).all()
    # stops stay exactly flat
    assert (dc[~nz] == 0).all()


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    from sdirt_tpu.psfnet.surrogate import PSFNetLens
    from sdirt_tpu.psfnet.train import create_train_state
    from sdirt_tpu.utils.checkpoint import TrainCheckpointer

    lens = PSFNetLens(RF50, kernel_size=11, sensor_res=(512, 768))
    state, tx = create_train_state(lens, 1e-4, 100)
    state = dataclasses.replace(state, step=jnp.int32(7))

    ckpt = TrainCheckpointer(str(tmp_path / "state"))
    ckpt.save(7, state)
    ckpt.wait()

    state2, tx2 = create_train_state(lens, 1e-4, 100)
    restored, step = ckpt.restore_latest(state2)
    assert step == 7
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()


@pytest.mark.slow
def test_inference_ckpt_carries_batch_stats(tmp_path):
    """The exported inference checkpoint must round-trip BN running stats:
    BatchNorm runs on running averages at inference, so a params-only export
    silently ships a broken net (regression: ckpt_out once saved bare params
    and --stage sample produced garbage depth from the 'trained' ckpt)."""
    from sdirt_tpu.dfdp.train import create_dfdp_state, dfdp_infer
    from sdirt_tpu.utils.checkpoint import (restore_inference_ckpt,
                                            save_inference_ckpt)

    state, _ = create_dfdp_state(jax.random.PRNGKey(0), 1e-4, 1,
                                 (1, 6, 128, 192))
    # make the running stats visibly non-init so dropping them is detectable
    trained_bstats = jax.tree.map(lambda x: x + 0.37, state.batch_stats)

    path = str(tmp_path / "infer_ckpt")
    save_inference_ckpt(path, state.params, trained_bstats)
    params, bstats = restore_inference_ckpt(path, state.params,
                                            state.batch_stats)
    for a, b in zip(jax.tree.leaves(bstats), jax.tree.leaves(trained_bstats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # end-to-end: inference from the restored ckpt == inference from the
    # live (params, batch_stats) pair
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 128, 192)) * 0.1 + 0.5
    live = np.asarray(dfdp_infer(state.params, trained_bstats, x))
    restored = np.asarray(dfdp_infer(params, bstats, x))
    np.testing.assert_array_equal(live, restored)

    # legacy params-only layout: restores params, falls back to the template
    # batch_stats with a warning instead of crashing
    import orbax.checkpoint as ocp

    legacy = str(tmp_path / "legacy_ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(legacy, state.params, force=True)
    ckptr.wait_until_finished()
    params2, bstats2 = restore_inference_ckpt(legacy, state.params,
                                              state.batch_stats)
    for a, b in zip(jax.tree.leaves(params2), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(bstats2),
                    jax.tree.leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_dfdp_train_stage_resumes(tmp_path, monkeypatch):
    """App-level crash-resume AND data-parallel wiring: run the real
    --stage train loop for one epoch with data_parallel on (batch shards
    over 2 of the virtual devices, state+surrogate replicated), then rerun —
    the second run must restore the saved epoch (skipping all training
    steps) and the best-acc1 watermark from the sidecar."""
    import json
    import logging

    import apps.dfdp_net as app
    from apps.dfdp_net import config, train

    # the per-epoch real-box eval is irrelevant to resume semantics and
    # dominates CPU compile time at test scale — stub it out
    monkeypatch.setattr(app, "test_depth",
                        lambda *a, **k: {"acc1": 0.0})

    args = config("configs/dfdp_synthetic_smoke.yml")
    args.update(
        # 128 is the minimum H: the Feature tower's SPP pools 32x32 at
        # quarter resolution (models/dddnet.py:46)
        res=(128, 192), bs=2, epochs=1, synthetic_len=4, synthetic_val_len=1,
        train_mode="dfdp", save_images=False, save_ckpt=False,
        data_parallel=True,
        results_dir=str(tmp_path / "results"),
        ckpt_out=str(tmp_path / "best"),
        train_state_dir=str(tmp_path / "state"),
    )
    import os

    os.makedirs(args["results_dir"], exist_ok=True)
    train(dict(args))

    meta_path = tmp_path / "state" / "train_meta.json"
    assert meta_path.exists()
    best1 = json.load(open(meta_path))["best_acc1"]
    assert best1 >= 0.0
    assert (tmp_path / "best").exists()

    # Second invocation: must resume at epoch 1 (== epochs), run only the
    # final validation, and keep the persisted watermark.
    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    root = logging.getLogger()
    old_level = root.level
    root.addHandler(handler)
    root.setLevel(logging.INFO)
    try:
        train(dict(args))
    finally:
        root.removeHandler(handler)
        root.setLevel(old_level)
    resumed = [m for m in records if m.startswith("resumed train state")]
    assert resumed and "epoch 1" in resumed[0], records[:5]
    assert not any(m.startswith("Epoch ") for m in records), \
        "resumed run must not run any training epoch"


def test_ckpt_watermark_roundtrip(tmp_path):
    from sdirt_tpu.utils.checkpoint import (read_ckpt_watermark,
                                            write_ckpt_watermark)

    path = str(tmp_path / "best")
    assert read_ckpt_watermark(path) is None  # pre-hardening ckpts: no sidecar
    write_ckpt_watermark(path, 0.8986)
    assert read_ckpt_watermark(path) == pytest.approx(0.8986)
    # corrupt sidecar degrades to None, not an exception
    with open(path + ".meta.json", "w") as f:
        f.write("{not json")
    assert read_ckpt_watermark(path) is None


@pytest.mark.slow
def test_restart_cannot_clobber_banked_ckpt(tmp_path, monkeypatch):
    """The 2026-08-20 incident as a test: a trainer restarted with NO
    resumable train state (fresh watermark) against a banked export that
    scored 0.99 must seed its watermark from the export's sidecar and never
    overwrite the banked artifact with its own (worse) epoch-0 validation."""
    import logging
    import os

    import apps.dfdp_net as app
    from apps.dfdp_net import config, train
    from sdirt_tpu.utils.checkpoint import write_ckpt_watermark

    monkeypatch.setattr(app, "test_depth", lambda *a, **k: {"acc1": 0.0})

    args = config("configs/dfdp_synthetic_smoke.yml")
    args.update(
        res=(128, 192), bs=2, epochs=0, synthetic_len=2, synthetic_val_len=1,
        train_mode="dfdp", save_images=False, save_ckpt=False,
        results_dir=str(tmp_path / "results"),
        ckpt_out=str(tmp_path / "best"),
        # no train_state_dir: the resumable state is "lost"
    )
    os.makedirs(args["results_dir"], exist_ok=True)
    banked = tmp_path / "best"
    banked.mkdir()
    (banked / "sentinel").write_text("banked peak params")
    write_ckpt_watermark(str(banked), 0.99)

    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    root = logging.getLogger()
    old_level = root.level
    root.addHandler(handler)
    root.setLevel(logging.INFO)
    try:
        train(dict(args))
    finally:
        root.removeHandler(handler)
        root.setLevel(old_level)

    assert any(m.startswith("seeded best-acc1 watermark 0.9900")
               for m in records), records[:8]
    assert (banked / "sentinel").read_text() == "banked peak params", \
        "restart clobbered a better banked checkpoint"
    assert not any(m.startswith("ckpt_out: saved") for m in records)


@pytest.mark.slow
def test_checked_trace_reports_clean():
    from sdirt_tpu.optics.lens import Lens
    from sdirt_tpu.utils.debug import checked_trace

    lens = Lens(RF50, sensor_res=(512, 768))
    eta, skip = lens.eta_arrays(0.589, True)
    rays = lens.sample_from_points(jax.random.PRNGKey(0),
                                   np.array([[0, 0, -1000.0]], np.float32), spp=64)
    err, out = checked_trace(rays, lens.stack, eta, skip)
    err.throw()   # clean trace raises nothing
    assert np.asarray(out.ra).sum() > 0


def test_assert_finite_loss():
    from sdirt_tpu.utils.debug import assert_finite_loss

    assert assert_finite_loss(1.25) == 1.25
    with pytest.raises(FloatingPointError):
        assert_finite_loss(float("nan"))


def test_coherent_opl():
    """OPL of the axial ray through the lens equals sum(n_i * t_i); all valid
    on-axis rays share nearly equal OPL to the focus (Fermat)."""
    from sdirt_tpu.core.rays import Rays
    from sdirt_tpu.optics.lens import Lens
    from sdirt_tpu.optics.surfaces import trace_rays

    lens = Lens(RF50, sensor_res=(512, 768))
    eta, skip = lens.eta_arrays(0.589, True)
    n_in = lens.n_in_array(0.589, True)
    rays = lens.sample_from_points(jax.random.PRNGKey(1),
                                   np.array([[0, 0, -1000.0]], np.float32), spp=256)
    out = trace_rays(rays, lens.stack, eta, skip, n_in=n_in, coherent=True)
    opl = np.asarray(out.opl)
    ra = np.asarray(out.ra)
    assert (opl[ra > 0] > 0).all()
    # optical path spread across the pupil is small vs the total path
    spread = opl[ra > 0].max() - opl[ra > 0].min()
    assert spread < 0.05 * opl[ra > 0].mean()


def test_pfm_tools(tmp_path):
    from sdirt_tpu.dfdp.data_tools import process_pfm, read_pfm

    h, w = 8, 10
    disp = np.linspace(10, 50, h * w).reshape(h, w).astype(np.float32)
    with open(tmp_path / "disp0.pfm", "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        f.write(np.flipud(disp).astype("<f4").tobytes())
    (tmp_path / "calib.txt").write_text(
        "cam0=[3979.911 0 1244.772]\ncam1=x\ndoffs=124.343\nbaseline=193.001\n")

    back, scale = read_pfm(str(tmp_path / "disp0.pfm"))
    np.testing.assert_allclose(back, disp, rtol=1e-6)

    depth = process_pfm(str(tmp_path))
    expected = 193.001 * 3979.911 / (disp + 124.343)
    np.testing.assert_allclose(depth, expected, rtol=1e-5)
    import cv2 as cv

    png = cv.imread(str(tmp_path / "depth.png"), -1)
    assert png.dtype == np.uint16


def test_synthetic_dataset_and_loader():
    from sdirt_tpu.dfdp.datasets import DataLoader, SyntheticRGBD

    ds = SyntheticRGBD(resize=(32, 48), length=6, seed=1)
    img, depth = ds[0]
    assert img.shape == (3, 32, 48) and depth.shape == (1, 32, 48)
    assert 0.25 <= depth.min() and depth.max() <= 10
    # deterministic per index
    img2, _ = ds[0]
    np.testing.assert_array_equal(img, img2)
    batches = list(DataLoader(ds, batch_size=2, num_workers=2))
    assert len(batches) == 3 and batches[0][0].shape == (2, 3, 32, 48)

    # v3 near-band style: every depth inside the discriminable DP band
    ds3 = SyntheticRGBD(resize=(32, 48), length=8, seed=2, style="v3")
    all_d = np.concatenate([ds3[i][1].ravel() for i in range(len(ds3))])
    assert all_d.min() >= 0.4 - 1e-6 and all_d.max() <= 3.5 + 1e-6
    assert len(np.unique(np.round(all_d, 4))) > 8  # varied, not constant

    # v4 adds slanted/curved surfaces: same band, but depth must vary
    # INSIDE surfaces (in-image gradients), which v1-v3 never produce
    ds4 = SyntheticRGBD(resize=(32, 48), length=8, seed=2, style="v4")
    d4 = np.stack([ds4[i][1][0] for i in range(len(ds4))])
    assert d4.min() >= 0.4 - 1e-6 and d4.max() <= 3.5 + 1e-6
    gy, gx = np.abs(np.diff(d4, axis=1)), np.abs(np.diff(d4, axis=2))
    # small nonzero neighbor steps = smooth in-surface gradients (occlusion
    # edges are rare, large jumps; a slanted plane makes many tiny ones)
    smooth_steps = ((gx > 0) & (gx < 0.05)).sum() + ((gy > 0) & (gy < 0.05)).sum()
    assert smooth_steps > d4.size * 0.1, smooth_steps
    img4, _ = ds4[0]
    np.testing.assert_array_equal(img4, ds4[0][0])  # still deterministic


@pytest.mark.slow
def test_sharded_psfnet_step_multichip():
    from sdirt_tpu.dp.psf import lens_scalars
    from sdirt_tpu.parallel.mesh import make_mesh
    from sdirt_tpu.parallel.steps import make_sharded_psfnet_step
    from sdirt_tpu.psfnet.surrogate import PSFNetLens
    from sdirt_tpu.psfnet.train import create_train_state

    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    mesh = make_mesh(n_data=4, n_rays=2)
    lens = PSFNetLens(RF50, kernel_size=11, sensor_res=(512, 768))
    state, tx = create_train_state(lens, 1e-4, 10)
    step = make_sharded_psfnet_step(lens, tx, mesh, bs=8, spp=128, ks=11)
    eta, skip = lens.eta_arrays(0.589, True)
    state, loss = step(state, jax.random.PRNGKey(0), lens.stack, eta, skip,
                       lens_scalars(lens))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_sharded_dfdp_step_multichip():
    from sdirt_tpu.dfdp.train import create_dfdp_state
    from sdirt_tpu.parallel.mesh import make_mesh, shard_batch
    from sdirt_tpu.parallel.steps import make_sharded_dfdp_step

    mesh = make_mesh(n_data=8, n_rays=1)
    state, _ = create_dfdp_state(jax.random.PRNGKey(0), 1e-4, 10, (1, 6, 128, 128))
    step = make_sharded_dfdp_step(mesh)
    rng = np.random.default_rng(0)
    stack = shard_batch(jnp.asarray(rng.uniform(0, 1, (8, 6, 128, 128)).astype(np.float32)), mesh)
    depth = shard_batch(jnp.asarray(rng.uniform(0.25, 10, (8, 1, 128, 128)).astype(np.float32)), mesh)
    state, losses = step(state, stack, depth)
    assert np.isfinite(float(losses["total"]))


def test_package_exports_resolve():
    """Every lazy top-level export materializes and dir() lists them."""
    import sdirt_tpu

    for name in sdirt_tpu.__all__:
        assert getattr(sdirt_tpu, name) is not None, name
    assert "Lens" in dir(sdirt_tpu)
    with np.testing.assert_raises(AttributeError):
        sdirt_tpu.definitely_not_an_export


@pytest.mark.slow
def test_deblur_mode_train_step_and_infer():
    """'deblur' adds Mydeblur refinement: 3-term loss (2*est + fix + aif,
    reference basenet.py:63-68) and triple inference output."""
    from sdirt_tpu.dfdp.train import create_dfdp_state, dfdp_train_step, dfdp_infer

    state, _ = create_dfdp_state(jax.random.PRNGKey(0), 1e-4, 10,
                                 (1, 6, 128, 128), train_mode="deblur")
    assert "deblur_net" in state.params
    rng = np.random.default_rng(1)
    stack = jnp.asarray(rng.uniform(0, 1, (1, 6, 128, 128)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.25, 10, (1, 1, 128, 128)).astype(np.float32))
    aif = jnp.asarray(rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32))
    state, losses = dfdp_train_step(state, stack, depth, gt_aif=aif,
                                    train_mode="deblur")
    for k in ("depth_est", "depth_fix", "aif", "total"):
        assert np.isfinite(float(losses[k])), k
    np.testing.assert_allclose(
        float(losses["total"]),
        2 * float(losses["depth_est"]) + float(losses["depth_fix"])
        + float(losses["aif"]), rtol=1e-5)

    d, dfix, pred_aif = dfdp_infer(state.params, state.batch_stats, stack,
                                   train_mode="deblur")
    assert d.shape == dfix.shape == (1, 1, 128, 128)
    assert pred_aif.shape == (1, 3, 128, 128)
    assert np.isfinite(np.asarray(d)).all()


@pytest.mark.slow
def test_mlp_lum_and_mlpconv_shapes():
    from sdirt_tpu.psfnet.arch import build_psfnet

    net = build_psfnet("mlp+lum", 11)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
    psf, lum = net.apply(params, jnp.zeros((2, 3)))
    assert psf.shape == (2, 11, 11) and lum.shape == (2, 1)

    net = build_psfnet("mlpconv", 20)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
    out = net.apply(params, jnp.zeros((2, 3)))
    assert out.shape == (2, 20, 20)


@pytest.mark.slow
def test_mlpconv_trains_through_fit_psfnet():
    """'--model mlpconv' must be trainable end-to-end, not just
    constructible (VERDICT round 1): two tiny fit iterations at the
    production ks=21 through the same fit loop as the MLP."""
    from sdirt_tpu.psfnet.surrogate import PSFNetLens
    from sdirt_tpu.psfnet.train import fit_psfnet

    lens = PSFNetLens("/root/reference/lenses/rf50mm/lens_web.json",
                      model_name="mlpconv", sensor_res=(128, 192),
                      kernel_size=21)
    params = fit_psfnet(lens, iters=2, bs=2, spp=128, evaluate_every=2,
                        eval_bs=4, eval_spp=128, log_fn=lambda *_: None)
    pred = lens.net.apply(params, jnp.zeros((2, 3)))
    assert pred.shape == (2, 21, 21) and bool(jnp.isfinite(pred).all())


def test_siren_init_symmetric():
    """SIREN hidden weights must be symmetric in [-bound, bound]
    (ADVICE round 1: uniform(scale=s) samples [0, s) only)."""
    from sdirt_tpu.psfnet.arch import build_psfnet

    net = build_psfnet("siren", 11)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
    kernels = [np.asarray(v["kernel"])
               for k, v in params["params"].items() if "Dense" in k]
    hidden = kernels[1]     # a w0-scaled hidden layer
    bound = np.sqrt(6.0 / hidden.shape[0]) / 30.0
    assert hidden.min() < -0.5 * bound, "weights are not sign-symmetric"
    assert abs(hidden).max() <= bound + 1e-6


def test_profile_trace_writes(tmp_path):
    from sdirt_tpu.utils.logging import RaysPerSecond, profile_trace

    with profile_trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os

    assert any("plugins" in d or "perfetto" in " ".join(f)
               for d, _, f in os.walk(tmp_path)), "no profiler artifacts"

    ctr = RaysPerSecond()
    with ctr.measure(1000):
        pass
    assert ctr.rays == 1000 and ctr.rays_per_sec > 0


def test_host_rss_gb():
    """Leak-watchdog sensor: must report a sane resident size and must see
    a deliberate ~256 MB allocation."""
    from sdirt_tpu.utils.logging import host_rss_gb

    before = host_rss_gb()
    assert 0.01 < before < 200, before
    ballast = np.ones(256 * 2**20 // 8)   # 256 MB of float64
    after = host_rss_gb()
    assert after - before > 0.15, (before, after)
    del ballast
