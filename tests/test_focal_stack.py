"""Multi-focus stack: FocalStackLens render, Basenet 6V-channel input, and
the factory's stack config path. (The reference scaffolds n_stack but pins
it to 1 everywhere — 2_dfdp_net.py:164,210 — so these are extension tests.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import RF50


@pytest.fixture(scope="module")
def stack_lens():
    from sdirt_tpu.psfnet.stack import FocalStackLens
    from sdirt_tpu.psfnet.surrogate import PSFNetLens

    near = PSFNetLens(RF50, kernel_size=7, sensor_res=(32, 48),
                      model_name="mlp@64")
    far = PSFNetLens(RF50, kernel_size=7, sensor_res=(32, 48),
                     model_name="mlp@64", seed=1)
    far.refocus(-5000.0 + far.d_sensor)
    far.set_focus_prior(-5000.0)
    return FocalStackLens([near, far])


def test_focus_prior_recenters(stack_lens):
    near, far = stack_lens.lenses
    # the 5 m lens's focus prior must sit around z(-5000), not z(-1000)
    z5 = float(np.mean(far.foc_z_arr))
    z1 = float(np.mean(near.foc_z_arr))
    expect5 = (-5000.0 + far.d_sensor - far.d_min) / (far.d_max - far.d_min)
    assert abs(z5 - expect5) < 5e-3, (z5, expect5)
    assert z5 > z1  # farther focus -> larger normalized z


def test_stack_render_layout(stack_lens):
    """[N, 6V, H, W] with view v at channels [6v, 6v+6), each matching that
    sub-lens's own render bit-exactly (same per-view RNG fold)."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 48)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0.4, 8.0, (1, 1, 32, 48)).astype(np.float32)) * -1e3
    foc = jnp.float32([-1000.0])
    key = jax.random.PRNGKey(5)
    out = np.asarray(stack_lens.render(img, depth, foc, key=key))
    assert out.shape == (1, 12, 32, 48)
    keys = jax.random.split(key, 2)
    for v, (lens, k) in enumerate(zip(stack_lens.lenses, keys)):
        solo = np.asarray(lens.render(img, depth, foc, key=k))
        np.testing.assert_array_equal(out[:, 6 * v:6 * v + 6], solo)
    # the two views must actually differ (different focus geometry + params)
    assert np.abs(out[:, :6] - out[:, 6:]).max() > 1e-4


def test_basenet_two_view_forward_and_step():
    """A 12-channel Basenet initializes, trains one step, and the loss is
    finite; a 6-channel net keeps its original parameter shapes."""
    from sdirt_tpu.dfdp.train import create_dfdp_state, dfdp_train_step

    h, w = 128, 192
    state2, _ = create_dfdp_state(jax.random.PRNGKey(0), 1e-4, 10,
                                  (1, 12, h, w))
    rng = np.random.default_rng(1)
    stack = jnp.asarray(rng.uniform(0, 1, (1, 12, h, w)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0.3, 8.0, (1, 1, h, w)).astype(np.float32))
    state2, losses = dfdp_train_step(state2, stack, gt)
    assert np.isfinite(float(losses["total"]))

    state1, _ = create_dfdp_state(jax.random.PRNGKey(0), 1e-4, 10,
                                  (1, 6, h, w))
    k1 = jax.tree.leaves(state1.params)[0]
    assert k1.ndim >= 1  # original single-view net still constructs


@pytest.mark.slow
def test_2focus_train_stage_smoke(tmp_path, monkeypatch):
    """The real --stage train loop on the shipped 2-focus config at smoke
    scale: factory builds the FocalStackLens (second surrogate ckpt absent
    -> untrained net, fine for the smoke), validate renders a 12-channel
    stack, the 12-ch net trains one epoch, and the real-capture eval is
    skipped with the multi-focus log note."""
    import logging
    import os

    import apps.dfdp_net as app
    from apps.dfdp_net import config, train

    args = config("configs/dfdp_f4_2focus_256.yml")
    args.update(
        res=(128, 192), bs=2, epochs=1, synthetic_len=2, synthetic_val_len=1,
        train_mode="dfdp", save_images=False, save_ckpt=False,
        results_dir=str(tmp_path / "results"),
        ckpt_out=str(tmp_path / "best"),
    )
    args.pop("train_state_dir", None)
    for cfg in (args["train"], args["test"]):
        for sub in cfg["stack"]:
            sub["psfnet_model"] = "mlp@64"   # smoke-size surrogates
            sub["psfnet_path"] = None
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
    assert any("multi-focus stack net: real-capture eval skipped" in m
               for m in records), records[:10]
    assert any(m.startswith("Epoch 0: train loss") for m in records)
    assert os.path.isdir(tmp_path / "best")   # exported a 12-ch checkpoint


def test_factory_builds_stack(tmp_path):
    from sdirt_tpu.dfdp.factory import get_lens
    from sdirt_tpu.psfnet.stack import FocalStackLens

    cfg = {"lens": RF50, "dataset": "Synthetic",
           "stack": [{"psfnet_path": None},
                     {"psfnet_path": None, "focus_mm": -5000.0}],
           "psfnet_model": "mlp@64"}
    args = {"ks": 7, "res": (32, 48), "train": dict(cfg), "test": dict(cfg)}
    train_lens, test_lens = get_lens(args)
    assert isinstance(train_lens, FocalStackLens)
    assert train_lens.n_views == 2
    # the second view reproduced the fit-time 5 m geometry
    assert train_lens.lenses[1].d_sensor != train_lens.lenses[0].d_sensor
