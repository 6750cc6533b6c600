"""PSF surrogate: architecture parity, torch checkpoint port, training
convergence, pred mirror property, baselines, render pipeline shape/behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import RF50


@pytest.fixture(scope="module")
def psflens():
    from sdirt_tpu.psfnet.surrogate import PSFNetLens

    return PSFNetLens(RF50, kernel_size=21, sensor_res=(512, 768))


def test_quirks(psflens):
    # d_sensor override without post_computation (reference psfnet.py:42-49)
    assert psflens.d_sensor == 62.25
    assert psflens.hfov == pytest.approx(0.40960, abs=1e-4)  # JSON-derived
    np.testing.assert_allclose(psflens.foc_d_arr,
                               np.array([-999.9, -1000, -1000.1]) + 62.25)


def test_mlp_shapes(psflens):
    out = psflens.net.apply(psflens.params, jnp.zeros((5, 3)))
    assert out.shape == (5, 441)
    assert float(out.min()) >= 0.0   # ReLU output head

    n_params = sum(x.size for x in jax.tree.leaves(psflens.params))
    # 3->128->512 + 8x512x512 + 512->441 (reference psfnet_arch.py:36-49)
    expected = (3 * 128 + 128) + (128 * 512 + 512) + 8 * (512 * 512 + 512) + (512 * 441 + 441)
    assert n_params == expected


def test_torch_checkpoint_port(tmp_path, psflens):
    """Save a reference-shaped torch MLP state_dict and port it; outputs of
    the two frameworks must agree."""
    import torch

    layers = []
    dims = [3, 128, 512] + [512] * 8 + [441]
    for i in range(len(dims) - 1):
        layers += [torch.nn.Linear(dims[i], dims[i + 1]), torch.nn.ReLU()]
    net = torch.nn.Sequential(*layers)
    torch.manual_seed(0)
    for m in net:
        if isinstance(m, torch.nn.Linear):
            torch.nn.init.kaiming_uniform_(m.weight)
            torch.nn.init.normal_(m.bias, 0, 0.1)
    sd = {f"net.{k}": v for k, v in net.state_dict().items()}
    path = str(tmp_path / "ref.pkl")
    torch.save(sd, path)

    from sdirt_tpu.psfnet.arch import load_torch_psfnet

    params = load_torch_psfnet(psflens.params, path)
    x = np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32)
    # default matmul precision is bf16-pass (the reference itself runs fp16
    # AMP); pin full f32 for the bit-level port comparison
    with jax.default_matmul_precision("highest"):
        out_jax = np.asarray(psflens.net.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        out_torch = net(torch.tensor(x)).numpy()
    scale = np.abs(out_torch).max() + 1e-9
    assert np.abs(out_jax - out_torch).max() / scale < 1e-4


def test_pred_mirror_and_norm(psflens):
    inp = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (4, 3)).astype(np.float32))
    psf = np.asarray(psflens.pred(inp))
    assert psf.shape == (4, 2, 21, 21)
    np.testing.assert_allclose(psf.sum((-1, -2)), 1.0, atol=1e-3)
    # mirror property: right view of x == flipped left view of -x
    inp_m = np.asarray(inp) * np.array([-1, 1, 1], np.float32)
    psf_m = np.asarray(psflens.pred(jnp.asarray(inp_m)))
    np.testing.assert_allclose(psf[:, 1], psf_m[:, 0, :, ::-1], atol=1e-5)


@pytest.mark.slow
def test_train_step_decreases_loss(psflens):
    from sdirt_tpu.dp.psf import lens_scalars
    from sdirt_tpu.psfnet.train import create_train_state, make_train_step

    state, tx = create_train_state(psflens, 1e-4, 100)
    step = make_train_step(psflens, tx, bs=4, spp=256, ks=21)
    eta, skip = psflens.eta_arrays(0.589, True)
    sc = lens_scalars(psflens)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, loss = step(state, sub, psflens.stack, eta, skip, sc)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_baselines_shapes_and_norm(psflens):
    from sdirt_tpu.psfnet import baselines as bl

    mx, my = np.meshgrid(np.linspace(-1, 1, 3), np.linspace(-1, 1, 2),
                         indexing="ij")
    inp = jnp.asarray(
        np.stack([mx, my, np.full((3, 2), 0.04)], axis=-1).astype(np.float32))[None]
    for fn in (bl.pred_coc, bl.pred_dpdnet, bl.pred_modeling, bl.pred_learn2reduce):
        psf = np.asarray(fn(psflens, inp))
        assert psf.shape == (1, 3, 2, 2, 21, 21), fn.__name__
        np.testing.assert_allclose(psf.sum((-1, -2)), 1.0, atol=1e-2,
                                   err_msg=fn.__name__)
        assert np.isfinite(psf).all(), fn.__name__


@pytest.mark.slow
def test_render_shapes_and_noise(psflens):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 32, 48)).astype(np.float32)
    depth = np.full((1, 1, 32, 48), -1500.0, np.float32)
    out = np.asarray(psflens.render(img, depth, np.array([-1000.0], np.float32)))
    assert out.shape == (1, 6, 32, 48)
    assert out.min() >= 0 and out.max() <= 1
    out_t = np.asarray(psflens.render(img, depth, np.array([-1000.0], np.float32),
                                      train=True, key=jax.random.PRNGKey(5)))
    assert not np.allclose(out, out_t)   # noise applied in train mode


def test_gamma_roundtrip():
    from sdirt_tpu.render.camera import degamma, gamma

    x = jnp.linspace(0.01, 1.0, 64)
    rt = np.asarray(gamma(degamma(x)))
    np.testing.assert_allclose(rt, np.asarray(x), atol=2e-2)


def test_thinlens():
    from sdirt_tpu.psfnet.thinlens import ThinLens

    tl = ThinLens(foc_len=50.0, fnum=4.0, kernel_size=11,
                  sensor_size=[24.0, 36.0], sensor_res=(32, 48))
    img = np.random.default_rng(0).uniform(0, 1, (1, 3, 32, 48)).astype(np.float32)
    depth = np.full((1, 1, 32, 48), 1500.0, np.float32)
    out = np.asarray(tl.render(img, depth, np.array([1000.0], np.float32)))
    assert out.shape == (1, 6, 32, 48)
    assert np.isfinite(out).all()
    # L == R for the symmetric thin-lens model
    np.testing.assert_allclose(out[:, :3], out[:, 3:], atol=1e-5)
