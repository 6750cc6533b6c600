"""Parity tests for the fused tap-major render path (render/mlp_fast.py +
render/fused_conv_pallas.py) against the round-1 scan path.

The scan path itself is golden-tested against the reference
(test_psf_pipeline.py), so variant-vs-variant parity here extends that chain.
Pallas runs in interpret mode on the CPU test rig (auto-detected).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdirt_tpu.psfnet.arch import build_psfnet
from sdirt_tpu.psfnet.surrogate import pred_psf
from sdirt_tpu.render.mlp_fast import (mlp_psf_pixelmajor, mlp_psf_tapmajor,
                                       quantize_mlp)
from sdirt_tpu.render.fused_conv_pallas import fused_dp_conv_tapmajor
from sdirt_tpu.render.perpixel import local_dp_conv

KS = 7
N, H, W, C = 2, 16, 24, 3


@pytest.fixture(scope="module")
def setup():
    net = build_psfnet("mlp", KS)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    rng = np.random.default_rng(1)
    o = rng.uniform(-1, 1, (N, H, W, 3)).astype(np.float32)
    o[..., 2] = rng.uniform(0, 1, (N, H, W))
    img = jnp.asarray(rng.uniform(0, 1, (N, H, W, C)).astype(np.float32))
    return net, params, jnp.asarray(o), img


def _scan_path(net, params, o, img):
    p = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)
    fn = lambda pp, q: net.apply(pp, q.astype(jnp.bfloat16)).astype(jnp.float32)
    psf = pred_psf(fn, p, o, KS)
    return psf, local_dp_conv(img, psf, KS)


def test_onegemm_pixelmajor_matches_pred_psf(setup):
    net, params, o, img = setup
    psf_ref, _ = _scan_path(net, params, o, img)
    psf = mlp_psf_pixelmajor(params, o, KS)
    assert float(jnp.abs(psf - psf_ref).max()) < 5e-3   # bf16 rounding band


def test_fused_conv_matches_scan(setup):
    net, params, o, img = setup
    _, (rl_ref, rr_ref) = _scan_path(net, params, o, img)
    psf_tm = mlp_psf_tapmajor(params, o, KS)
    rl, rr = fused_dp_conv_tapmajor(img, psf_tm, KS, th=8)
    assert float(jnp.abs(rl - rl_ref).max()) < 5e-3
    assert float(jnp.abs(rr - rr_ref).max()) < 5e-3


def test_fused_conv_batch_order(setup):
    """Sample n of a batched render equals rendering sample n alone —
    guards the (tap, sample, view, pixel) GEMM row interleaving."""
    net, params, o, img = setup
    psf_tm = mlp_psf_tapmajor(params, o, KS)
    rl, rr = fused_dp_conv_tapmajor(img, psf_tm, KS, th=8)
    psf1 = mlp_psf_tapmajor(params, o[1:2], KS)
    rl1, rr1 = fused_dp_conv_tapmajor(img[1:2], psf1, KS, th=8)
    np.testing.assert_allclose(np.asarray(rl[1:2]), np.asarray(rl1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rr[1:2]), np.asarray(rr1),
                               rtol=0, atol=1e-6)


@pytest.mark.slow
def test_int8_trunk_close_to_bf16(setup):
    net, params, o, img = setup
    psf = mlp_psf_pixelmajor(params, o, KS)
    qd = quantize_mlp(params)
    psf_q = mlp_psf_pixelmajor(params, o, KS, quant=qd)
    # scale-free gate: on the trained rf50mm ckpt rel-L1 is 4.9e-3 (mean
    # |d| 1.1e-5, ~5% of the surrogate's own fit error); the random-init
    # net used here lands ~1.5e-2
    rel = float(jnp.abs(psf_q - psf).sum() / jnp.abs(psf).sum())
    assert rel < 3e-2


@pytest.mark.slow
def test_render_dp_variants_agree(setup):
    from sdirt_tpu.render.pipeline import render_dp

    net, params, o, img = setup
    img_nchw = img.transpose(0, 3, 1, 2)
    depth = -(np.random.default_rng(2)
              .uniform(100, 1000, (N, 1, H, W)).astype(np.float32))
    kw = dict(d_sensor=62.25, d_min=-20000.0, d_max=-200.0, ks=KS)
    out_scan = render_dp(net.apply, params, img_nchw, depth, [-1000.0],
                         variant="scan", **kw)
    out_fused = render_dp(net.apply, params, img_nchw, depth, [-1000.0],
                          variant="fused", **kw)
    out_int8 = render_dp(net.apply, params, img_nchw, depth, [-1000.0],
                         variant="fused_int8", **kw)
    assert float(jnp.abs(out_fused - out_scan).max()) < 1e-2
    assert float(jnp.abs(out_int8 - out_scan).max()) < 3e-2


@pytest.mark.slow
def test_int8_static_scale_pack_shapes(setup):
    """quantize_mlp's static-scale pack: pre-folded wse/be reproduce the
    raw dequant algebra (acc + 128*colsum(wq)) * (sa*ws) + b exactly."""
    net, params, o, img = setup
    from sdirt_tpu.render.mlp_fast import dense_layers

    qd = quantize_mlp(params)
    layers = dense_layers(params)
    n_trunk = len(qd["wq"])
    assert n_trunk == len(layers) - 3
    for i in range(n_trunk):
        wq = np.asarray(qd["wq"][i], np.float32)
        sc = np.asarray(qd["sc"][i])
        b = np.asarray(layers[2 + i][1])
        np.testing.assert_allclose(
            sc[2], b + 128.0 * wq.sum(0) * sc[1], rtol=1e-5, atol=1e-6)
