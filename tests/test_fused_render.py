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


def test_onekernel_mlp_matches_tapmajor(setup):
    """The single fused 11-Dense Pallas kernel (mlp_psf_tapmajor_fused)
    reproduces the XLA one-GEMM chain, both bf16 and int8 trunks."""
    from sdirt_tpu.render.mlp_fast import mlp_psf_tapmajor_fused

    net, params, o, img = setup
    ref = mlp_psf_tapmajor(params, o, KS).astype(jnp.float32)
    f16 = mlp_psf_tapmajor_fused(params, o, KS,
                                 int8_trunk=False).astype(jnp.float32)
    assert float(jnp.abs(f16 - ref).max()) < 5e-2          # bf16 rounding
    qd = quantize_mlp(params)
    ref8 = mlp_psf_tapmajor(params, o, KS, quant=qd).astype(jnp.float32)
    f8 = mlp_psf_tapmajor_fused(params, o, KS,
                                int8_trunk=True).astype(jnp.float32)
    rel = float(jnp.abs(f8 - ref8).sum() / (jnp.abs(ref8).sum() + 1e-9))
    assert rel < 3e-2


def test_render_dp_onekernel_agrees(setup):
    from sdirt_tpu.render.pipeline import render_dp

    net, params, o, img = setup
    img_nchw = img.transpose(0, 3, 1, 2)
    depth = -(np.random.default_rng(2)
              .uniform(100, 1000, (N, 1, H, W)).astype(np.float32))
    kw = dict(d_sensor=62.25, d_min=-20000.0, d_max=-200.0, ks=KS)
    out_scan = render_dp(net.apply, params, img_nchw, depth, [-1000.0],
                         variant="scan", **kw)
    out_1k = render_dp(net.apply, params, img_nchw, depth, [-1000.0],
                       variant="onekernel", **kw)
    out_1k8 = render_dp(net.apply, params, img_nchw, depth, [-1000.0],
                        variant="onekernel_int8", **kw)
    assert float(jnp.abs(out_1k - out_scan).max()) < 1e-2
    assert float(jnp.abs(out_1k8 - out_scan).max()) < 3e-2
