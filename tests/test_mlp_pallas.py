"""Parity of the fused Pallas PSF-MLP megakernel vs the flax/XLA chain.

Runs in Pallas interpret mode on CPU (the TPU Mosaic compile is exercised in
the perf harness, not CI). Numerics: the kernel uses bf16 operands with f32
MXU accumulation, the same contract as the render's mlp_bf16 default, so the
reference here is the bf16-cast flax apply.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    import sdirt_tpu.render.mlp_pallas as mp

    orig = pl.pallas_call
    monkeypatch.setattr(mp.pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    return mp


def test_fused_mlp_matches_flax_bf16(interpret_pallas):
    mp = interpret_pallas
    from sdirt_tpu.psfnet.arch import build_psfnet
    from sdirt_tpu.psfnet.surrogate import pred_psf

    model = build_psfnet("mlp", 21)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    inp = jnp.asarray(np.random.default_rng(0)
                      .uniform(-1, 1, (2, 6, 5, 3)).astype(np.float32))

    p16 = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)
    ref = pred_psf(lambda p, x: model.apply(p, x.astype(jnp.bfloat16))
                   .astype(jnp.float32), p16, inp, 21)
    ours = mp.pred_psf_fused(params, inp, 21, tile=64)

    assert ours.shape == ref.shape == (2, 6, 5, 2, 21, 21)
    # same bf16 matmuls, different accumulation order + bf16 output staging
    assert float(jnp.abs(ref - ours).max()) < 5e-3
    # sum-normalization per view must hold exactly
    np.testing.assert_allclose(np.asarray(ours.sum((-1, -2))), 1.0, atol=1e-3)


def test_fused_mlp_pads_ragged_batch(interpret_pallas):
    mp = interpret_pallas
    from sdirt_tpu.psfnet.arch import build_psfnet

    model = build_psfnet("mlp", 11)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)))
    layers = mp.dense_layers_from_params(params)
    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(-1, 1, (37, 3)).astype(np.float32))
    out = mp.fused_mlp(layers, x, tile=16)     # 37 = 2*16 + 5 -> padded
    ref = model.apply(jax.tree.map(lambda v: v.astype(jnp.bfloat16), params),
                      x.astype(jnp.bfloat16)).astype(jnp.float32)
    assert out.shape == (37, 121)
    # kernel adds bias in f32 before the bf16 cast, flax in bf16 after it:
    # agreement is to bf16 rounding of the activations, i.e. ~1% relative
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(out - ref).max()) < 2e-2 * max(scale, 1.0)
