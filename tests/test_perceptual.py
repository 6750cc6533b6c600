"""Property tests for the VGG-less perceptual proxy (dfdp/perceptual.py),
the LPIPS stand-in for /root/reference/deeplens/utils.py:40-52."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdirt_tpu.dfdp.perceptual import (batch_perceptual, gmsd, max_levels,
                                       ms_ssim, perceptual_distance)
from sdirt_tpu.utils.logging import batch_LPIPS


def _img(seed=0, h=96, w=128):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.2, 0.8, (1, 3, h, w)).astype(np.float32)
    # structured content (gradients + edges) so GMSD has signal
    yy, xx = np.mgrid[0:h, 0:w]
    base += 0.2 * np.sin(xx / 7.0)[None, None]
    base[:, :, h // 3: h // 2] += 0.15
    return jnp.asarray(np.clip(base, 0, 1))


def _blur(img, n):
    out = img
    for _ in range(n):
        p = jnp.pad(out, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
        out = 0.25 * (p[:, :, :-2, 1:-1] + p[:, :, 2:, 1:-1]
                      + p[:, :, 1:-1, :-2] + p[:, :, 1:-1, 2:])
    return out


def test_identity_is_zero():
    x = _img()
    lv = max_levels(x.shape[-2], x.shape[-1])
    assert float(ms_ssim(x, x, lv)) == pytest.approx(1.0, abs=1e-5)
    assert float(gmsd(x, x)) == pytest.approx(0.0, abs=1e-6)
    assert float(perceptual_distance(x, x, lv)) == pytest.approx(0.0, abs=1e-4)


def test_monotone_with_blur():
    x = _img()
    lv = max_levels(x.shape[-2], x.shape[-1])
    d = [float(perceptual_distance(x, _blur(x, n), lv)) for n in (0, 2, 6, 14)]
    assert d[0] < d[1] < d[2] < d[3]


def test_monotone_with_noise():
    x = _img()
    lv = max_levels(x.shape[-2], x.shape[-1])
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.normal(0, 1, x.shape).astype(np.float32))
    d = [float(perceptual_distance(x, jnp.clip(x + s * noise, 0, 1), lv))
         for s in (0.0, 0.02, 0.08, 0.2)]
    assert d[0] < d[1] < d[2] < d[3]


def test_noise_scores_worse_than_equal_mse_shift():
    """Perceptual, not pixelwise: structured error (uniform shift) should be
    much cheaper than white noise of identical MSE."""
    x = _img()
    lv = max_levels(x.shape[-2], x.shape[-1])
    rng = np.random.default_rng(2)
    noise = rng.normal(0, 1, x.shape).astype(np.float32)
    noise *= 0.05 / np.sqrt((noise**2).mean())
    shifted = x + 0.05
    noisy = x + jnp.asarray(noise)
    assert float(perceptual_distance(x, noisy, lv)) > \
        2 * float(perceptual_distance(x, shifted, lv))


def test_differentiable():
    x = _img(h=48, w=64)
    lv = max_levels(48, 64)
    g = jax.grad(lambda y: perceptual_distance(x, y, lv))(_blur(x, 3))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_batch_and_small_images():
    x = np.asarray(_img(h=32, w=40))
    assert max_levels(32, 40) == 2
    assert batch_perceptual(x, x) == pytest.approx(0.0, abs=1e-4)
    assert batch_perceptual(x[0], x[0]) == pytest.approx(0.0, abs=1e-4)  # CHW


def test_batch_lpips_falls_back_to_proxy():
    x = np.asarray(_img())
    d0 = batch_LPIPS(x, x)
    d1 = batch_LPIPS(x, np.asarray(_blur(jnp.asarray(x), 5)))
    assert d0 == pytest.approx(0.0, abs=1e-4)
    assert d1 > 1e-3
