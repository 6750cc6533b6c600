"""Fitted camera response (gamma/degamma) and the structured DP noise model.

Parity source: /root/reference/deeplens/psfnet.py:589-642. The response is a
two-branch reciprocal fit (dark/bright regimes blended by x/100) calibrated
on the Canon R6M2; PSF convolution runs in linear luminance between
degamma/gamma. The noise model modulates Gaussian noise with horizontally
opposite left/right ramps — the DP vignetting signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Fitted response constants (psfnet.py:591-593)
_A1, _B1, _C1 = 0.89129432, 0.27217316, -0.00246187
_A2, _B2, _C2 = 5.94018909e-01, 1.20060450e01, -5.24983855e-03


def fit_degamma(x):
    """255-scale pixel value -> linear luminance (psfnet.py:589-598)."""
    l1 = 1.0 / (1.0 / (_A1 * x + _B1) + _C1)
    l2 = 1.0 / (1.0 / (_A2 * x + _B2) + _C2)
    ratio = jnp.minimum(x / 100.0, 1.0)
    return l2 * ratio + l1 * (1.0 - ratio)


def degamma(img):
    """[0,1] image -> linear luminance (psfnet.py:600-603)."""
    return fit_degamma(img * 255.0)


def fit_gamma(lum):
    """linear luminance -> 255-scale pixel value (psfnet.py:605-615)."""
    x1 = (1.0 / (1.0 / (lum + 1e-9) - _C1) - _B1) / _A1
    x2 = (1.0 / (1.0 / (lum + 1e-9) - _C2) - _B2) / _A2
    xmid = (x1 + x2) / 2.0
    ratio = jnp.minimum(xmid / 100.0, 1.0)
    return x2 * ratio + x1 * (1.0 - ratio)


def gamma(lum):
    """linear luminance -> [0,1] image (psfnet.py:617-620)."""
    return fit_gamma(lum) / 255.0


def dp_noise(key, render, shape):
    """Horizontally-weighted sensor noise for a DP pair (psfnet.py:629-642).

    render: [N, 2C, H, W] (left channels then right channels).
    """
    n, c2, h, w = shape
    c = c2 // 2
    k1, k2, k3, k4 = jax.random.split(key, 4)
    noise_range = 0.05 * jax.random.uniform(k1, ())
    noise_map = jax.random.normal(k2, render.shape) * noise_range
    r1 = jax.random.uniform(k3, ()) / 2.0
    r2 = jax.random.uniform(k4, ()) / 2.0 + 0.5
    ramp = r1 + (r2 - r1) * jnp.arange(w, dtype=render.dtype) / (w - 1)
    weight_l = jnp.broadcast_to(ramp, (n, c, h, w))
    weight_r = jnp.flip(weight_l, axis=-1)
    weight = jnp.concatenate([weight_l, weight_r], axis=1)
    return render + noise_map * weight
