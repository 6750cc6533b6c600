"""VGG-less perceptual image distance (pure JAX, differentiable).

The reference scores rendered-vs-real DP images with LPIPS
(/root/reference/deeplens/utils.py:40-52), which needs pretrained VGG weights
that cannot be fetched in this environment. This module provides the
weight-free stand-in: MS-SSIM (Wang et al., "Multi-scale structural
similarity for image quality assessment", 2003) combined with GMSD (Xue et
al., "Gradient Magnitude Similarity Deviation", 2014) — two classical
full-reference metrics with strong perceptual correlation and no learned
parameters. Everything is jnp and differentiable, so `perceptual_distance`
can double as a training loss.

Conventions: images are [N, C, H, W] float in [0, 1] (the reference feeds
LPIPS the same layout). Distance is 0 for identical images and grows with
perceptual degradation; absolute values are NOT on the LPIPS scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Standard MS-SSIM per-scale weights (Wang 2003, table 1).
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    w = np.outer(g, g)
    return jnp.asarray((w / w.sum()).astype(np.float32))


def _filter2(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise valid-mode 2-D correlation of [N,C,H,W] with one window."""
    c = img.shape[1]
    k = jnp.broadcast_to(win[None, None], (c, 1, *win.shape))
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _ssim_components(x, y, win, c1, c2):
    mu_x = _filter2(x, win)
    mu_y = _filter2(y, win)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _filter2(x * x, win) - mu_xx
    sigma_y = _filter2(y * y, win) - mu_yy
    sigma_xy = _filter2(x * y, win) - mu_xy
    lum = (2 * mu_xy + c1) / (mu_xx + mu_yy + c1)
    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    return lum, cs


def _downsample2(img):
    """2x average-pool with edge-safe padding to even size."""
    n, c, h, w = img.shape
    img = img[:, :, : h - h % 2, : w - w % 2]
    return 0.25 * (img[:, :, ::2, ::2] + img[:, :, 1::2, ::2]
                   + img[:, :, ::2, 1::2] + img[:, :, 1::2, 1::2])


@partial(jax.jit, static_argnames=("levels",))
def ms_ssim(img: jnp.ndarray, img_clean: jnp.ndarray,
            levels: int = 5) -> jnp.ndarray:
    """Multi-scale SSIM over `levels` dyadic scales; scalar in (0, 1]."""
    win = _gaussian_window()
    c1, c2 = 0.01**2, 0.03**2
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = weights / weights.sum()
    x, y = img.astype(jnp.float32), img_clean.astype(jnp.float32)
    vals = []
    for lvl in range(levels):
        lum, cs = _ssim_components(x, y, win, c1, c2)
        vals.append(jnp.mean(lum if lvl == levels - 1 else cs))
        if lvl < levels - 1:
            x, y = _downsample2(x), _downsample2(y)
    # relu-clamp keeps the fractional-power geometric mean real-valued for
    # pathological inputs (negative cs on adversarial pairs)
    vals = jnp.maximum(jnp.stack(vals), 1e-6)
    return jnp.prod(vals ** weights)


_PREWITT = np.array([[1, 0, -1], [1, 0, -1], [1, 0, -1]], np.float32) / 3.0


def _grad_mag(img: jnp.ndarray) -> jnp.ndarray:
    """Prewitt gradient magnitude of a [N,1,H,W] luminance image."""
    kx = jnp.asarray(_PREWITT)[None, None]
    ky = jnp.asarray(_PREWITT.T)[None, None]
    conv = lambda k: jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    gx, gy = conv(kx), conv(ky)
    return jnp.sqrt(gx * gx + gy * gy + 1e-12)


def _luminance(img: jnp.ndarray) -> jnp.ndarray:
    if img.shape[1] == 3:
        w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
        return jnp.einsum("nchw,c->nhw", img, w)[:, None]
    return img.mean(axis=1, keepdims=True)


@jax.jit
def gmsd(img: jnp.ndarray, img_clean: jnp.ndarray) -> jnp.ndarray:
    """Gradient-magnitude-similarity deviation; 0 for identical images."""
    c = 0.0026  # Xue 2014's c=170 rescaled from [0,255] to [0,1] intensities
    g1 = _grad_mag(_luminance(img.astype(jnp.float32)))
    g2 = _grad_mag(_luminance(img_clean.astype(jnp.float32)))
    gms = (2 * g1 * g2 + c) / (g1 * g1 + g2 * g2 + c)
    return jnp.std(gms)


@partial(jax.jit, static_argnames=("levels",))
def perceptual_distance(img: jnp.ndarray, img_clean: jnp.ndarray,
                        levels: int = 5) -> jnp.ndarray:
    """Scalar perceptual distance: (1 - MS-SSIM) + GMSD.

    Weight-free LPIPS stand-in; 0 iff images match, differentiable in both
    arguments, jit/vmap/grad-compatible.
    """
    return (1.0 - ms_ssim(img, img_clean, levels)) + gmsd(img, img_clean)


def max_levels(h: int, w: int) -> int:
    """Largest dyadic scale count keeping the 11x11 window valid-mode."""
    lv = 1
    while lv < 5 and min(h, w) // 2**lv >= 11:
        lv += 1
    return lv


def batch_perceptual(img, img_clean) -> float:
    """Host-facing batch mean (reference batch_LPIPS interface shape:
    deeplens/utils.py:40-52 returns `dist.mean().item()`)."""
    img = jnp.asarray(np.asarray(img), jnp.float32)
    img_clean = jnp.asarray(np.asarray(img_clean), jnp.float32)
    if img.ndim == 3:
        img, img_clean = img[None], img_clean[None]
    lv = max_levels(img.shape[-2], img.shape[-1])
    return float(perceptual_distance(img, img_clean, lv))
