"""Dual-pixel PSF accumulation (the paper's core integrator).

Physics (reference /root/reference/deeplens/monte_carlo.py:135-372): each
traced ray lands on the sensor with an incidence slope x_tan; a microlens of
height h / focal length f sits over a split photodiode whose halves are
separated by a gap half-width w inside a pixel of active radius r. The ray's
energy splits between the left/right sub-pixels in closed form — circular
segment areas of the microlens-refracted footprint — and the ray is
bilinearly deposited onto a ks x ks PSF grid.

TPU-first redesign: the reference serializes a Python loop over points and
uses `index_put_(accumulate=True)` scatter-adds. Here the bilinear deposit is
factored into row/column one-hot weight matrices, so the whole accumulation
becomes one batched matmul per chunk of rays — the MXU does the scatter.
A scatter-based reference path is kept for cross-checking.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class DPParams:
    """Microlens / dual-pixel geometry (reference monte_carlo.py:157-164)."""

    h: float = 0.78      # microlens height above the photodiode plane
    f: float = 1.44      # microlens focal length
    w: float = 0.3       # half-width of the sub-pixel gap
    r: float = 0.5       # active pixel radius (units of pixel pitch)
    direct: str = "l"    # which sub-pixel is "left" in the output ordering


def _seg(u):
    """Antiderivative of 2 sin^2: integral of 2*sqrt(r^2-x^2) with x=r*cos(u)
    is r^2 (u - sin(2u)/2)."""
    return u - 0.5 * jnp.sin(2.0 * u)


def dp_split_weights(x_tan: jnp.ndarray, p: DPParams = DPParams()):
    """Closed-form left/right energy split per ray from its incidence slope.

    Returns (w_l, w_r) with the same shape as x_tan. Two regimes depending on
    whether the active radius covers the full pixel (reference
    monte_carlo.py:135-241 for r<=0.5, :242-372 for r>=0.5).
    """
    h, f, w, r = p.h, p.f, p.w, p.r

    if r <= 0.5:
        # Footprint edges after refraction by the microlens
        xr = jnp.clip(w - (f * x_tan - w) * h / (f - h), -r, r)
        xm = jnp.clip(-(f * x_tan) * h / (f - h), -r, r)
        xl = jnp.clip(-w - (f * x_tan + w) * h / (f - h), -r, r)
        ur, um, ul = jnp.arccos(xr / r), jnp.arccos(xm / r), jnp.arccos(xl / r)
        sr_ml = r * r * (_seg(um) - _seg(ur))
        sl_ml = r * r * (_seg(ul) - _seg(um))

        # Margin region (rays missing the microlens, straight projection)
        xr2 = jnp.clip(w - h * x_tan, -0.5, 0.5)
        xm2 = jnp.clip(-h * x_tan, -0.5, 0.5)
        xl2 = jnp.clip(-w - h * x_tan, -0.5, 0.5)
        uri = jnp.arccos(jnp.clip(xr2, -r, r) / r)
        umi = jnp.arccos(jnp.clip(xm2, -r, r) / r)
        uli = jnp.arccos(jnp.clip(xl2, -r, r) / r)
        sr_mg = (xr2 - xm2) - r * r * (_seg(umi) - _seg(uri))
        sl_mg = (xm2 - xl2) - r * r * (_seg(uli) - _seg(umi))
    else:
        # r > 0.5: the circle sticks out of the pixel; subtract the part of
        # each circular segment beyond |y| = 0.5 (chord at u in [tr, tl])
        tr = jnp.arcsin(0.5 / r)
        tl = jnp.pi - tr

        def seg_minus_overflow(xa, xb):
            ua, ub = jnp.arccos(xa / r), jnp.arccos(xb / r)
            s = r * r * (_seg(ub) - _seg(ua))
            ua_e = jnp.clip(ua, tr, tl)
            ub_e = jnp.clip(ub, tr, tl)
            xa_e, xb_e = jnp.cos(ua_e) * r, jnp.cos(ub_e) * r
            s_e = r * r * (_seg(ub_e) - _seg(ua_e)) - (xa_e - xb_e)
            return s - s_e

        xr = jnp.clip(w - (f * x_tan - w) * h / (f - h), -0.5, 0.5)
        xm = jnp.clip(-(f * x_tan) * h / (f - h), -0.5, 0.5)
        xl = jnp.clip(-w - (f * x_tan + w) * h / (f - h), -0.5, 0.5)
        sr_ml = seg_minus_overflow(xr, xm)
        sl_ml = seg_minus_overflow(xm, xl)

        xr2 = jnp.clip(w - h * x_tan, -0.5, 0.5)
        xm2 = jnp.clip(-h * x_tan, -0.5, 0.5)
        xl2 = jnp.clip(-w - h * x_tan, -0.5, 0.5)
        sr_mg = (xr2 - xm2) - seg_minus_overflow(xr2, xm2)
        sl_mg = (xm2 - xl2) - seg_minus_overflow(xm2, xl2)

    w_r = sr_ml + sr_mg
    w_l = sl_ml + sl_mg
    if p.direct == "l":
        return w_l, w_r
    return w_r, w_l


def _bilinear_onehots(points, ks: int, ps: float):
    """Row/column bilinear one-hot factors for each ray.

    points: [..., 2] PSF-centered sensor offsets. Follows the reference grid
    convention (monte_carlo.py:208-222): row index from y, column from x,
    normalized by the (ks-1)-pixel span.
    """
    half = (ks / 2 - 0.5) * ps
    # row_f = (y - y_max)/(y_min - y_max) * (ks-1);  y_max = half, y_min = -half
    row_f = (half - points[..., 1]) / (2 * half) * (ks - 1)
    col_f = (points[..., 0] + half) / (2 * half) * (ks - 1)
    iy = jnp.floor(row_f)
    ix = jnp.floor(col_f)
    wy = row_f - iy
    wx = col_f - ix
    kk = jnp.arange(ks, dtype=points.dtype)
    shape = (*points.shape[:-1], 1)
    ohy = (kk == iy.reshape(shape)) * (1 - wy.reshape(shape)) + (kk == iy.reshape(shape) + 1) * wy.reshape(shape)
    ohx = (kk == ix.reshape(shape)) * (1 - wx.reshape(shape)) + (kk == ix.reshape(shape) + 1) * wx.reshape(shape)
    return ohy, ohx


@partial(jax.jit, static_argnames=("ks", "chunk"))
def splat_matmul(points, weights, ks: int, ps, chunk: int = 4096):
    """Accumulate rays into PSF grids with batched matmuls.

    points:  [spp, N, 2] PSF-centered offsets (already masked/zeroed)
    weights: [V, spp, N] per-ray deposit weights (V = #views, e.g. L/R)
    Returns [V, N, ks, ks].

    Bilinear deposit is separable — outer(row_weights, col_weights) — so
    summing over rays is exactly psf[n] = (w*ohy)^T @ ohx, a matmul with the
    ray axis as the contraction. Chunked over rays to bound the one-hot
    working set.
    """
    spp, n, _ = points.shape
    v = weights.shape[0]
    pad = (-spp) % chunk
    if pad:
        points = jnp.pad(points, ((0, pad), (0, 0), (0, 0)))
        weights = jnp.pad(weights, ((0, 0), (0, pad), (0, 0)))
    n_chunks = points.shape[0] // chunk
    points = points.reshape(n_chunks, chunk, n, 2)
    weights = weights.reshape(v, n_chunks, chunk, n).transpose(1, 0, 2, 3)

    def body(acc, inp):
        pts, wts = inp
        ohy, ohx = _bilinear_onehots(pts, ks, ps)
        # [V, chunk, N] x [chunk, N, ks] x [chunk, N, ks] -> [V, N, ks, ks]
        # HIGHEST precision: default TPU matmul runs bf16 passes, whose ~1e-3
        # relative error would eat the PSF L1<=1e-3 parity budget
        contrib = jnp.einsum("vsn,snk,snl->vnkl", wts, ohy, ohx,
                             precision=lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        return acc + contrib, None

    init = jnp.zeros((v, n, ks, ks), jnp.float32)
    acc, _ = lax.scan(body, init, (points, weights))
    return acc


@partial(jax.jit, static_argnames=("ks",))
def splat_scatter(points, weights, ks: int, ps):
    """Reference scatter-add path (XLA scatter; deterministic). Used to
    cross-check splat_matmul and as a fallback for very small ray counts."""
    half = (ks / 2 - 0.5) * ps
    row_f = (half - points[..., 1]) / (2 * half) * (ks - 1)
    col_f = (points[..., 0] + half) / (2 * half) * (ks - 1)
    iy = jnp.floor(row_f).astype(jnp.int32)
    ix = jnp.floor(col_f).astype(jnp.int32)
    wy = row_f - iy
    wx = col_f - ix

    spp, n = row_f.shape
    v = weights.shape[0]
    nn = jnp.broadcast_to(jnp.arange(n)[None, :], (spp, n))
    grid = jnp.zeros((v, n, ks, ks), jnp.float32)
    for dy, dx, wgt in ((0, 0, (1 - wy) * (1 - wx)), (0, 1, (1 - wy) * wx),
                        (1, 0, wy * (1 - wx)), (1, 1, wy * wx)):
        grid = grid.at[:, nn, iy + dy, ix + dx].add(weights * wgt[None],
                                                    mode="drop")
    return grid


def forward_integral(o_sensor, d_sensor, ra, ks: int, ps,
                     pointc_ref=None, dp_params: DPParams = DPParams(),
                     chunk: int = 4096, use_matmul: bool = True):
    """Monte-Carlo DP PSF accumulation for a batch of point sources.

    o_sensor/d_sensor: [spp, N, 3] traced ray state at the sensor plane
    ra: [spp, N] validity
    pointc_ref: [N, 2] PSF centers (e.g. chief-ray); None -> RMS center
    Returns (psf_l, psf_r): [N, ks, ks] each.

    Mirrors reference monte_carlo.py:forward_integral (sign flip of the
    sensor coordinates, center shift, margin mask, bilinear DP deposit),
    vectorized over the point axis instead of the reference's Python loop.
    """
    points = -o_sensor[..., :2]                      # flip (monte_carlo.py:24)
    if pointc_ref is None:
        denom = ra.sum(0)[..., None] + 1e-9
        pointc = (points * ra[..., None]).sum(0) / denom
    else:
        pointc = pointc_ref
    shifted = points - pointc[None]

    half = (ks / 2 - 0.5) * ps
    inside = (jnp.abs(shifted[..., 0]) < (half - 0.01 * ps)) & \
             (jnp.abs(shifted[..., 1]) < (half - 0.01 * ps))
    ra_m = ra * inside.astype(ra.dtype)
    shifted = shifted * ra_m[..., None]

    x_tan = (-d_sensor[..., 0]) / d_sensor[..., 2]   # flipped slope
    w_l, w_r = dp_split_weights(x_tan, dp_params)
    weights = jnp.stack([w_l * ra_m, w_r * ra_m], axis=0)

    if use_matmul:
        psf = splat_matmul(shifted, weights, ks, ps, chunk=chunk)
    else:
        psf = splat_scatter(shifted, weights, ks, ps)
    return psf[0], psf[1]
