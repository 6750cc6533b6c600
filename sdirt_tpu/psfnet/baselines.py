"""Baseline DP-PSF prediction models (paper comparison methods).

Parity source: /root/reference/deeplens/psfnet.py:338-527. Each maps
per-pixel normalized depth to an L/R kernel pair:
  * CoC: half-masked clipped Gaussian of the circle-of-confusion diameter
  * DPDNet: rect LUT indexed by CoC radius bucket
  * Modeling: disk-autocorrelation LUT
  * Learn2Reduce: Butterworth LUT by CoC pixel diameter

The reference assembles these with O(#buckets) boolean masked in-place
writes; here a single gather over the precomputed LUT does the same in one
XLA op.
"""

from __future__ import annotations

import jax.numpy as jnp

from .related_psf import disk_lut, l2r_lut, rect_lut


def _coc_signed(z, lens, is_z=True):
    """Signed circle-of-confusion [mm] for normalized depth z
    (reference psfnet.py:353-357)."""
    depth = z * (lens.d_max - lens.d_min) + lens.d_min if is_z else z
    foc_dist = float(lens.foc_d[0])
    coc = (depth - foc_dist) * lens.foclen**2 / (
        -depth * lens.fnum * (-foc_dist - lens.foclen))
    return coc, depth, foc_dist


def pred_coc(lens, inp, is_z: bool = True):
    """Clipped-Gaussian CoC model with half masks (psfnet.py:338-376).

    inp: [..., 3]; returns [..., 2, ks, ks] sum-normalized.
    """
    ks = lens.kernel_size
    z = inp[..., -1]
    coc, depth, foc_dist = _coc_signed(z, lens, is_z)
    ps = lens.sensor_size[0] / lens.sensor_res[0]
    coc_pixel = jnp.clip(jnp.abs(coc) / ps, 0.1, None)
    radius = (coc_pixel / 2)[..., None, None]

    gx, gy = jnp.meshgrid(jnp.linspace(-ks / 2 + 0.5, ks / 2 - 0.5, ks),
                          jnp.linspace(-ks / 2 + 0.5, ks / 2 - 0.5, ks),
                          indexing="xy")
    r2 = gx**2 + gy**2
    psf = jnp.exp(-r2 / (2 * radius**2)) * (r2 < radius**2)

    col = jnp.arange(ks)
    l_mask = (col >= ks // 2).astype(psf.dtype)       # zero left cols (:l_pixel)
    r_mask = (col < ks // 2 + 1).astype(psf.dtype)    # zero right cols (r_pixel:)
    near = (depth > foc_dist)[..., None, None]
    psf_l = psf * jnp.where(near, l_mask, r_mask)
    psf_r = psf * jnp.where(near, r_mask, l_mask)
    out = jnp.stack([psf_l, psf_r], axis=-3)
    return out / (out.sum((-1, -2), keepdims=True) + 1e-6)


def _lut_pred(lens, inp, lut, bucket_of, swap_lr_order: bool, is_z: bool):
    ks = lens.kernel_size
    z = inp[..., -1]
    coc, _, _ = _coc_signed(z, lens, is_z)
    ps = lens.sensor_size[0] / lens.sensor_res[0]
    idx = bucket_of(coc, ps, lut.shape[0])
    kernels = jnp.asarray(lut)[idx]                    # [..., 2, ks, ks]
    # negative CoC: swap the L/R kernels (reference swaps assignments)
    neg = (coc < 0)[..., None, None, None]
    kernels = jnp.where(neg, kernels[..., ::-1, :, :], kernels)
    if swap_lr_order:
        kernels = kernels[..., ::-1, :, :]
    return kernels / (kernels.sum((-1, -2), keepdims=True) + 1e-6)


def pred_dpdnet(lens, inp, is_z: bool = True):
    """Rect-kernel baseline (psfnet.py:378-423). Note the reference stacks
    (right, left) for this model — preserved."""

    def bucket(coc, ps, n):
        r = jnp.clip(jnp.abs(coc) / ps / 2.0, 0.1, None)
        r = jnp.sqrt(jnp.pi) * r / 2.0
        return jnp.clip(jnp.floor(r / 0.5), 0, n - 1).astype(jnp.int32)

    return _lut_pred(lens, inp, rect_lut(lens.kernel_size), bucket,
                     swap_lr_order=True, is_z=is_z)


def pred_modeling(lens, inp, is_z: bool = True):
    """Disk-autocorrelation baseline (psfnet.py:425-469)."""

    def bucket(coc, ps, n):
        r = jnp.clip(jnp.abs(coc) / ps / 2.0, 0.1, None)
        return jnp.clip(jnp.floor(r / 0.5), 0, n - 1).astype(jnp.int32)

    return _lut_pred(lens, inp, disk_lut(lens.kernel_size), bucket,
                     swap_lr_order=False, is_z=is_z)


def pred_learn2reduce(lens, inp, is_z: bool = True):
    """Butterworth baseline (psfnet.py:471-527). The reference stacks
    (right, left) — preserved via swap_lr_order."""

    def bucket(coc, ps, n):
        d = jnp.clip(jnp.abs(coc) / ps, 0.1, None)
        d_odd = (jnp.floor(d / 2) * 2 + 1)            # //2*2+1
        return jnp.clip(((d_odd - 1) / 2), 0, n - 1).astype(jnp.int32)

    return _lut_pred(lens, inp, l2r_lut(lens.kernel_size), bucket,
                     swap_lr_order=True, is_z=is_z)
