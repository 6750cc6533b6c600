"""Coherent (interference-aware) PSF accumulation.

The reference carries the machinery for coherent ray tracing — per-surface
optical-path accumulation (basics.py:266-272, surfaces.py:435-510) and a
complex-amplitude splat (monte_carlo.py:109-115's `exp(1j*phase)` branch of
assign_points_to_pixels) — though no production pipeline calls it. This
module provides the same capability TPU-first.

Design: TPUs have no complex matmul, so the complex bilinear deposit
Σ w·e^{iφ} is carried as TWO real accumulations (w·cosφ, w·sinφ) through the
same one-hot-matmul splat the DP integrator uses (splat.splat_matmul with
V=2 views = Re/Im); intensity is re² + im². Phase comes from rays.phi,
which the trace reduces per surface (fmod(n·k·(t − t.min), 2π), matching
reference surfaces.py:439) — the dropped common path is a global phase and
cancels in |A|².

Usage: trace with `trace_rays(..., coherent=True, n_in=lens.n_in_array(...),
wvln=...)`, propagate to the sensor with `propagate_to(d_sensor, wvln=...)`,
then call `coherent_psf(out.o, out.ra, out.phi, ...)`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .splat import splat_matmul


@partial(jax.jit, static_argnames=("ks",))
def coherent_psf(o_sensor, ra, phi, ks: int, ps,
                 pointc_ref=None, chunk: int = 4096):
    """Coherent PSF for a batch of point sources.

    o_sensor: [spp, N, 3] traced ray positions at the sensor plane (mm)
    ra:       [spp, N] validity
    phi:      [spp, N] accumulated phase from coherent tracing (rays.phi —
              per-step-reduced, so it is f32-accurate at any object
              distance; do NOT derive it from total f32 OPL, whose rounding
              at metre scale exceeds 2pi)
    pointc_ref: [N, 2] PSF centers; None -> energy centroid
    Returns   [N, ks, ks] intensity PSF (unnormalized, like the incoherent
              accumulation before the caller's normalization).
    """
    points = -o_sensor[..., :2]                  # sensor flip (splat.py:204)
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

    amp = jnp.stack([ra_m * jnp.cos(phi), ra_m * jnp.sin(phi)], axis=0)
    grids = splat_matmul(shifted, amp, ks, ps, chunk=chunk)
    return grids[0] ** 2 + grids[1] ** 2
