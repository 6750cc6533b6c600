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


@partial(jax.jit, static_argnames=("ks", "chunk"))
def coherent_psf_pair(o_sensor, ra, phi, ks: int, ps,
                      pointc_ref=None, chunk: int = 4096):
    """Coherent AND incoherent intensity PSFs from the same traced rays.

    o_sensor: [spp, N, 3] traced ray positions at the sensor plane (mm)
    ra:       [spp, N] validity
    phi:      [spp, N] accumulated phase from coherent tracing (rays.phi —
              per-step-reduced, so it is f32-accurate at any object
              distance; do NOT derive it from total f32 OPL, whose rounding
              at metre scale exceeds 2pi)
    pointc_ref: [N, 2] PSF centers; None -> energy centroid

    A third accumulation view carries the plain ray energy, so the
    incoherent comparison PSF costs one extra matmul column instead of a
    second trace. Returns (coherent [N,ks,ks], incoherent [N,ks,ks]),
    both unnormalized (like the incoherent accumulation before the
    caller's normalization).
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

    amp = jnp.stack([ra_m * jnp.cos(phi), ra_m * jnp.sin(phi), ra_m], axis=0)
    grids = splat_matmul(shifted, amp, ks, ps, chunk=chunk)
    return grids[0] ** 2 + grids[1] ** 2, grids[2]


def coherent_psf(o_sensor, ra, phi, ks: int, ps,
                 pointc_ref=None, chunk: int = 4096):
    """Coherent intensity PSF only — see coherent_psf_pair."""
    return coherent_psf_pair(o_sensor, ra, phi, ks, ps,
                             pointc_ref=pointc_ref, chunk=chunk)[0]


def coherent_psf_grid(lens, depth: float, grid: int = 3, ks: int = 21,
                      M: int = 256, wvln: float = 0.589, ps=None):
    """Field-grid of coherent/incoherent PSFs at one object plane.

    Traces a grid x grid lattice of point sources spanning the field of view
    at object depth `depth` (mm, negative) with full phase bookkeeping, and
    integrates interference on the sensor. The reference ships the coherent
    machinery (surfaces.py:435-510, monte_carlo.py:109-115) but no pipeline
    ever invokes it; here it is a first-class imaging mode.

    The pupil is sampled with an M x M regular-grid quadrature — random
    (Monte-Carlo) pupil sampling of a phase that varies by many cycles
    across the pupil yields speckle, not the true diffraction pattern. M
    must keep the pupil-to-pupil phase step under ~pi: M >~ 2 * blur_radius
    / wvln (a few hundred near focus at f/4).

    ps: analysis pixel pitch in mm (default: the sensor pixel). Diffraction
    structure at f/4 lives at the couple-of-micron scale, so resolving rings
    needs ps ~ 1e-3, far below the 47 um sensor pixel (where interference
    correctly averages out to the geometric PSF).

    Returns (coherent, incoherent): [grid, grid, ks, ks], each PSF
    max-normalized (like the fit pipeline's PSFs).
    """
    import numpy as np

    from ..optics.surfaces import trace_rays

    ps = lens.pixel_size if ps is None else ps
    x_half = 0.85 * abs(depth) * np.tan(lens.hfov)
    lin = np.linspace(-x_half, x_half, grid) if grid > 1 else np.zeros(1)
    xx, yy = np.meshgrid(lin, lin * lens.sensor_size[0] / lens.sensor_size[1])
    points = np.stack([xx.ravel(), yy.ravel(),
                       np.full(grid * grid, depth)], -1).astype(np.float32)

    rays = lens.sample_from_points_grid(points, M=M)
    eta, skip = lens.eta_arrays(wvln, True)
    n_in = lens.n_in_array(wvln, True)
    out = trace_rays(rays, lens.stack, eta, skip, n_in=n_in, coherent=True,
                     wvln=wvln).propagate_to(lens.d_sensor, wvln=wvln)
    coh, inc = coherent_psf_pair(out.o, out.ra, out.phi, ks, ps)
    coh = coh / (coh.max(axis=(-1, -2), keepdims=True) + 1e-12)
    inc = inc / (inc.max(axis=(-1, -2), keepdims=True) + 1e-12)
    return (coh.reshape(grid, grid, ks, ks),
            inc.reshape(grid, grid, ks, ks))
