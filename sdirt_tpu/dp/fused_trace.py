"""Pallas fused trace: the whole multi-surface trace resident in VMEM.

The north-star pipeline (reference /root/reference/deeplens/surfaces.py:523-586
hot loop + monte_carlo.py:9-135) traces every Monte-Carlo ray through all lens
surfaces. The XLA `lax.scan` trace pays one kernel per surface with the full
ray carry round-tripping HBM each step, and the statically-unrolled XLA trace
materializes inter-surface temporaries in HBM (measured slower than the scan —
logs/bench_trace_ab_*). This kernel removes both costs: a block of rays is
DMA'd into VMEM once, the ENTIRE surface chain (sphere-seeded Newton + Snell,
exactly the `_surface_step_spec` math from optics/surfaces.py) runs unrolled
on the VPU with every intermediate in vector registers / VMEM, and only the
four sensor-plane result arrays go back to HBM.

Scope: value-only forward tracing to the sensor for the DP-PSF path (the same
scope as trace_rays_specialized). The DP split weights (arccos-heavy,
monte_carlo.py:166-203) and the MXU matmul splat stay in XLA where they fuse
with the accumulation — the kernel's outputs drop straight into
splat.dp_accumulate.

Layout: rays are component-wise (struct-of-arrays) 2-D tiles [rows, 128] so
every op is a native 8x128 VPU op; the (spp, N) bundle structure is restored
on the way out.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import (
    EPSILON,
    NEWTON_FAST_ITERS,
    NEWTON_STEP_BOUND,
    NEWTON_TOL_TIGHT,
)
from ..optics.surfaces import (
    KIND_ASPHERIC,
    KIND_SPHERIC,
    KIND_STOP,
    _valid_loose_spec,
    _valid_tight_spec,
    static_surface_desc,
)

LANE = 128


@dataclasses.dataclass(frozen=True)
class FusedPlan:
    """Hashable static trace plan: surface chain + per-surface eta + sensor.

    surfaces: static_surface_desc(...) tuple
    eta:      per-surface refraction ratios (python floats; wavelength baked)
    block_rows: sublane rows per kernel block (VPU tile multiple of 8)
    """

    surfaces: tuple
    eta: tuple
    block_rows: int = 256
    interpret: bool = False


def make_fused_plan(lens, wvln: float = 0.589, block_rows: int = 256,
                    interpret: bool | None = None) -> FusedPlan:
    """Build the static plan for one lens at one wavelength.

    interpret=None auto-selects: compiled Mosaic on TPU, interpreter
    elsewhere (Mosaic kernels don't lower for CPU/GPU backends)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    eta, skip = lens.eta_arrays(wvln, True)
    desc = static_surface_desc(lens.stack, skip)
    return FusedPlan(surfaces=desc, eta=tuple(float(e) for e in np.asarray(eta)),
                     block_rows=int(block_rows), interpret=bool(interpret))


# ---------------------------------------------------------------------------
# Component-wise surface step (value-parity with optics/surfaces.py
# _surface_step_spec, minus the obliquity product the DP path never reads)
# ---------------------------------------------------------------------------

def _sag_dsag(r2, c: float, k: float, ai: tuple):
    """Fused _sag_spec + _dsag_spec (optics/surfaces.py:367-395), restructured
    for the VPU: ONE sqrt and two reciprocals replace the two sqrts and three
    divides of the separate helpers. Value-identical up to fp reassociation:
    (1+k)*r2*c^2/(2*sf) == (1-u)/(2*sf) because u = 1-(1+k)*r2*c^2 — the
    1e-24 clamp only binds on rays the loose/tight masks have already zeroed
    (r2 is mask-multiplied upstream), so the identity holds on live lanes."""
    n_ai = max((i + 1 for i, a in enumerate(ai) if a != 0.0), default=0)
    sag = dsag = None
    if c != 0.0:
        u = jnp.maximum(1.0 - (1.0 + k) * r2 * (c * c), 1e-24)
        sf = jnp.sqrt(u)
        inv_sf = 1.0 / sf
        inv1 = 1.0 / (1.0 + sf)
        sag = r2 * c * inv1
        dsag = (1.0 + sf + (1.0 - u) * (0.5 * inv_sf)) * c * inv1 * inv1
    if n_ai:
        poly = jnp.full_like(r2, ai[n_ai - 1])
        dpoly = jnp.full_like(r2, n_ai * ai[n_ai - 1])
        for i in range(n_ai - 2, -1, -1):
            poly = poly * r2 + ai[i]
            dpoly = dpoly * r2 + (i + 1) * ai[i]
        sag = poly * r2 if sag is None else sag + poly * r2
        dsag = dpoly if dsag is None else dsag + dpoly
    zero = None if sag is not None else jnp.zeros_like(r2)
    return (sag if sag is not None else zero,
            dsag if dsag is not None else zero)

def _sphere_seed_c(ox, oy, oz, dx, dy, dz, c: float, d_surf: float, t_plane,
                   polish: bool = False):
    """Ray-sphere intersection. polish=True adds the exact-a quadratic and
    ONE polynomial Newton step — no extra sqrt, one divide — recovering the
    accuracy of the sag-based Newton polish for the pure-sphere fast path
    (raw f32 (-b±sq)/2 roots drift ~4e-3 mm over a 10-sphere chain; polished
    they match the specialized trace to ~1e-5)."""
    if c == 0.0:
        return t_plane
    radius = 1.0 / c
    cz = d_surf + radius
    ocz = oz - cz
    b = 2.0 * (dx * ox + dy * oy + dz * ocz)
    cc = ox * ox + oy * oy + ocz * ocz - radius * radius
    if polish:
        # |d| drifts ~1e-6 from unit over the refraction chain; the root is
        # linearly sensitive to it (t ~ 50 mm), so use the exact quadratic
        a = dx * dx + dy * dy + dz * dz
        disc = b * b - 4.0 * a * cc
        inv2a = 0.5 / a
    else:
        disc = b * b - 4.0 * cc
        inv2a = 0.5
    ok = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) * inv2a
    t2 = (-b + sq) * inv2a
    pick = jnp.where(jnp.abs(t1 - t_plane) < jnp.abs(t2 - t_plane), t1, t2)
    if polish:
        # Newton on q(t) = a t^2 + b t + cc; q'(root) = +-sq (never ~0 off
        # tangency; tangent rays exit the aperture test anyway)
        q = (a * pick + b) * pick + cc
        pick = pick - jnp.clip(q / (2.0 * a * pick + b + EPSILON),
                               -NEWTON_STEP_BOUND, NEWTON_STEP_BOUND)
    return jnp.where(ok, pick, t_plane)


def _step_c(ox, oy, oz, dx, dy, dz, ra, kind: int, c: float, k: float,
            ai: tuple, d_surf: float, r_ap: float, skip: bool, eta: float,
            maxiter: int):
    """One surface: Newton intersection + Snell refraction, all components."""
    inv_dz = 1.0 / dz
    t0 = (d_surf - oz) * inv_dz
    live = ra > 0
    # Pure spheres dominate the shipped prescriptions (10/12 rf50mm, 19/21
    # rf35mm surfaces): for them the sphere seed IS the exact intersection
    # (quadratic solve), so the Newton polish (one sag sqrt + two
    # reciprocals) is redundant, and the Snell normal comes from the sphere
    # center by pure multiplication ((p - C) * c is unit by construction) —
    # no dsag, no rsqrt. Parity: tests/test_fused_trace.py (ra bit-equal,
    # px/py <= 5e-4 vs the Newton-polished specialized trace).
    pure_sphere = kind == KIND_SPHERIC and k == 0.0 and not any(ai)

    if kind == KIND_STOP and c == 0.0 and not any(ai):
        t = t0
        nx_o = ox + dx * t
        ny_o = oy + dy * t
        nz_o = oz + dz * t
        r2n = nx_o * nx_o + ny_o * ny_o
        # sqrt(r2n) <= r_ap, squared (r_ap is a static non-negative float)
        valid = (r2n <= r_ap * r_ap) & live
    elif pure_sphere:
        # Re-center at the surface plane before solving: from the object
        # plane the quadratic's cc term is ~t^2 (f32 ulp ~0.06 mm^2 at
        # t~1000), and a polynomial polish only converges to the root of
        # that badly-rounded polynomial. From the plane, every coefficient
        # is O(R) and the polished root matches float64 to ~2e-6 mm.
        oxp = ox + dx * t0
        oyp = oy + dy * t0
        ozp = oz + dz * t0
        tp_loc = (d_surf - ozp) * inv_dz   # residual plane offset (~0)
        t_loc = _sphere_seed_c(oxp, oyp, ozp, dx, dy, dz, c, d_surf, tp_loc,
                               polish=True)
        t = t0 + t_loc
        nx_o = oxp + dx * t_loc
        ny_o = oyp + dy * t_loc
        nz_o = ozp + dz * t_loc
        r2n = nx_o * nx_o + ny_o * ny_o
        valid = (r2n <= r_ap * r_ap) & (t >= 0) & live
    else:
        dxy2 = dx * dx + dy * dy
        doxy = dx * ox + dy * oy

        def ft_dfdt(t, tight: bool):
            x = ox + dx * t
            y = oy + dy * t
            z = oz + dz * t
            r2_raw = x * x + y * y
            if tight:
                v = _valid_tight_spec(r2_raw, c, k, r_ap)
            else:
                v = _valid_loose_spec(r2_raw, c, k)
            v = v & live
            m = v.astype(x.dtype)
            r2 = (x * m) ** 2 + (y * m) ** 2
            sag, dsag = _sag_dsag(r2, c, k, ai)
            ft = sag + d_surf - z
            dfdt = dsag * (2.0 * (dxy2 * t + doxy)) - dz
            return ft, dfdt

        t = _sphere_seed_c(ox, oy, oz, dx, dy, dz, c, d_surf, t0)
        if kind == KIND_ASPHERIC or k != 0.0 or any(ai):
            for _ in range(maxiter):
                ft, dfdt = ft_dfdt(t, tight=False)
                t = t - jnp.clip(ft / (dfdt + EPSILON),
                                 -NEWTON_STEP_BOUND, NEWTON_STEP_BOUND)
        ft_d, dfdt = ft_dfdt(t, tight=True)
        t = t - jnp.clip(ft_d / (dfdt + EPSILON),
                         -NEWTON_STEP_BOUND, NEWTON_STEP_BOUND)

        nx_o = ox + dx * t
        ny_o = oy + dy * t
        nz_o = oz + dz * t
        r2n = nx_o * nx_o + ny_o * ny_o
        if kind == KIND_ASPHERIC:
            valid = (_valid_tight_spec(r2n, c, k, r_ap)
                     & (jnp.abs(ft_d) < NEWTON_TOL_TIGHT) & live & (t > 0))
        elif kind == KIND_SPHERIC:
            valid = (r2n <= r_ap * r_ap) & (t >= 0) & live
        else:
            valid = (r2n <= r_ap * r_ap) & live

    vm3 = valid
    ox = jnp.where(vm3, nx_o, ox)
    oy = jnp.where(vm3, ny_o, oy)
    oz = jnp.where(vm3, nz_o, oz)
    ra = ra * valid.astype(ra.dtype)
    if skip:
        return ox, oy, oz, dx, dy, dz, ra

    # Snell refraction with the specialized surface normal (forward)
    if pure_sphere and c != 0.0:
        # exact unit normal from the sphere center C = (0, 0, d_surf + 1/c):
        # n = -(p - C) * c, forward-oriented (nz = 1 near the axis). Unit by
        # construction for every live lane (|p - C| = |1/c| on the sphere);
        # dead lanes carry stale o but are masked out of the update below.
        nx = -ox * c
        ny = -oy * c
        nz = (1.0 + d_surf * c) - oz * c
    elif pure_sphere:
        # flat refractive plane: constant normal
        nx = jnp.zeros_like(ox)
        ny = nx
        nz = jnp.ones_like(ox)
    else:
        m = (ra > 0).astype(dx.dtype)
        x = ox * m
        y = oy * m
        r2 = x * x + y * y
        ds = _sag_dsag(r2, c, k, ai)[1]
        nx = ds * 2.0 * x
        ny = ds * 2.0 * y
        # n = -(nx, ny, -1)/|n| (normalize then forward flip); the argument
        # is >= 1 so rsqrt needs no clamp — one rsqrt replaces sqrt + three
        # divides
        inv_nrm = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
        nx = -nx * inv_nrm
        ny = -ny * inv_nrm
        nz = inv_nrm
    cosi = dx * nx + dy * ny + dz * nz
    valid_r = (cosi * cosi > 0.1) & (eta * eta * (1.0 - cosi * cosi) < 1.0) & (ra > 0)
    vm = valid_r.astype(dx.dtype)
    sr = jnp.sqrt(1.0 - eta * eta * (1.0 - cosi * cosi) * vm)
    ndx = sr * nx + eta * (dx - cosi * nx)
    ndy = sr * ny + eta * (dy - cosi * ny)
    ndz = sr * nz + eta * (dz - cosi * nz)
    dx = jnp.where(valid_r, ndx, dx)
    dy = jnp.where(valid_r, ndy, dy)
    dz = jnp.where(valid_r, ndz, dz)
    return ox, oy, oz, dx, dy, dz, ra * vm


def _trace_kernel(dsens_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  ra_ref, px_ref, py_ref, xt_ref, ro_ref, *,
                  surfaces: tuple, eta: tuple, maxiter: int):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ra = ra_ref[:]
    for i, (kind, c, k, ai, d_surf, r_ap, skip) in enumerate(surfaces):
        ox, oy, oz, dx, dy, dz, ra = _step_c(
            ox, oy, oz, dx, dy, dz, ra, kind, c, k, ai, d_surf, r_ap, skip,
            eta[i], maxiter)
    # propagate to the sensor plane and emit the splat inputs
    # (flip conventions of splat.forward_integral: points = -o, slope = -dx/dz)
    d_sensor = dsens_ref[0]
    inv_dz = 1.0 / dz
    t = (d_sensor - oz) * inv_dz
    px_ref[:] = -(ox + dx * t)
    py_ref[:] = -(oy + dy * t)
    xt_ref[:] = -dx * inv_dz
    ro_ref[:] = ra


@functools.partial(jax.jit, static_argnames=("plan", "maxiter"))
def fused_trace_sensor(rays, d_sensor, plan: FusedPlan,
                       maxiter: int = NEWTON_FAST_ITERS):
    """Trace a [spp, N] bundle to the sensor in ONE fused kernel.

    Returns (px, py, x_tan, ra), each [spp, N]: sensor intersection points
    (sign-flipped per monte_carlo.py:24), flipped incidence slope, validity.
    """
    o, d, ra = rays.o, rays.d, rays.ra
    bundle = ra.shape
    n_rays = int(np.prod(bundle))
    blk = plan.block_rows
    per_block = blk * LANE
    n_blocks = -(-n_rays // per_block)
    pad = n_blocks * per_block - n_rays

    def flat(a, fill):
        a = a.reshape(-1)
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(n_blocks * blk, LANE)

    comps = (flat(o[..., 0], 0.0), flat(o[..., 1], 0.0), flat(o[..., 2], 0.0),
             flat(d[..., 0], 0.0), flat(d[..., 1], 0.0), flat(d[..., 2], 1.0),
             flat(ra, 0.0))

    kern = functools.partial(_trace_kernel, surfaces=plan.surfaces,
                             eta=plan.eta, maxiter=maxiter)
    spec = pl.BlockSpec((blk, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n_blocks * blk, LANE), jnp.float32)
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 7,
        out_specs=(spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=plan.interpret,
    )(jnp.asarray(d_sensor, jnp.float32).reshape(1), *comps)

    def unflat(a):
        a = a.reshape(-1)
        if pad:
            a = a[:n_rays]
        return a.reshape(bundle)

    return tuple(unflat(a) for a in outs)
