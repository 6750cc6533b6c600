"""Stacked optical surfaces and the ray–surface interaction kernel.

TPU-first redesign of the reference per-surface class hierarchy
(/root/reference/deeplens/surfaces.py). Instead of one Python object per
surface with `exec`-generated attributes, a lens is a single `SurfaceStack`
pytree of stacked parameter arrays, and tracing is one `lax.scan` over the
surface axis — every surface type (Stop / Spheric / Aspheric) runs the same
branch-free masked math, so the whole trace jits once and vmaps over
arbitrarily shaped ray bundles.

Gradient structure mirrors the reference exactly (surfaces.py:523-586):
the Newton iteration runs value-only (stop_gradient), then ONE extra
differentiable iteration re-attaches the graph, so d(intersection)/d(surface
params, ray inputs) is exact without unrolling the solver.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.constants import (
    EPSILON,
    MAX_AI_TERMS,
    NEWTON_FAST_ITERS,
    NEWTON_MAXITER,
    NEWTON_STEP_BOUND,
    NEWTON_TOL_TIGHT,
)
from ..core.rays import Rays, normalize

# Surface kinds (validity semantics differ; see reference surfaces.py:408-520)
KIND_STOP = 0      # flat plane / aperture stop (c == 0)
KIND_SPHERIC = 1   # c != 0, k == 0, no aspheric terms
KIND_ASPHERIC = 2  # general even asphere


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SurfaceStack:
    """Stacked surface parameters for a lens with S surfaces.

    c:    [S] curvature (1/roc)
    k:    [S] conic constant
    ai:   [S, MAX_AI_TERMS] even-asphere coefficients a2..a16 (zero padded)
    d:    [S] vertex z position [mm]
    r:    [S] clear aperture radius [mm]
    kind: [S] int32 surface kind
    """

    c: jnp.ndarray
    k: jnp.ndarray
    ai: jnp.ndarray
    d: jnp.ndarray
    r: jnp.ndarray
    kind: jnp.ndarray

    @property
    def num_surfaces(self) -> int:
        return self.c.shape[0]

    @staticmethod
    def from_lists(c, k, ai_lists, d, r, kinds) -> "SurfaceStack":
        s = len(c)
        ai = np.zeros((s, MAX_AI_TERMS), np.float32)
        for i, terms in enumerate(ai_lists):
            if terms:
                ai[i, : len(terms)] = np.asarray(terms, np.float32)
        return SurfaceStack(
            c=jnp.asarray(c, jnp.float32),
            k=jnp.asarray(k, jnp.float32),
            ai=jnp.asarray(ai),
            d=jnp.asarray(d, jnp.float32),
            r=jnp.asarray(r, jnp.float32),
            kind=jnp.asarray(kinds, jnp.int32),
        )


# ---------------------------------------------------------------------------
# Sag and derivatives (reference surfaces.py:787-830)
# ---------------------------------------------------------------------------

def sag_r2(r2, c, k, ai):
    """Even-asphere sag g(r^2) = c r^2 / (1 + sqrt(1-(1+k) c^2 r^2)) + sum a_i r^(2i)."""
    sf = jnp.sqrt(jnp.maximum(1.0 - (1.0 + k) * r2 * c * c, 1e-24))
    base = r2 * c / (1.0 + sf)
    # Horner over a2..a16; zero padding reproduces any lower degree
    poly = ai[..., MAX_AI_TERMS - 1]
    for i in range(MAX_AI_TERMS - 2, -1, -1):
        poly = poly * r2 + ai[..., i]
    return base + poly * r2


def dsag_dr2(r2, c, k, ai):
    """d g / d r^2 (reference surfaces.py:811-830)."""
    cc = c * c
    sf = jnp.sqrt(jnp.maximum(1.0 - (1.0 + k) * r2 * cc, 1e-24))
    ds = (1.0 + sf + (1.0 + k) * r2 * cc / (2.0 * sf)) * c / (1.0 + sf) ** 2
    poly = MAX_AI_TERMS * ai[..., MAX_AI_TERMS - 1]
    for i in range(MAX_AI_TERMS - 2, -1, -1):
        poly = poly * r2 + (i + 1) * ai[..., i]
    return ds + poly


def _r2_bound(c, k):
    """Largest r^2 for which the conic sqrt stays real (surfaces.py:724-743)."""
    denom = c * c * (1.0 + k)
    bound = (1.0 - EPSILON) / jnp.where(denom == 0.0, 1.0, denom)
    return jnp.where(denom == 0.0, jnp.inf, bound)


def _valid_loose(r2, c, k):
    """Shape-defined region only (surfaces.py:735-743)."""
    bound = _r2_bound(c, k)
    return jnp.where(k > -1.0, r2 < bound, r2 > 0.0)


def _valid_tight(r2, c, k, r_ap):
    """Shape-defined AND inside the clear aperture (surfaces.py:724-732)."""
    in_ap = r2 < r_ap * r_ap
    bound = _r2_bound(c, k)
    return jnp.where(k > -1.0, in_ap & (r2 < bound), in_ap)


# ---------------------------------------------------------------------------
# Newton intersection + Snell refraction for one surface (all rays at once)
# ---------------------------------------------------------------------------

def _sphere_seed(o, dvec, c, d_surf, t_plane):
    """Closed-form ray/sphere intersection with the surface's osculating
    sphere (radius 1/c centered at z = d + 1/c) as the Newton seed.

    For spheric surfaces this IS the solution; for aspheres the k/ai terms
    are small perturbations, so Newton converges in 1-2 steps instead of the
    ~10 the plane seed needs. Value-only (wrapped in stop_gradient by the
    caller); falls back to the plane seed for c ~ 0 or missed spheres.
    """
    # center C = (0, 0, d + R); solve |o + t v - C|^2 = R^2 with |v| = 1
    cz = d_surf + 1.0 / jnp.where(c == 0.0, 1.0, c)
    oc_x, oc_y = o[..., 0], o[..., 1]
    oc_z = o[..., 2] - cz
    b = 2.0 * (dvec[..., 0] * oc_x + dvec[..., 1] * oc_y + dvec[..., 2] * oc_z)
    cc = oc_x**2 + oc_y**2 + oc_z**2 - (1.0 / jnp.where(c == 0.0, 1.0, c)) ** 2
    disc = b * b - 4.0 * cc
    ok = (disc > 0.0) & (c != 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / 2.0
    t2 = (-b + sq) / 2.0
    # the lens surface is the hemisphere nearest the vertex plane: take the
    # root closest to the plane intersection
    pick = jnp.where(jnp.abs(t1 - t_plane) < jnp.abs(t2 - t_plane), t1, t2)
    return jnp.where(ok, pick, t_plane)


def _newton_t(o, dvec, ra, c, k, ai, d_surf, r_ap,
              maxiter: int = NEWTON_MAXITER):
    """Solve o_z + d_z t = d_surf + g(x(t), y(t)) for every ray.

    Returns (t, ft_detached) where t carries gradients through exactly one
    Newton step (reference surfaces.py:539-586).
    """
    dz = dvec[..., 2]
    t0 = (d_surf - o[..., 2]) / dz
    dxy2 = dvec[..., 0] ** 2 + dvec[..., 1] ** 2
    doxy = dvec[..., 0] * o[..., 0] + dvec[..., 1] * o[..., 1]

    def ft_dfdt(t, tight: bool):
        new_o = o + dvec * t[..., None]
        x, y = new_o[..., 0], new_o[..., 1]
        r2_raw = x * x + y * y
        if tight:
            valid = _valid_tight(r2_raw, c, k, r_ap)
        else:
            valid = _valid_loose(r2_raw, c, k)
        valid = valid & (ra > 0)
        m = valid.astype(x.dtype)
        r2 = (x * m) ** 2 + (y * m) ** 2
        ft = sag_r2(r2, c, k, ai) + d_surf - new_o[..., 2]
        dr2dt = 2.0 * (dxy2 * t + doxy)
        dfdt = dsag_dr2(r2, c, k, ai) * dr2dt - dz
        return ft, dfdt

    # Value-only Newton iterations (torch.no_grad equivalent), seeded by the
    # closed-form sphere intersection
    def body(_, t):
        ft, dfdt = ft_dfdt(t, tight=False)
        return t - jnp.clip(ft / (dfdt + EPSILON), -NEWTON_STEP_BOUND, NEWTON_STEP_BOUND)

    seed = lax.stop_gradient(_sphere_seed(o, dvec, c, d_surf, t0))
    if maxiter <= 4:
        # Static unroll: lax.fori_loop lowers to while_loop, which is a
        # fusion BARRIER — each Newton iteration becomes its own kernel
        # with a full [spp,N] carry round-trip through HBM. Unrolled, the
        # whole surface step fuses into one elementwise kernel.
        t_ng = seed
        for _ in range(maxiter):
            t_ng = body(None, t_ng)
    else:
        t_ng = lax.fori_loop(0, maxiter, body, seed)
    t1 = lax.stop_gradient(t_ng - lax.stop_gradient(t0))

    # One differentiable iteration re-attaches the graph: t = t0 + t1 - ft/dfdt
    t = t0 + t1
    ft, dfdt = ft_dfdt(t, tight=True)
    t = t - jnp.clip(ft / (dfdt + EPSILON), -NEWTON_STEP_BOUND, NEWTON_STEP_BOUND)
    return t, lax.stop_gradient(ft)


def _refract(o_new, dvec, ra, obliq, c, k, ai, eta, forward: bool):
    """Snell refraction with validity masking (reference surfaces.py:633-679)."""
    valid_in = ra > 0
    m = valid_in.astype(dvec.dtype)
    x = o_new[..., 0] * m
    y = o_new[..., 1] * m
    r2 = x * x + y * y
    ds = dsag_dr2(r2, c, k, ai)
    n = jnp.stack([ds * 2.0 * x, ds * 2.0 * y, -jnp.ones_like(x)], axis=-1)
    n = normalize(n)
    if forward:
        n = -n

    cosi = jnp.sum(dvec * n, axis=-1)
    valid = (cosi**2 > 0.1) & (eta**2 * (1.0 - cosi**2) < 1.0) & valid_in
    vm = valid.astype(dvec.dtype)
    sr = jnp.sqrt(1.0 - eta**2 * (1.0 - cosi[..., None] ** 2) * vm[..., None])
    new_d = sr * n + eta * (dvec - cosi[..., None] * n)
    new_d = jnp.where(valid[..., None], new_d, dvec)
    new_obliq = obliq * jnp.sum(new_d * lax.stop_gradient(dvec), axis=-1)
    return new_d, ra * vm, new_obliq


def surface_step(rays: Rays, params, forward: bool = True,
                 maxiter: int = NEWTON_FAST_ITERS,
                 coherent: bool = False) -> Rays:
    """Intersection + refraction with one surface.

    params: dict with scalars c, k, d, r, eta, skip_refract (0/1) and ai[8],
    kind (int). Mirrors Aspheric.ray_reaction (reference surfaces.py:391-520)
    with the three per-kind validity rules fused via masks.
    """
    c, k, ai = params["c"], params["k"], params["ai"]
    d_surf, r_ap, kind = params["d"], params["r"], params["kind"]
    eta, skip_refract = params["eta"], params["skip_refract"]

    o, dvec, ra = rays.o, rays.d, rays.ra

    t, ft_d = _newton_t(o, dvec, ra, c, k, ai, d_surf, r_ap, maxiter)
    new_o = o + dvec * t[..., None]
    x, y = new_o[..., 0], new_o[..., 1]
    r2n = lax.stop_gradient(x * x + y * y)
    t_d = lax.stop_gradient(t)

    # Validity per surface kind:
    #  - aspheric: tight region & Newton tolerance & t>0   (surfaces.py:584)
    #  - spheric:  inside aperture & t>=0                  (surfaces.py:464)
    #  - stop:     inside aperture only                    (surfaces.py:421)
    live = ra > 0
    v_asp = _valid_tight(r2n, c, k, r_ap) & (jnp.abs(ft_d) < NEWTON_TOL_TIGHT) & live & (t_d > 0)
    v_sph = (r2n <= r_ap * r_ap) & (t_d >= 0) & live
    v_stop = (jnp.sqrt(r2n) <= r_ap) & live
    valid = jnp.where(kind == KIND_STOP, v_stop, jnp.where(kind == KIND_SPHERIC, v_sph, v_asp))

    o_out = jnp.where(valid[..., None], new_o, o)
    ra_mid = ra * valid.astype(ra.dtype)

    if coherent:
        # Optical path length accumulation (reference surfaces.py:468-510:
        # opl += n_incident * t for valid rays). params carries n_in.
        opl_out = jnp.where(valid, rays.opl + params["n_in"] * t, rays.opl)
        # Phase, reduced per surface so f32 stays accurate at any object
        # distance (reference surfaces.py:439-441): the common minimum path
        # is a global phase and cancels in |amplitude|^2.
        k_wave = params["k_wave"]
        dphi = jnp.mod(params["n_in"] * k_wave
                       * (t - lax.stop_gradient(t).min(axis=0)),
                       2.0 * jnp.pi)
        phi_out = jnp.where(valid, rays.phi + dphi, rays.phi)
    else:
        opl_out = rays.opl
        phi_out = rays.phi

    new_d, ra_refr, obliq_refr = _refract(o_out, dvec, ra_mid, rays.obliq, c, k, ai, eta, forward)

    # Stops with eta == 1 skip refraction entirely (surfaces.py:450-453)
    skip = skip_refract > 0
    d_out = jnp.where(skip, dvec, new_d)
    ra_out = jnp.where(skip, ra_mid, ra_refr)
    obliq_out = jnp.where(skip, rays.obliq, obliq_refr)

    return rays.replace(o=o_out, d=d_out, ra=ra_out, obliq=obliq_out,
                        opl=opl_out, phi=phi_out)


def trace_rays(rays: Rays, stack: SurfaceStack, eta: jnp.ndarray,
               skip_refract: jnp.ndarray, forward: bool = True,
               maxiter: int = NEWTON_FAST_ITERS, n_in=None,
               coherent: bool = False, wvln: float = 0.589) -> Rays:
    """Trace a ray bundle through all surfaces (scan over the surface axis).

    eta[S]: per-surface refraction ratio n_in/n_out in the given direction.
    Backward tracing passes the surface arrays already reversed
    (reference optics.py:692-717 flips the loop order). In coherent mode
    rays accumulate opl (mm) and phi (per-surface-reduced phase for the
    wavelength wvln, microns).
    """
    params = {
        "c": stack.c, "k": stack.k, "ai": stack.ai, "d": stack.d,
        "r": stack.r, "kind": stack.kind, "eta": eta, "skip_refract": skip_refract,
    }
    if coherent:
        assert n_in is not None, "coherent tracing needs per-surface n_in"
        params["n_in"] = n_in
        n_surf = stack.c.shape[0]
        params["k_wave"] = jnp.full((n_surf,), 2.0 * jnp.pi / (wvln * 1e-3),
                                    jnp.float32)
    if not forward:
        params = jax.tree.map(lambda a: jnp.flip(a, axis=0), params)

    def step(carry, p):
        return surface_step(carry, p, forward=forward, maxiter=maxiter,
                            coherent=coherent), None

    out, _ = lax.scan(step, rays, params)
    return out


# ---------------------------------------------------------------------------
# Statically-specialized unrolled trace (the throughput path)
# ---------------------------------------------------------------------------
# The lax.scan above shares ONE generic surface body: every surface pays the
# full MAX_AI_TERMS Horner chains three times over plus all three validity
# branches, and the ray carry round-trips HBM at every surface. For the hot
# inference paths (PSF fit supervision, dp_psf, the bench north-star:
# reference monte_carlo.py:9-135 + surfaces.py:523-586) the lens prescription
# is FIXED — so the trace below unrolls the surface loop in Python with the
# surface parameters as static compile-time constants: stops reduce to a
# plane hit, spherics to the closed-form sphere intersection plus the same
# Newton polish, and aspheres run Horner only over their actual nonzero
# terms. XLA then fuses the whole 12-21 surface chain into a handful of
# kernels with no HBM carry between surfaces. Value-parity with trace_rays
# is asserted by tests/test_trace_golden.py::test_specialized_trace_matches_scan.


def static_surface_desc(stack: SurfaceStack, skip_refract) -> tuple:
    """Hashable per-surface description for trace_rays_specialized.

    Concretizes the stack (host sync) — call once per lens and cache.
    """
    c = np.asarray(stack.c)
    k = np.asarray(stack.k)
    ai = np.asarray(stack.ai)
    d = np.asarray(stack.d)
    r = np.asarray(stack.r)
    kind = np.asarray(stack.kind)
    skip = np.asarray(skip_refract)
    return tuple(
        (int(kind[i]), float(c[i]), float(k[i]), tuple(float(a) for a in ai[i]),
         float(d[i]), float(r[i]), bool(skip[i] > 0))
        for i in range(c.shape[0])
    )


def _sag_spec(r2, c: float, k: float, ai: tuple):
    """sag_r2 with static (c, k, ai): dead terms vanish at trace time."""
    n_ai = max((i + 1 for i, a in enumerate(ai) if a != 0.0), default=0)
    out = None
    if c != 0.0:
        sf = jnp.sqrt(jnp.maximum(1.0 - (1.0 + k) * r2 * (c * c), 1e-24))
        out = r2 * c / (1.0 + sf)
    if n_ai:
        poly = jnp.full_like(r2, ai[n_ai - 1])
        for i in range(n_ai - 2, -1, -1):
            poly = poly * r2 + ai[i]
        out = poly * r2 if out is None else out + poly * r2
    return jnp.zeros_like(r2) if out is None else out


def _dsag_spec(r2, c: float, k: float, ai: tuple):
    """dsag_dr2 with static (c, k, ai)."""
    n_ai = max((i + 1 for i, a in enumerate(ai) if a != 0.0), default=0)
    out = None
    if c != 0.0:
        cc = c * c
        sf = jnp.sqrt(jnp.maximum(1.0 - (1.0 + k) * r2 * cc, 1e-24))
        out = (1.0 + sf + (1.0 + k) * r2 * cc / (2.0 * sf)) * c / (1.0 + sf) ** 2
    if n_ai:
        poly = jnp.full_like(r2, n_ai * ai[n_ai - 1])
        for i in range(n_ai - 2, -1, -1):
            poly = poly * r2 + (i + 1) * ai[i]
        out = poly if out is None else out + poly
    return jnp.zeros_like(r2) if out is None else out


def _valid_loose_spec(r2, c: float, k: float):
    if c == 0.0:
        return jnp.ones(r2.shape, bool)
    denom = c * c * (1.0 + k)
    if denom == 0.0:
        return jnp.ones(r2.shape, bool) if k > -1.0 else r2 > 0.0
    bound = (1.0 - EPSILON) / denom
    return r2 < bound if k > -1.0 else r2 > 0.0


def _valid_tight_spec(r2, c: float, k: float, r_ap: float):
    in_ap = r2 < r_ap * r_ap
    if c == 0.0:
        return in_ap
    denom = c * c * (1.0 + k)
    if k > -1.0 and denom != 0.0:
        return in_ap & (r2 < (1.0 - EPSILON) / denom)
    return in_ap


def _surface_step_spec(o, dvec, ra, obliq, kind: int, c: float, k: float,
                       ai: tuple, d_surf: float, r_ap: float, skip: bool,
                       eta, maxiter: int):
    """One specialized surface step. Value-parity with surface_step
    (no gradient re-attach — this path is for value-only workloads)."""
    dz = dvec[..., 2]
    t0 = (d_surf - o[..., 2]) / dz
    live = ra > 0

    if kind == KIND_STOP and c == 0.0 and not any(ai):
        # plane: Newton converges at the seed; ft == 0 identically
        t = t0
        new_o = o + dvec * t[..., None]
        r2n = new_o[..., 0] ** 2 + new_o[..., 1] ** 2
        valid = (jnp.sqrt(r2n) <= r_ap) & live
    else:
        dxy2 = dvec[..., 0] ** 2 + dvec[..., 1] ** 2
        doxy = dvec[..., 0] * o[..., 0] + dvec[..., 1] * o[..., 1]

        def ft_dfdt(t, tight: bool):
            new_o = o + dvec * t[..., None]
            x, y = new_o[..., 0], new_o[..., 1]
            r2_raw = x * x + y * y
            if tight:
                valid = _valid_tight_spec(r2_raw, c, k, r_ap)
            else:
                valid = _valid_loose_spec(r2_raw, c, k)
            valid = valid & live
            m = valid.astype(x.dtype)
            r2 = (x * m) ** 2 + (y * m) ** 2
            ft = _sag_spec(r2, c, k, ai) + d_surf - new_o[..., 2]
            dfdt = _dsag_spec(r2, c, k, ai) * (2.0 * (dxy2 * t + doxy)) - dz
            return ft, dfdt

        t = _sphere_seed(o, dvec, c, d_surf, t0)
        if kind == KIND_ASPHERIC or k != 0.0 or any(ai):
            for _ in range(maxiter):
                ft, dfdt = ft_dfdt(t, tight=False)
                t = t - jnp.clip(ft / (dfdt + EPSILON),
                                 -NEWTON_STEP_BOUND, NEWTON_STEP_BOUND)
        # final tight-masked polish (the re-attach step of _newton_t, values
        # only; for pure spherics the closed-form seed already solves ft=0
        # so this is the only polish needed). NOTE _newton_t's tolerance
        # residual is the ft at the PRE-polish t — keep that exactly.
        ft_d, dfdt = ft_dfdt(t, tight=True)
        t = t - jnp.clip(ft_d / (dfdt + EPSILON),
                         -NEWTON_STEP_BOUND, NEWTON_STEP_BOUND)

        new_o = o + dvec * t[..., None]
        r2n = new_o[..., 0] ** 2 + new_o[..., 1] ** 2
        if kind == KIND_ASPHERIC:
            valid = (_valid_tight_spec(r2n, c, k, r_ap)
                     & (jnp.abs(ft_d) < NEWTON_TOL_TIGHT) & live & (t > 0))
        elif kind == KIND_SPHERIC:
            valid = (r2n <= r_ap * r_ap) & (t >= 0) & live
        else:
            valid = (jnp.sqrt(r2n) <= r_ap) & live

    o_out = jnp.where(valid[..., None], new_o, o)
    ra_mid = ra * valid.astype(ra.dtype)
    if skip:
        return o_out, dvec, ra_mid, obliq

    # refraction with the specialized surface normal
    m = (ra_mid > 0).astype(dvec.dtype)
    x = o_out[..., 0] * m
    y = o_out[..., 1] * m
    r2 = x * x + y * y
    ds = _dsag_spec(r2, c, k, ai)
    n = jnp.stack([ds * 2.0 * x, ds * 2.0 * y, -jnp.ones_like(x)], axis=-1)
    n = -normalize(n)   # forward orientation
    cosi = jnp.sum(dvec * n, axis=-1)
    valid_r = (cosi**2 > 0.1) & (eta**2 * (1.0 - cosi**2) < 1.0) & (ra_mid > 0)
    vm = valid_r.astype(dvec.dtype)
    sr = jnp.sqrt(1.0 - eta**2 * (1.0 - cosi[..., None] ** 2) * vm[..., None])
    new_d = sr * n + eta * (dvec - cosi[..., None] * n)
    new_d = jnp.where(valid_r[..., None], new_d, dvec)
    new_obliq = obliq * jnp.sum(new_d * dvec, axis=-1)
    return o_out, new_d, ra_mid * vm, new_obliq


def trace_rays_specialized(rays: Rays, desc: tuple, eta: jnp.ndarray,
                           maxiter: int = NEWTON_FAST_ITERS) -> Rays:
    """Forward trace with the surface loop unrolled over a STATIC lens
    description (static_surface_desc). Value-only (no lens-parameter
    gradients — use trace_rays for differentiable-optics work); opl/phi
    untouched (incoherent paths only).

    eta[S]: per-surface refraction ratios (traced; wavelength-dependent).
    """
    o, dvec, ra, obliq = rays.o, rays.d, rays.ra, rays.obliq
    for i, (kind, c, k, ai, d_surf, r_ap, skip) in enumerate(desc):
        o, dvec, ra, obliq = _surface_step_spec(
            o, dvec, ra, obliq, kind, c, k, ai, d_surf, r_ap, skip,
            eta[i], maxiter)
    return rays.replace(o=o, d=dvec, ra=ra, obliq=obliq)
