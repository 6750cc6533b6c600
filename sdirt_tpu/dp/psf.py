"""End-to-end dual-pixel PSF computation: one jitted graph from point sources
to normalized L/R PSF kernels.

Pipeline parity: /root/reference/deeplens/optics.py:934-996 (psf_diff) +
:888-914 (chief-ray center) + monte_carlo.forward_integral. The reference
dispatches trace, centering and a per-point Python splat loop as separate GPU
calls; here everything from pupil sampling to the normalized PSF fuses into a
single XLA program, so the TPU never waits on host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.constants import GEO_SPP
from ..optics.sampling import sample_from_points
from ..optics.surfaces import trace_rays, trace_rays_specialized
from .splat import DPParams, dp_split_weights, forward_integral, splat_matmul


@partial(jax.jit, static_argnames=("spp", "spp_chief", "ks", "center",
                                   "dp_params", "chunk", "use_matmul",
                                   "shard_rays", "static_desc"))
def dp_psf(stack, eta, skip, points_norm, key, scalars, *,
           spp: int, ks: int, spp_chief: int = GEO_SPP, center: bool = True,
           dp_params: DPParams = DPParams(), chunk: int = 2048,
           use_matmul: bool = True, shard_rays=None, static_desc=None):
    """Compute DP PSFs for normalized point sources.

    points_norm: [N, 3] with x,y in [-1,1] (sensor-normalized) and z = depth
        in mm (negative).
    scalars: dict of lens scalars — pupilz, pupilr, d_sensor, ps, hfov,
        r_last, sensor_h, sensor_w (traced, so pupil/sensor tweaks don't
        recompile).
    static_desc: optional static_surface_desc(...) tuple — unrolls the trace
        with compile-time surface constants (the throughput path; value-only,
        golden-parity-tested). None keeps the differentiable lax.scan trace.
    Returns (psf_l, psf_r): [N, ks, ks], max-normalized on the LEFT view per
        the reference (optics.py:984-987 normalizes the returned stack, and
        only the left PSF is returned by forward_integral).
    """
    if static_desc is not None:
        trace = lambda r: trace_rays_specialized(r, static_desc, eta)
    else:
        trace = lambda r: trace_rays(r, stack, eta, skip)
    pupilz, pupilr = scalars["pupilz"], scalars["pupilr"]
    d_sensor, ps = scalars["d_sensor"], scalars["ps"]
    hfov, r_last = scalars["hfov"], scalars["r_last"]
    sensor_h, sensor_w = scalars["sensor_h"], scalars["sensor_w"]

    # Perspective projection of normalized points to object space [mm]
    # (reference optics.py:955-960; x spans the sensor WIDTH, y the HEIGHT)
    depth = points_norm[:, 2]
    scale = -depth * jnp.tan(hfov) / r_last
    point_obj = jnp.stack([
        points_norm[:, 0] * scale * sensor_w / 2,
        points_norm[:, 1] * scale * sensor_h / 2,
        depth,
    ], axis=-1)

    k_chief, k_main = jax.random.split(key)

    if center:
        # Chief-ray PSF center: shrunken pupil (x0.25), centroid of survivors
        # (optics.py:898-904 with entrance_pupil(shrink_pupil=True))
        chief = sample_from_points(k_chief, point_obj, spp_chief, pupilz, pupilr * 0.25)
        chief = trace(chief).propagate_to(d_sensor)
        denom = chief.ra.sum(0)[..., None] + 1e-9
        centroid = (chief.o * chief.ra[..., None]).sum(0) / denom
        pointc = -centroid[..., :2]
    else:
        pointc = jnp.stack([
            points_norm[:, 0] * sensor_w / 2,
            points_norm[:, 1] * sensor_h / 2,
        ], axis=-1)

    rays = sample_from_points(k_main, point_obj, spp, pupilz, pupilr)
    if shard_rays is not None:
        # Multi-chip: split the Monte-Carlo ray axis across the 'rays' mesh
        # axis; the splat's contraction over rays then psum-reduces the PSF
        # grids over ICI (sharding-propagated by XLA).
        rays = shard_rays(rays)
    rays = trace(rays).propagate_to(d_sensor)

    psf_l, psf_r = forward_integral(rays.o, rays.d, rays.ra, ks=ks, ps=ps,
                                    pointc_ref=pointc, dp_params=dp_params,
                                    chunk=chunk, use_matmul=use_matmul)

    # Max-normalize each kernel (reference optics.py:984-987)
    def max_norm(p):
        return p / (p.max(axis=(-1, -2), keepdims=True) + 1e-6)

    return max_norm(psf_l), max_norm(psf_r)


@partial(jax.jit, static_argnames=("plan", "spp", "ks", "spp_chief",
                                   "center", "dp_params", "chunk"))
def dp_psf_fused(points_norm, key, scalars, plan, *, spp: int, ks: int,
                 spp_chief: int = GEO_SPP, center: bool = True,
                 dp_params: DPParams = DPParams(), chunk: int = 2048):
    """dp_psf with the trace stage running as ONE Pallas kernel per bundle.

    Same pipeline as dp_psf(static_desc=...) — perspective projection,
    chief-ray centering, Monte-Carlo trace, DP split, MXU matmul splat —
    but both traces (chief + main) run fused in VMEM (dp/fused_trace.py),
    so the 12-21 surface chain never round-trips HBM. Value parity with
    dp_psf is asserted by tests/test_fused_trace.py.

    plan: make_fused_plan(lens) — static; carries surfaces + per-surface eta.
    """
    from .fused_trace import fused_trace_sensor

    pupilz, pupilr = scalars["pupilz"], scalars["pupilr"]
    d_sensor, ps = scalars["d_sensor"], scalars["ps"]
    hfov, r_last = scalars["hfov"], scalars["r_last"]
    sensor_h, sensor_w = scalars["sensor_h"], scalars["sensor_w"]

    depth = points_norm[:, 2]
    scale = -depth * jnp.tan(hfov) / r_last
    point_obj = jnp.stack([
        points_norm[:, 0] * scale * sensor_w / 2,
        points_norm[:, 1] * scale * sensor_h / 2,
        depth,
    ], axis=-1)

    k_chief, k_main = jax.random.split(key)

    if center:
        chief = sample_from_points(k_chief, point_obj, spp_chief, pupilz,
                                   pupilr * 0.25)
        cpx, cpy, _, cra = fused_trace_sensor(chief, d_sensor, plan)
        denom = cra.sum(0) + 1e-9
        # fused px/py are already the flipped sensor coords, so the weighted
        # mean IS the dp_psf pointc (= -centroid of o)
        pointc = jnp.stack([(cpx * cra).sum(0) / denom,
                            (cpy * cra).sum(0) / denom], axis=-1)
    else:
        pointc = jnp.stack([points_norm[:, 0] * sensor_w / 2,
                            points_norm[:, 1] * sensor_h / 2], axis=-1)

    rays = sample_from_points(k_main, point_obj, spp, pupilz, pupilr)
    px, py, x_tan, ra = fused_trace_sensor(rays, d_sensor, plan)

    # forward_integral body on the pre-flipped outputs (splat.py:190-226)
    shifted = jnp.stack([px, py], axis=-1) - pointc[None]
    half = (ks / 2 - 0.5) * ps
    inside = (jnp.abs(shifted[..., 0]) < (half - 0.01 * ps)) & \
             (jnp.abs(shifted[..., 1]) < (half - 0.01 * ps))
    ra_m = ra * inside.astype(ra.dtype)
    shifted = shifted * ra_m[..., None]
    w_l, w_r = dp_split_weights(x_tan, dp_params)
    weights = jnp.stack([w_l * ra_m, w_r * ra_m], axis=0)
    psf = splat_matmul(shifted, weights, ks, ps, chunk=chunk)

    def max_norm(p):
        return p / (p.max(axis=(-1, -2), keepdims=True) + 1e-6)

    return max_norm(psf[0]), max_norm(psf[1])


def lens_scalars(lens) -> dict:
    """Collect the traced scalar bundle for dp_psf from a Lens."""
    pupilz, pupilr = lens.entrance_pupil()
    return {
        "pupilz": jnp.float32(pupilz),
        "pupilr": jnp.float32(pupilr),
        "d_sensor": jnp.float32(lens.d_sensor),
        "ps": jnp.float32(lens.pixel_size),
        "hfov": jnp.float32(lens.hfov),
        "r_last": jnp.float32(lens.r_last),
        "sensor_h": jnp.float32(lens.sensor_size[0]),
        "sensor_w": jnp.float32(lens.sensor_size[1]),
    }


def compute_psf(lens, points_norm, key=None, spp: int = GEO_SPP, ks: int = 31,
                wvln: float = 0.589, center: bool = True,
                dp_params: DPParams = DPParams(), both: bool = False):
    """Host-facing wrapper: PSFs for one lens at one wavelength.

    Returns the LEFT PSF [N, ks, ks] (reference behavior) or the (L, R) pair
    when both=True.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    eta, skip = lens.eta_arrays(wvln, True)
    psf_l, psf_r = dp_psf(lens.stack, eta, skip,
                          jnp.asarray(points_norm, jnp.float32), key,
                          lens_scalars(lens), spp=spp, ks=ks, center=center,
                          dp_params=dp_params)
    return (psf_l, psf_r) if both else psf_l


def compute_psf_rgb(lens, points_norm, key=None, spp: int = GEO_SPP,
                    ks: int = 31, center: bool = True,
                    dp_params: DPParams = DPParams()):
    """RGB PSF stack [N, 3, ks, ks] (reference optics.py:999-1015)."""
    from ..core.constants import WAVE_RGB

    key = jax.random.PRNGKey(0) if key is None else key
    keys = jax.random.split(key, 3)
    psfs = [compute_psf(lens, points_norm, keys[i], spp=spp, ks=ks,
                        wvln=w, center=center, dp_params=dp_params)
            for i, w in enumerate(WAVE_RGB)]
    return jnp.stack(psfs, axis=-3)
