"""Ray-bundle generators.

Parity source: /root/reference/deeplens/optics.py:216-594. All randomness is
explicit (threefry keys); the reference used implicit torch RNG, so parity
tests inject fixed pupil samples instead of comparing random draws.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rays import Rays


def sample_disk(key, shape, radius):
    """Uniform samples on a disk of given radius, shape [..., 2]."""
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, shape) * 2.0 * jnp.pi
    r = jnp.sqrt(jax.random.uniform(k2, shape) * radius**2)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_from_points(key, points, spp: int, pupilz: float, pupilr: float) -> Rays:
    """spp rays per point source through the entrance pupil disk.

    points: [N, 3] un-normalized object positions. Returns rays of shape
    [spp, N]. Each pupil sample is shared across the N points, matching the
    reference (optics.py:460-494: o2 has shape [spp, 3]).
    """
    points = jnp.asarray(points, jnp.float32)
    o = jnp.broadcast_to(points[None], (spp, *points.shape))
    xy2 = sample_disk(key, (spp,), pupilr)
    o2 = jnp.concatenate([xy2, jnp.full((spp, 1), pupilz, jnp.float32)], axis=-1)
    d = o2[:, None, :] - o
    return Rays.create(o, d)


def sample_from_points_grid(points, M: int, pupilz: float, pupilr: float) -> Rays:
    """M x M Cartesian pupil-grid quadrature rays per point source.

    Unlike the Monte-Carlo disk sampler above, a regular grid gives a proper
    2-D quadrature of the pupil field — required for COHERENT integration,
    where random sampling of a rapidly-varying phase produces speckle
    instead of the true diffraction pattern. Samples outside the pupil disk
    are invalidated via ra (not dropped, keeping the shape static for jit).
    Returns rays of shape [M*M, N].
    """
    points = jnp.asarray(points, jnp.float32)
    lin = (jnp.arange(M, dtype=jnp.float32) + 0.5) / M * 2.0 - 1.0
    gx, gy = jnp.meshgrid(lin * pupilr, lin * pupilr)
    xy2 = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)          # [M*M, 2]
    inside = (xy2**2).sum(-1) <= pupilr**2
    o = jnp.broadcast_to(points[None], (M * M, *points.shape))
    o2 = jnp.concatenate([xy2, jnp.full((M * M, 1), pupilz, jnp.float32)],
                         axis=-1)
    d = o2[:, None, :] - o
    rays = Rays.create(o, d)
    return rays.replace(ra=rays.ra * inside[:, None].astype(rays.ra.dtype))


def sample_pupil_stratified(key, res, spp: int, pupilr: float, pupilz: float,
                            num_angle: int = 8) -> jnp.ndarray:
    """Points on the pupil, stratified in (angle, r^2) sectors when possible.

    Returns [spp, H, W, 3] (reference optics.py:542-594).
    """
    H, W = res
    if spp % num_angle != 0 or spp >= 10000:
        xy = sample_disk(key, (spp, H, W), pupilr)
    else:
        num_r2 = spp // num_angle
        ka, kr = jax.random.split(key)
        dth = jax.random.uniform(ka, (num_angle, num_r2, H, W)) * 2 * jnp.pi / num_angle
        dr2 = jax.random.uniform(kr, (num_angle, num_r2, H, W)) * pupilr**2 / num_r2
        i = jnp.arange(num_angle, dtype=jnp.float32)[:, None, None, None]
        j = jnp.arange(num_r2, dtype=jnp.float32)[None, :, None, None]
        theta = dth + i * 2 * jnp.pi / num_angle
        r = jnp.sqrt(dr2 + j * pupilr**2 / num_r2)
        xy = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
        xy = xy.reshape(spp, H, W, 2)
    z = jnp.full((*xy.shape[:-1], 1), pupilz, jnp.float32)
    return jnp.concatenate([xy, z], axis=-1)


def sample_parallel_2d(R=None, view: float = 0.0, M: int = 15, z: float = 0.0,
                       forward: bool = True, pupil=None) -> Rays:
    """2D fan of parallel rays for setup plots / paraxial calcs
    (optics.py:217-274). pupil: optional (pupilz, pupilr) tuple."""
    view_rad = view / 57.3
    if pupil is not None:
        pupilz, pupilr = pupil
        x2 = np.linspace(-pupilr, pupilr, M) * 0.99
        o2 = np.stack([x2, np.zeros(M), np.full(M, pupilz)], axis=-1)
        d = np.stack([np.full(M, np.sin(view_rad)), np.zeros(M), np.full(M, np.cos(view_rad))], -1)
        if pupilz > 0:
            o = o2 - d * ((o2[:, 2:3] + 0.1) / d[:, 2:3])
        else:
            o = o2
        return Rays.create(o, d)

    x = np.linspace(-R, R, M)
    o = np.stack([x, np.zeros(M), np.full(M, z)], axis=-1)
    dz = np.cos(view_rad) if forward else -np.cos(view_rad)
    d = np.stack([np.full(M, np.sin(view_rad)), np.zeros(M), np.full(M, dz)], axis=-1)
    return Rays.create(o, d)


def sample_parallel(key, fov_deg: float, M: int, pupilz: float, pupilr: float,
                    sampling: str = "grid", forward: bool = True,
                    z: float | None = None):
    """Parallel-ray grid over the pupil at an incidence angle, [M, M]
    (reference optics.py:277-362; used for in-focus loss / RMS calcs)."""
    fov = np.radians(fov_deg)
    if sampling == "grid":
        x, y = np.meshgrid(np.linspace(-pupilr, pupilr, M),
                           np.linspace(pupilr, -pupilr, M), indexing="xy")
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
    elif sampling == "radial":
        xy = sample_disk(key, (M, M), pupilr)
        x, y = xy[..., 0], xy[..., 1]
    else:
        raise ValueError(f"Sampling method not implemented: {sampling}")
    o = jnp.stack([x, y, jnp.full_like(x, pupilz)], axis=-1)
    sgn = 1.0 if forward else -1.0
    d = jnp.stack([jnp.full_like(x, np.sin(fov)), jnp.zeros_like(x),
                   jnp.full_like(x, sgn * np.cos(fov))], axis=-1)
    rays = Rays.create(o, d)
    if z is not None:
        rays = rays.propagate_to(z)
    return rays


def sample_point_source_2d(depth: float, view: float = 0.0, M: int = 9,
                           pupil=(0.0, 1.0), start_z: float = -0.1) -> Rays:
    """2D point-source fan aimed at the pupil (optics.py:366-399)."""
    pupilz, pupilr = pupil
    x2 = np.linspace(-pupilr, pupilr, M) * 0.99
    o2 = np.stack([x2, np.zeros(M), np.full(M, pupilz)], axis=-1)
    o1 = np.zeros_like(o2)
    o1[:, 2] = depth
    o1[:, 0] = depth * np.tan(view / 57.3)
    rays = Rays.create(o1, o2 - o1)
    return rays.propagate_to(start_z)


def surface_sample(key, n: int, radius: float, z: float) -> jnp.ndarray:
    """Uniform points on a surface vertex plane, [N, 3] (surfaces.py:188-199)."""
    xy = sample_disk(key, (n,), radius)
    return jnp.concatenate([xy, jnp.full((n, 1), z, jnp.float32)], axis=-1)


def point_source_grid(depth: float, grid: int = 9, center: bool = False) -> np.ndarray:
    """Normalized [-1,1]^2 point grid at a depth, [grid, grid, 3]
    (optics.py:816-861)."""
    if grid == 1:
        x = y = np.array([[0.0]])
    elif center:
        hb = 1 / 2 / (grid - 1)
        x, y = np.meshgrid(np.linspace(-1 + hb, 1 - hb, grid),
                           np.linspace(1 - hb, -1 + hb, grid), indexing="xy")
    else:
        x, y = np.meshgrid(np.linspace(-0.98, 0.98, grid),
                           np.linspace(0.98, -0.98, grid), indexing="xy")
    z = np.full_like(x, depth)
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def sample_sensor(key, sensor_res, sensor_size, d_sensor: float, spp: int,
                  pupilz: float, pupilr: float):
    """Backward rays from every sensor pixel through the exit pupil,
    [spp, H, W] (reference optics.py:497-538; bottom-right pixel corners)."""
    import jax.numpy as jnp

    H, W = sensor_res
    x1, y1 = jnp.meshgrid(
        jnp.linspace(-sensor_size[1] / 2, sensor_size[1] / 2, W + 1)[1:],
        jnp.linspace(sensor_size[0] / 2, -sensor_size[0] / 2, H + 1)[1:],
        indexing="xy")
    o1 = jnp.stack([x1, y1, jnp.full_like(x1, d_sensor)], axis=-1)
    o2 = sample_pupil_stratified(key, (H, W), spp, pupilr, pupilz)
    o1 = jnp.broadcast_to(o1[None], o2.shape)
    from ..core.rays import Rays

    return Rays.create(o1, o2 - o1)
