"""Physics property tests for the optical stack — invariants that hold for
any correct ray tracer, independent of the reference implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdirt_tpu.core.rays import Rays
from sdirt_tpu.optics.surfaces import trace_rays
from tests.conftest import RF50


@pytest.fixture(scope="module")
def lens():
    from sdirt_tpu.optics.lens import Lens

    return Lens(RF50, sensor_res=(512, 768))


def test_directions_stay_unit(lens):
    rays = lens.sample_from_points(jax.random.PRNGKey(0),
                                   np.array([[3, -2, -1500.0]], np.float32), spp=512)
    out = lens.trace(rays)
    norms = np.linalg.norm(np.asarray(out.d), axis=-1)
    ra = np.asarray(out.ra)
    np.testing.assert_allclose(norms[ra > 0], 1.0, atol=1e-5)


def test_snell_at_each_surface(lens):
    """n1 sin(theta1) == n2 sin(theta2) across the first glass surface."""
    rays = lens.sample_from_points(jax.random.PRNGKey(1),
                                   np.array([[0, 0, -1000.0]], np.float32), spp=256)
    out, os_, ras = lens.trace(rays, record=True)
    # directions before/after surface 0: incident = initial d
    d_in = np.asarray(rays.d)[:, 0]
    # reconstruct outgoing direction from recorded positions at surfaces 0->1
    os_ = np.asarray(os_).squeeze(2)        # [S, spp, 3] (N=1 squeezed)
    ras = np.asarray(ras).squeeze(2)        # [S, spp]
    p0 = os_[0]
    p1 = os_[1]
    d_out = p1 - p0
    d_out /= np.linalg.norm(d_out, axis=-1, keepdims=True)

    # surface normal at hit point of the first (spheric) surface
    c = float(np.asarray(lens.stack.c)[0])
    center = np.array([0.0, 0.0, float(np.asarray(lens.stack.d)[0]) + 1.0 / c])
    n = (p0 - center)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)

    n1 = lens.materials[0].ior(0.589)
    n2 = lens.materials[1].ior(0.589)
    sin1 = np.linalg.norm(np.cross(d_in, n), axis=-1)
    sin2 = np.linalg.norm(np.cross(d_out, n), axis=-1)
    m = ras[0] > 0
    np.testing.assert_allclose(n1 * sin1[m], n2 * sin2[m], atol=2e-4)


def test_forward_backward_roundtrip(lens):
    """Trace forward to the sensor, reverse the rays, trace backward: rays
    must return to their entrance positions (reversibility of ray optics)."""
    pts = np.array([[0.0, 0.0, -1000.0]], np.float32)
    rays = lens.sample_from_points(jax.random.PRNGKey(2), pts, spp=128)
    fwd = lens.trace(rays)
    fwd_sensor = fwd.propagate_to(lens.d_sensor)

    back = Rays.create(np.asarray(fwd_sensor.o), -np.asarray(fwd_sensor.d),
                       ra=np.asarray(fwd_sensor.ra))
    bwd = lens.trace(back, forward=False)
    # propagate back to the original z-plane of the first intersection with
    # the entrance pupil cone: compare against the source point
    bwd = bwd.propagate_to(-1000.0)
    m = (np.asarray(bwd.ra) > 0) & (np.asarray(fwd_sensor.ra) > 0)
    assert m.sum() > 50
    err = np.abs(np.asarray(bwd.o)[..., :2][m]).max()   # source at (0, 0)
    assert err < 5e-3, err   # 5 um back at the source point


def test_energy_monotonicity(lens):
    """Validity count can only decrease through the system, and obliq stays
    in (0, 1] (products of cosines of bend angles)."""
    rays = lens.sample_from_points(jax.random.PRNGKey(3),
                                   np.array([[20, 15, -800.0]], np.float32), spp=512)
    out, os_, ras = lens.trace(rays, record=True)
    counts = np.asarray(ras).sum(axis=(1, 2))
    assert (np.diff(counts) <= 1e-6).all(), counts
    obliq = np.asarray(out.obliq)
    m = np.asarray(out.ra) > 0
    assert (obliq[m] > 0).all() and (obliq[m] <= 1 + 1e-6).all()


def test_dispersion_ordering(lens):
    """Blue light bends more: focus distance (refocus target) ordering
    follows wavelength for a positive lens."""
    import dataclasses

    pts = np.array([[0.0, 0.0, -1000.0]], np.float32)
    focii = {}
    for wvln in (0.486, 0.589, 0.656):
        rays = lens.sample_from_points(jax.random.PRNGKey(4), pts, spp=512)
        out = lens.trace(rays, wvln=wvln)
        dx, dy = np.asarray(out.d[..., 0]), np.asarray(out.d[..., 1])
        ox, oy = np.asarray(out.o[..., 0]), np.asarray(out.o[..., 1])
        oz, dz = np.asarray(out.o[..., 2]), np.asarray(out.d[..., 2])
        ra = np.asarray(out.ra)
        t = (dx * ox + dy * oy) / (dx**2 + dy**2)
        f = (oz - dz * t)[ra > 0]
        focii[wvln] = np.mean(f[np.isfinite(f)])
    # shorter wavelength -> higher index -> focuses closer to the lens
    assert focii[0.486] < focii[0.589] < focii[0.656], focii


@pytest.mark.slow
def test_grad_matches_fd_wrt_curvature(lens):
    """Exactness of the stop-gradient re-attached Newton derivative."""
    import dataclasses

    eta, skip = lens.eta_arrays(0.589, True)
    rays = lens.sample_from_points(jax.random.PRNGKey(5),
                                   np.array([[0, 0, -1000.0]], np.float32), spp=128)

    def spot(c3):
        stack = dataclasses.replace(lens.stack, c=lens.stack.c.at[3].set(c3))
        out = trace_rays(rays, stack, eta, skip).propagate_to(lens.d_sensor)
        m = out.ra
        xy = out.o[..., :2]
        ctr = (xy * m[..., None]).sum(0) / (m.sum(0) + 1e-9)
        return jnp.sum(((xy - ctr) ** 2) * m[..., None]) / (m.sum() + 1e-9)

    c0 = lens.stack.c[3]
    g = float(jax.grad(spot)(c0))
    # larger eps keeps f32 roundoff (~1e-7 on the loss) below truncation
    eps = 1e-4
    fd = (float(spot(c0 + eps)) - float(spot(c0 - eps))) / (2 * eps)
    assert g == pytest.approx(fd, rel=2e-2), (g, fd)


def test_pupils_self_consistent_with_real_rays(lens):
    """Ray-transfer-matrix pupils vs the real system: a ray aimed from an
    off-axis object point at the entrance-pupil CENTER must cross the optical
    axis very near the stop plane (the pupil is the stop's image), and the
    same must hold backward from the sensor through the exit pupil."""
    pupilz, _ = lens.entrance_pupil()
    aper_z = float(np.asarray(lens.stack.d)[lens.aper_idx])

    # small field angle keeps aberrations below the paraxial prediction
    o = np.array([[2.0, 0.0, -4000.0]], np.float32)
    d = np.array([[pupilz - (-4000.0), 0.0, 0.0]], np.float32)
    d[:, 2] = d[:, 0]          # direction toward (0, 0, pupilz)
    d[:, 0] = -o[0, 0]
    rays = Rays.create(np.tile(o, (4, 1)), np.tile(d, (4, 1)))
    out, os_, ras = lens.trace(rays, record=True)
    os_, ras = np.asarray(os_), np.asarray(ras)

    # recorded positions bracket the stop plane: interpolate x at aper_z
    i = lens.aper_idx
    p0, p1 = os_[i - 1][ras[i - 1] > 0], os_[i][ras[i] > 0]
    assert p0.size and p1.size
    t = (aper_z - p0[:, 2]) / (p1[:, 2] - p0[:, 2])
    x_at_stop = p0[:, 0] + t * (p1[:, 0] - p0[:, 0])
    # chief ray through the EP center passes within ~1% of the stop radius
    aper_r = float(np.asarray(lens.stack.r)[lens.aper_idx])
    assert np.abs(x_at_stop).max() < 0.02 * aper_r, x_at_stop


def test_sample_parallel_vignetting(lens):
    """Pupil-grid parallel rays: on-axis mostly valid, steep angle mostly
    vignetted (reference optics.py:277-362 usage)."""
    r0 = lens.sample_parallel(jax.random.PRNGKey(0), fov_deg=0.0, M=9)
    v0 = float(np.asarray(lens.trace(r0).ra).mean())
    # within the 23.5deg half-FoV vignetting is mild on this lens; far beyond
    # it the bundle must collapse
    r1 = lens.sample_parallel(jax.random.PRNGKey(0), fov_deg=40.0, M=9)
    v1 = float(np.asarray(lens.trace(r1).ra).mean())
    assert v0 > 0.5 and v1 < 0.2, (v0, v1)
