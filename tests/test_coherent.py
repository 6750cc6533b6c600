"""Coherent PSF accumulation: phase bookkeeping and interference physics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdirt_tpu.dp.coherent import coherent_psf
from sdirt_tpu.dp.splat import splat_matmul
from tests.conftest import RF50

WVLN = 0.589


def _rays_at(xy, n_rays):
    """n_rays rays all landing exactly at sensor offset xy (mm)."""
    o = np.zeros((n_rays, 1, 3), np.float32)
    o[..., 0] = -xy[0]          # splat flips the sensor coordinates
    o[..., 1] = -xy[1]
    return o


def test_zero_phase_equals_squared_incoherent():
    """Equal phase on every ray: coherent intensity is the square of the
    incoherent deposit, pixel by pixel (re = sum w, im = 0)."""
    rng = np.random.default_rng(0)
    spp, ks, ps = 256, 7, 0.05
    o = np.zeros((spp, 1, 3), np.float32)
    o[..., :2] = rng.uniform(-2.2 * ps, 2.2 * ps, (spp, 1, 2))
    ra = np.ones((spp, 1), np.float32)
    phi = np.full((spp, 1), 1.2345, np.float32)

    pc = np.zeros((1, 2), np.float32)
    psf_c = np.asarray(coherent_psf(jnp.asarray(o), jnp.asarray(ra),
                                    jnp.asarray(phi), ks, ps, pc))
    shifted = jnp.asarray(-o[..., :2] - pc[None])
    psf_i = np.asarray(splat_matmul(shifted, jnp.asarray(ra)[None], ks, ps))[0]
    np.testing.assert_allclose(psf_c[0], psf_i[0] ** 2, rtol=1e-4, atol=1e-4)


def test_destructive_interference_cancels():
    """Two equal ray bundles with a pi phase difference landing on the same
    pixel: coherent intensity vanishes; in-phase bundles add as (2n)^2."""
    n = 64
    o = np.concatenate([_rays_at((0.0, 0.0), n)] * 2, axis=0)
    ra = np.ones((2 * n, 1), np.float32)
    phi = np.zeros((2 * n, 1), np.float32)
    phi[n:] = np.pi                 # half-wave retard on the second bundle
    phi += 0.7                      # common phase must not matter

    pc = np.zeros((1, 2), np.float32)
    psf = np.asarray(coherent_psf(jnp.asarray(o), jnp.asarray(ra),
                                  jnp.asarray(phi), 5, 0.05, pc))
    psf_con = np.asarray(coherent_psf(jnp.asarray(o), jnp.asarray(ra),
                                      jnp.full_like(jnp.asarray(phi), 0.7),
                                      5, 0.05, pc))
    assert psf_con.max() > 1e4                  # (2n)^2 concentration
    assert psf.max() < 1e-2 * psf_con.max(), (psf.max(), psf_con.max())


def test_coherent_trace_through_lens():
    """End-to-end coherent pipeline on the real lens from a FAR object:
    opl carries the geometric path (~object distance), phi stays f32-clean
    (per-surface reduction), and the coherent PSF is finite with energy
    comparable to the incoherent ray count."""
    from sdirt_tpu.optics.lens import Lens
    from sdirt_tpu.optics.surfaces import trace_rays

    lens = Lens(RF50, sensor_res=(512, 768))
    rays = lens.sample_from_points(jax.random.PRNGKey(0),
                                   np.array([[0, 0, -10000.0]], np.float32),
                                   spp=512)
    eta, skip = lens.eta_arrays(WVLN, True)
    n_in = lens.n_in_array(WVLN, True)
    out = trace_rays(rays, lens.stack, eta, skip, n_in=n_in, coherent=True,
                     wvln=WVLN).propagate_to(lens.d_sensor, wvln=WVLN)
    ra = np.asarray(out.ra)
    opl, phi = np.asarray(out.opl), np.asarray(out.phi)
    m = ra > 0
    assert m.sum() > 100
    # opl: object distance + ~60-90 mm through the lens to the sensor
    assert (opl[m] > 10000).all() and (opl[m] < 10200).all()
    # phi: finite, non-negative, with genuine spread (defocused far point)
    assert np.isfinite(phi[m]).all() and (phi[m] >= 0).all()
    assert phi[m].std() > 0.1, phi[m].std()

    psf = np.asarray(coherent_psf(out.o, out.ra, out.phi, 21,
                                  lens.pixel_size))
    assert psf.shape == (1, 21, 21) and np.isfinite(psf).all()
    assert psf.max() > 0
    # sanity: total coherent intensity can't exceed the fully-constructive
    # bound (sum of deposits)^2
    assert psf.sum() <= float(m.sum()) ** 2


def test_incoherent_trace_has_no_phase_cost():
    """Default (incoherent) tracing leaves opl/phi untouched at zero —
    the coherent bookkeeping is fully gated."""
    from sdirt_tpu.optics.lens import Lens

    lens = Lens(RF50, sensor_res=(512, 768))
    rays = lens.sample_from_points(jax.random.PRNGKey(1),
                                   np.array([[0, 0, -1000.0]], np.float32),
                                   spp=64)
    out = lens.trace(rays)
    assert float(jnp.abs(out.opl).max()) == 0.0
    assert float(jnp.abs(out.phi).max()) == 0.0


def test_coherent_psf_grid_interference_rings():
    """Full-aperture defocus through the real lens: the pupil-grid
    quadrature coherent PSF carries multi-path interference oscillations
    (spherical aberration folds the pupil->sensor map), while the
    incoherent PSF from the SAME rays is a smooth disk."""
    from sdirt_tpu.dp.coherent import coherent_psf_grid
    from sdirt_tpu.optics.lens import Lens

    lens = Lens(RF50, sensor_res=(512, 768))
    lens.refocus(-1000 + lens.d_sensor)
    coh, inc = coherent_psf_grid(lens, -1300.0, grid=1, ks=33, M=192,
                                 ps=0.003)
    coh, inc = np.asarray(coh), np.asarray(inc)
    assert coh.shape == inc.shape == (1, 1, 33, 33)
    assert np.isfinite(coh).all() and np.isfinite(inc).all()
    assert coh.max() == pytest.approx(1.0) and inc.max() == pytest.approx(1.0)

    from apps.coherent_demo import radial_profile, ring_contrast

    def osc(psf):
        return ring_contrast(radial_profile(psf, nbins=16))

    assert osc(coh[0, 0]) > 1.5 * osc(inc[0, 0]), \
        (osc(coh[0, 0]), osc(inc[0, 0]))


def test_pupil_grid_sampler_masks_disk():
    """sample_from_points_grid: static shape, disk-masked validity, and a
    quadrature fill factor near pi/4."""
    from sdirt_tpu.optics.sampling import sample_from_points_grid

    pts = np.array([[0.0, 0.0, -1000.0]], np.float32)
    rays = sample_from_points_grid(pts, M=64, pupilz=10.0, pupilr=6.0)
    assert rays.o.shape == (64 * 64, 1, 3)
    fill = float(np.asarray(rays.ra).mean())
    assert abs(fill - np.pi / 4) < 0.02, fill


def test_interference_image_composite():
    """App-level imaging mode: the coherent and incoherent composites agree
    in total energy (same rays, same emitters) but differ in structure, and
    the isolated probe shows stronger ring oscillation coherently."""
    from apps.coherent_demo import (interference_image, radial_profile,
                                    ring_contrast)
    from sdirt_tpu.optics.lens import Lens

    lens = Lens(RF50, sensor_res=(512, 768))
    lens.refocus(-1000 + lens.d_sensor)
    img_c, img_i, probes = interference_image(
        lens, depths=(-1300.0,), ks=33, ps=0.003, M=96, h=128, w=160)
    assert img_c.shape == img_i.shape == (128, 160)
    assert np.isfinite(img_c).all() and np.isfinite(img_i).all()
    # unit-sum PSFs conserve per-layer energy up to edge losses
    assert img_c.sum() == pytest.approx(img_i.sum(), rel=0.05)
    py, px, _ = probes[0]
    r = 16
    crop_c = img_c[py - r: py + r + 1, px - r: px + r + 1]
    crop_i = img_i[py - r: py + r + 1, px - r: px + r + 1]
    osc_c = ring_contrast(radial_profile(crop_c, nbins=16))
    osc_i = ring_contrast(radial_profile(crop_i, nbins=16))
    assert osc_c > 1.2 * osc_i, (osc_c, osc_i)
