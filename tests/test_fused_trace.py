"""Parity tests for the Pallas fused trace (dp/fused_trace.py).

The kernel must be value-exact against the specialized XLA trace
(trace_rays_specialized + propagate_to) for every VALID ray — invalid rays
are free to diverge because every consumer masks by ra before use. Runs in
interpret mode on CPU; the TPU-compiled path is exercised by bench/serving.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas: ~2 min on 1-core CPU

from sdirt_tpu.dp.fused_trace import fused_trace_sensor, make_fused_plan
from sdirt_tpu.dp.psf import dp_psf, lens_scalars
from sdirt_tpu.optics.sampling import sample_from_points
from sdirt_tpu.optics.surfaces import trace_rays_specialized


def _ref_outputs(lens, rays, wvln=0.589):
    eta, skip = lens.eta_arrays(wvln, True)
    desc = lens.static_desc()
    out = trace_rays_specialized(rays, desc, eta).propagate_to(lens.d_sensor)
    px = -out.o[..., 0]
    py = -out.o[..., 1]
    xt = -out.d[..., 0] / out.d[..., 2]
    return px, py, xt, out.ra


def _sample(lens, key, spp, depths):
    points = jnp.asarray(
        [[0.0, 0.0, depths[0]], [0.7, 0.3, depths[1 % len(depths)]],
         [-0.5, -0.9, depths[0]], [0.2, -0.4, depths[-1]]], jnp.float32)
    scal = lens_scalars(lens)
    scale = -points[:, 2] * jnp.tan(scal["hfov"]) / scal["r_last"]
    obj = jnp.stack([points[:, 0] * scale * scal["sensor_w"] / 2,
                     points[:, 1] * scale * scal["sensor_h"] / 2,
                     points[:, 2]], axis=-1)
    return sample_from_points(key, obj, spp, scal["pupilz"], scal["pupilr"])


@pytest.mark.parametrize("lens_fixture", ["rf50_lens", "rf35_lens"])
def test_fused_matches_specialized(lens_fixture, request):
    lens = request.getfixturevalue(lens_fixture)
    rays = _sample(lens, jax.random.PRNGKey(3), 192, (-1000.0, -2500.0))
    plan = make_fused_plan(lens, block_rows=64, interpret=True)
    px_f, py_f, xt_f, ra_f = fused_trace_sensor(rays, lens.d_sensor, plan)
    px_r, py_r, xt_r, ra_r = _ref_outputs(lens, rays)

    ra_f, ra_r = np.asarray(ra_f), np.asarray(ra_r)
    np.testing.assert_array_equal(ra_f, ra_r)
    assert ra_r.sum() > 0.5 * ra_r.size  # the bundle is mostly live
    m = ra_r > 0
    # Not bit-exact: FMA contraction / reassociation differ between the
    # fused component-wise graph and the vector XLA graph, compounding over
    # 12 Newton-polished surfaces to ~4e-5 relative. 5e-4 mm is ~1% of a
    # 512-res pixel (ps = 0.047 mm) — far inside the PSF L1 budget.
    for f, r in ((px_f, px_r), (py_f, py_r)):
        np.testing.assert_allclose(np.asarray(f)[m], np.asarray(r)[m],
                                   rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(xt_f)[m], np.asarray(xt_r)[m],
                               rtol=0, atol=5e-5)


def test_fused_padding_roundtrip(rf50_lens):
    """Ray counts not divisible by block_rows*128 pad and unpad cleanly."""
    rays = _sample(rf50_lens, jax.random.PRNGKey(11), 37, (-1200.0,))
    plan = make_fused_plan(rf50_lens, block_rows=8, interpret=True)
    px, py, xt, ra = fused_trace_sensor(rays, rf50_lens.d_sensor, plan)
    assert px.shape == rays.ra.shape == (37, 4)
    px_r, py_r, xt_r, ra_r = _ref_outputs(rf50_lens, rays)
    m = np.asarray(ra_r) > 0
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(ra_r))
    np.testing.assert_allclose(np.asarray(px)[m], np.asarray(px_r)[m],
                               atol=5e-4)


def test_fused_psf_pipeline_parity(rf50_lens):
    """End-to-end: PSFs built from fused-trace outputs match dp_psf."""
    lens = rf50_lens
    key = jax.random.PRNGKey(7)
    points = jnp.asarray([[0.0, 0.0, -1000.0], [0.5, -0.3, -3000.0]],
                         jnp.float32)
    scal = lens_scalars(lens)
    eta, skip = lens.eta_arrays(0.589, True)
    ref_l, ref_r = dp_psf(lens.stack, eta, skip, points, key, scal,
                          spp=512, ks=21, spp_chief=256,
                          static_desc=lens.static_desc())

    from sdirt_tpu.dp.psf import dp_psf_fused
    plan = make_fused_plan(lens, block_rows=64, interpret=True)
    fus_l, fus_r = dp_psf_fused(points, key, scal, plan, spp=512, ks=21,
                                spp_chief=256)
    for fus, ref in ((fus_l, ref_l), (fus_r, ref_r)):
        fus, ref = np.asarray(fus), np.asarray(ref)
        np.testing.assert_allclose(fus, ref, atol=2e-3)
        assert np.abs(fus - ref).mean() < 1e-4  # PSF L1 well under budget
