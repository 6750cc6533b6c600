"""DP splat parity: closed-form split weights and the bilinear accumulation
against reference golden dumps, plus matmul-vs-scatter self-consistency."""

import numpy as np
import pytest

from sdirt_tpu.dp.splat import (DPParams, dp_split_weights, forward_integral,
                                splat_matmul, splat_scatter)
from tests.conftest import GOLDEN_DIR


@pytest.fixture(scope="module")
def dp_golden():
    return dict(np.load(GOLDEN_DIR / "dp_weights.npz"))


def test_split_weights_small_r(dp_golden):
    x_tan = dp_golden["dp_small_r_x_tan"]
    w_l, w_r = dp_split_weights(x_tan, DPParams(h=0.78, f=1.44, w=0.3, r=0.5))
    np.testing.assert_allclose(np.asarray(w_l), dp_golden["dp_small_r_w_l"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_r), dp_golden["dp_small_r_w_r"],
                               rtol=1e-5, atol=1e-6)


def test_split_weights_big_r(dp_golden):
    x_tan = dp_golden["dp_big_r_x_tan"]
    w_l, w_r = dp_split_weights(x_tan, DPParams(h=0.78, f=1.44, w=0.3, r=0.7))
    np.testing.assert_allclose(np.asarray(w_l), dp_golden["dp_big_r_w_l"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_r), dp_golden["dp_big_r_w_r"],
                               rtol=1e-5, atol=1e-6)


def test_split_weights_energy_conservation():
    # Left+right should sum to the total pixel coverage and stay in [0, 1]
    x_tan = np.linspace(-2, 2, 1001).astype(np.float32)
    w_l, w_r = dp_split_weights(x_tan)
    w_l, w_r = np.asarray(w_l), np.asarray(w_r)
    assert (w_l >= -1e-6).all() and (w_r >= -1e-6).all()
    total = w_l + w_r
    # deposit = circle segments + (square-strip minus circle) margins, so the
    # ceiling is the unit pixel area, not the disk area
    assert total.max() <= 1.0 + 1e-4
    # Head-on rays split evenly
    w_l0, w_r0 = dp_split_weights(np.zeros(1, np.float32))
    assert abs(float(w_l0[0]) - float(w_r0[0])) < 1e-6


@pytest.mark.parametrize("golden_fix", ["golden_rf50", "golden_rf35"])
def test_forward_integral_parity(golden_fix, request, rf50_lens):
    """Feed the REFERENCE-traced rays into our integral: isolates splat math
    from trace noise; must match the reference PSF to f32 accumulation order."""
    golden = request.getfixturevalue(golden_fix)
    ps = 24.0 / 512
    psf_l, _ = forward_integral(golden["sensor_o_g"], golden["sensor_d_g"],
                                golden["sensor_ra_g"], ks=21, ps=ps,
                                pointc_ref=golden["psf_pointc"])
    ref = golden["psf_points_fixed_center"]
    np.testing.assert_allclose(np.asarray(psf_l), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("golden_fix", ["golden_rf50", "golden_rf35"])
def test_forward_integral_rms_center(golden_fix, request):
    golden = request.getfixturevalue(golden_fix)
    ps = 24.0 / 512
    psf_l, _ = forward_integral(golden["sensor_o_g"], golden["sensor_d_g"],
                                golden["sensor_ra_g"], ks=21, ps=ps,
                                pointc_ref=None)
    ref = golden["psf_points_rms_center"]
    np.testing.assert_allclose(np.asarray(psf_l), ref, rtol=1e-4, atol=1e-5)


def test_matmul_equals_scatter():
    rng = np.random.default_rng(3)
    spp, n, ks, ps = 1000, 5, 21, 24.0 / 512
    half = (ks / 2 - 0.5) * ps
    pts = rng.uniform(-half * 0.95, half * 0.95, (spp, n, 2)).astype(np.float32)
    w = rng.uniform(0, 1, (2, spp, n)).astype(np.float32)
    a = np.asarray(splat_matmul(pts, w, ks, ps, chunk=256))
    b = np.asarray(splat_scatter(pts, w, ks, ps))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    # mass conservation: all weight lands somewhere
    np.testing.assert_allclose(a.sum((-1, -2)), w.sum(1), rtol=1e-4)


