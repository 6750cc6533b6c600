"""Ray-trace parity against reference PyTorch-CPU golden dumps.

The fixtures in tests/golden/*.npz were produced by
tests/golden/generate_golden.py running /root/reference on CPU with fixed
deterministic ray sets, so any drift here is a numerics bug, not RNG noise.
"""

import numpy as np
import pytest

from sdirt_tpu.core.rays import Rays


def _traced_sensor(lens, golden, wvln_name, wvln):
    pts = golden["trace_points"]
    pupil_xy = golden["trace_pupil_xy"]
    spp = pupil_xy.shape[0]
    pupilz, _ = lens.entrance_pupil()
    o = np.broadcast_to(pts[None], (spp, pts.shape[0], 3)).copy()
    o2 = np.concatenate([pupil_xy, np.full((spp, 1), pupilz, np.float32)], -1)
    d = o2[:, None, :] - o
    rays = Rays.create(o, d)
    return lens.trace2sensor(rays, wvln=wvln)


@pytest.mark.parametrize("lens_fix,golden_fix", [("rf50_lens", "golden_rf50"),
                                                 ("rf35_lens", "golden_rf35")])
class TestGeometry:
    def test_aperture_index(self, lens_fix, golden_fix, request):
        lens = request.getfixturevalue(lens_fix)
        golden = request.getfixturevalue(golden_fix)
        assert lens.aper_idx == int(golden["aper_idx"])

    def test_pupils(self, lens_fix, golden_fix, request):
        lens = request.getfixturevalue(lens_fix)
        golden = request.getfixturevalue(golden_fix)
        ez, er = lens.entrance_pupil()
        gz, gr = golden["entrance_pupil"]
        assert ez == pytest.approx(gz, rel=2e-3, abs=2e-3)
        assert er == pytest.approx(gr, rel=5e-3)
        xz, xr = lens.exit_pupil()
        gz, gr = golden["exit_pupil"]
        assert xz == pytest.approx(gz, rel=2e-3, abs=2e-3)
        assert xr == pytest.approx(gr, rel=5e-3)

    def test_fov_foclen_fnum(self, lens_fix, golden_fix, request):
        lens = request.getfixturevalue(lens_fix)
        golden = request.getfixturevalue(golden_fix)
        assert lens.hfov == pytest.approx(float(golden["hfov"]), rel=1e-3)
        assert lens.foclen == pytest.approx(float(golden["foclen"]), rel=1e-3)
        assert lens.fnum == pytest.approx(float(golden["fnum"]), rel=5e-3)

    def test_principal_planes(self, lens_fix, golden_fix, request):
        lens = request.getfixturevalue(lens_fix)
        golden = request.getfixturevalue(golden_fix)
        fp, bp = lens.calc_principal()
        gfp, gbp = golden["principal"]
        assert fp == pytest.approx(gfp, abs=5e-3)
        assert bp == pytest.approx(gbp, abs=5e-3)

    @pytest.mark.parametrize("wvln_name,wvln", [("g", 0.589), ("r", 0.656), ("b", 0.486)])
    def test_forward_trace_sensor(self, lens_fix, golden_fix, wvln_name, wvln, request):
        lens = request.getfixturevalue(lens_fix)
        golden = request.getfixturevalue(golden_fix)
        rays = _traced_sensor(lens, golden, wvln_name, wvln)

        ra_ref = golden[f"sensor_ra_{wvln_name}"]
        o_ref = golden[f"sensor_o_{wvln_name}"]
        d_ref = golden[f"sensor_d_{wvln_name}"]
        ra = np.asarray(rays.ra)
        # Validity must agree exactly
        np.testing.assert_array_equal(ra, ra_ref)
        m = ra_ref > 0
        # Newton's tight tolerance is 10nm/surface and the reference's while
        # loop may stop earlier than our fixed iteration count, so positions
        # agree to the accumulated tolerance band (~0.5um << 1/50 pixel).
        err_o = np.abs(np.asarray(rays.o)[m] - o_ref[m]).max()
        err_d = np.abs(np.asarray(rays.d)[m] - d_ref[m]).max()
        assert err_o < 5e-4, err_o
        assert err_d < 5e-6, err_d

    def test_obliquity(self, lens_fix, golden_fix, request):
        lens = request.getfixturevalue(lens_fix)
        golden = request.getfixturevalue(golden_fix)
        rays = _traced_sensor(lens, golden, "g", 0.589)
        m = golden["sensor_ra_g"] > 0
        err = np.abs(np.asarray(rays.obliq)[m] - golden["sensor_obliq_g"][m]).max()
        # obliq is a product of ~12-21 cosine factors, each with f32 rounding
        # and a Newton-tolerance-band path difference
        assert err < 2e-4, err

    def test_backward_trace(self, lens_fix, golden_fix, request):
        lens = request.getfixturevalue(lens_fix)
        golden = request.getfixturevalue(golden_fix)
        # Use the golden pupil so the input rays are bit-identical to the dump
        ez, er = golden["exit_pupil"]
        er = er * 0.25
        mb = 32
        o1 = np.tile(np.array([lens.r_last, 0.0, lens.d_sensor], np.float32), (mb, 1))
        x2 = np.linspace(-er, er, mb).astype(np.float32)
        o2 = np.stack([x2, np.zeros(mb, np.float32), np.full(mb, ez, np.float32)], -1)
        rays = Rays.create(o1, o2 - o1)
        rays = lens.trace(rays, forward=False)
        np.testing.assert_array_equal(np.asarray(rays.ra), golden["back_ra"])
        m = golden["back_ra"] > 0
        assert np.abs(np.asarray(rays.o)[m] - golden["back_o"][m]).max() < 5e-4
        assert np.abs(np.asarray(rays.d)[m] - golden["back_d"][m]).max() < 1e-5

    def test_refocus(self, lens_fix, golden_fix, request):
        # Refocus uses random surface samples; the least-squares focus position
        # is statistically stable, so compare with a loose tolerance.
        import copy

        lens = request.getfixturevalue(lens_fix)
        golden = request.getfixturevalue(golden_fix)
        lens2 = copy.copy(lens)
        lens2._pupil_cache = dict(lens._pupil_cache)
        override = 62.25 if "50" in lens.lens_name else 80.447
        lens2.d_sensor = override
        lens2.refocus(-1000 + override)
        assert lens2.d_sensor == pytest.approx(float(golden["d_sensor_refocused"]), abs=2e-2)
        assert lens2.hfov == pytest.approx(float(golden["hfov_refocused"]), rel=2e-3)


@pytest.mark.parametrize("lens_fix,golden_fix", [("rf50_lens", "golden_rf50"),
                                                 ("rf35_lens", "golden_rf35")])
class TestSpecializedTrace:
    """trace_rays_specialized (static unrolled throughput path) must match
    both the reference goldens and the differentiable scan trace."""

    @pytest.mark.parametrize("wvln_name,wvln", [("g", 0.589), ("b", 0.486)])
    def test_specialized_trace_matches_golden_and_scan(
            self, lens_fix, golden_fix, wvln_name, wvln, request):
        from sdirt_tpu.optics.surfaces import trace_rays_specialized

        lens = request.getfixturevalue(lens_fix)
        golden = request.getfixturevalue(golden_fix)

        pts = golden["trace_points"]
        pupil_xy = golden["trace_pupil_xy"]
        spp = pupil_xy.shape[0]
        pupilz, _ = lens.entrance_pupil()
        o = np.broadcast_to(pts[None], (spp, pts.shape[0], 3)).copy()
        o2 = np.concatenate([pupil_xy, np.full((spp, 1), pupilz, np.float32)], -1)
        rays_in = Rays.create(o, o2[:, None, :] - o)

        eta, _ = lens.eta_arrays(wvln, True)
        out = trace_rays_specialized(rays_in, lens.static_desc(), eta)
        out = out.propagate_to(lens.d_sensor)
        scan = lens.trace2sensor(rays_in, wvln=wvln)

        # vs reference goldens: identical bar to the scan path's test
        ra_ref = golden[f"sensor_ra_{wvln_name}"]
        np.testing.assert_array_equal(np.asarray(out.ra), ra_ref)
        m = ra_ref > 0
        assert np.abs(np.asarray(out.o)[m] - golden[f"sensor_o_{wvln_name}"][m]).max() < 5e-4
        assert np.abs(np.asarray(out.d)[m] - golden[f"sensor_d_{wvln_name}"][m]).max() < 5e-6

        # vs the scan trace: same validity, positions within the Newton
        # tolerance band (the spheric seed solves exactly; the scan path
        # stops after its fixed iterations)
        np.testing.assert_array_equal(np.asarray(out.ra), np.asarray(scan.ra))
        assert np.abs(np.asarray(out.o)[m] - np.asarray(scan.o)[m]).max() < 2e-4
        assert np.abs(np.asarray(out.obliq)[m] - np.asarray(scan.obliq)[m]).max() < 2e-4
