"""Full PSF pipeline parity with shared ray sets: trace + chief centering +
DP splat + normalization vs the reference at the production (refocused)
rf50mm configuration. Target: L1 <= 1e-3 (BASELINE.json north star)."""

import numpy as np
import pytest

from sdirt_tpu.core.rays import Rays
from sdirt_tpu.dp.splat import DPParams, forward_integral
from sdirt_tpu.optics.lens import Lens
from tests.conftest import GOLDEN_DIR, RF50


@pytest.fixture(scope="module")
def psf_golden():
    return dict(np.load(GOLDEN_DIR / "psf_rf50mm.npz"))


@pytest.fixture(scope="module")
def refocused_lens(psf_golden):
    lens = Lens(RF50, sensor_res=(512, 768))
    # Pin the refocused sensor position to the golden value so the comparison
    # isolates trace+splat numerics from refocus RNG
    lens.d_sensor = float(psf_golden["d_sensor"])
    lens.post_computation()
    return lens


def _pipeline_psf(lens, golden, dp_params=None):
    pts = golden["points"]
    pupilz, pupilr = lens.entrance_pupil()

    depth = pts[:, 2]
    scale = -depth * np.tan(lens.hfov) / lens.r_last
    point_obj = pts.copy()
    point_obj[:, 0] = pts[:, 0] * scale * lens.sensor_size[1] / 2
    point_obj[:, 1] = pts[:, 1] * scale * lens.sensor_size[0] / 2

    def make_rays(pupil_xy, shrink):
        spp = pupil_xy.shape[0]
        xy = pupil_xy * (0.25 if shrink else 1.0)
        o = np.broadcast_to(point_obj[None], (spp, *point_obj.shape)).copy()
        o2 = np.concatenate([xy, np.full((spp, 1), pupilz, np.float32)], -1)
        return Rays.create(o, o2[:, None, :] - o)

    chief = lens.trace2sensor(make_rays(golden["pupil_chief"], True))
    denom = np.asarray(chief.ra).sum(0)[..., None] + 1e-9
    centroid = (np.asarray(chief.o) * np.asarray(chief.ra)[..., None]).sum(0) / denom
    pointc = -centroid[..., :2]

    rays = lens.trace2sensor(make_rays(golden["pupil_main"], False))
    psf_l, psf_r = forward_integral(
        rays.o, rays.d, rays.ra, ks=21, ps=lens.pixel_size,
        pointc_ref=pointc, dp_params=dp_params or DPParams())
    psf_l = np.asarray(psf_l)
    psf_l = psf_l / (psf_l.max((-1, -2), keepdims=True) + 1e-6)
    return pointc, psf_l


def test_hfov_after_refocus(refocused_lens, psf_golden):
    assert refocused_lens.hfov == pytest.approx(float(psf_golden["hfov"]), rel=1e-3)
    _, pr = refocused_lens.entrance_pupil()
    assert pr == pytest.approx(psf_golden["pupil"][1], rel=5e-3)


def test_chief_ray_centers(refocused_lens, psf_golden):
    pointc, _ = _pipeline_psf(refocused_lens, psf_golden)
    # centers in mm; pixel is 0.047mm — agree to well under 1/10 pixel
    err = np.abs(pointc - psf_golden["pointc"]).max()
    assert err < 5e-3, err


def test_full_psf_l1(refocused_lens, psf_golden):
    _, psf_l = _pipeline_psf(refocused_lens, psf_golden)
    ref = psf_golden["psf_l"]
    l1 = np.abs(psf_l - ref).mean()
    assert l1 < 1e-3, f"PSF L1 {l1}"


def test_full_psf_l1_specialized_trace(refocused_lens, psf_golden):
    """The static-unrolled throughput trace drives the same pipeline to the
    same north-star L1 bar, and the two dp_psf trace paths agree at the
    normalized-PSF level (same rays, different trace implementation)."""
    import jax

    from sdirt_tpu.dp.psf import dp_psf, lens_scalars

    lens = refocused_lens
    pts = psf_golden["points"].astype(np.float32)
    eta, skip = lens.eta_arrays(0.589, True)
    scal = lens_scalars(lens)
    key = jax.random.PRNGKey(11)
    kw = dict(spp=4096, spp_chief=1024, ks=21)
    psf_scan, _ = dp_psf(lens.stack, eta, skip, pts, key, scal, **kw)
    psf_spec, _ = dp_psf(lens.stack, eta, skip, pts, key, scal,
                         static_desc=lens.static_desc(), **kw)
    # identical rays through value-parity traces: normalized PSFs agree to
    # the trace tolerance band; an occasional aperture-boundary ray may flip
    # validity between the implementations (both are inside the reference's
    # Newton tolerance), moving one bilinear deposit — so bound the MEAN
    # tightly and allow single-ray-flip spikes in the max
    diff = np.abs(np.asarray(psf_scan) - np.asarray(psf_spec))
    assert diff.mean() < 3e-4, diff.mean()
    assert diff.max() < 2e-2, diff.max()


def test_full_psf_l1_with_params(refocused_lens, psf_golden):
    _, psf_l = _pipeline_psf(refocused_lens, psf_golden,
                             dp_params=DPParams(h=0.78, f=1.44, w=0.3, r=0.5))
    ref = psf_golden["psf_l_params"]
    l1 = np.abs(psf_l - ref).mean()
    assert l1 < 1e-3, f"PSF L1 {l1}"


class TestRenderGolden:
    """Per-pixel DP convolution and camera curves vs reference dumps."""

    @pytest.fixture(scope="class")
    def render_golden(self):
        return dict(np.load(GOLDEN_DIR / "render.npz"))

    def test_local_dp_conv(self, render_golden):
        import jax.numpy as jnp

        from sdirt_tpu.render.perpixel import local_dp_conv

        g = render_golden
        img = jnp.asarray(g["img"]).transpose(0, 2, 3, 1)
        rl, rr = local_dp_conv(img, jnp.asarray(g["psf"]), g["psf"].shape[-1])
        rl = np.asarray(rl).transpose(0, 3, 1, 2)
        rr = np.asarray(rr).transpose(0, 3, 1, 2)
        # reference computes in fp16, ours in bf16 — agree to half precision
        assert np.abs(rl - g["render_l"]).max() < 2e-2
        assert np.abs(rr - g["render_r"]).max() < 2e-2

    def test_uniform_conv(self, render_golden):
        import jax.numpy as jnp

        from sdirt_tpu.render.perpixel import uniform_psf_conv

        g = render_golden
        img = jnp.asarray(g["img"]).transpose(0, 2, 3, 1)
        out = uniform_psf_conv(img, jnp.asarray(g["uniform_psf"]),
                               g["uniform_psf"].shape[-1])
        out = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, g["uniform_out"], atol=2e-6)

    def test_degamma_curve(self, render_golden):
        from sdirt_tpu.render.camera import degamma

        g = render_golden
        ours = np.asarray(degamma(g["degamma_x"]))
        np.testing.assert_allclose(ours, g["degamma_y"], rtol=1e-5)


class TestScanRightVariants:
    """The three scan_right remedies for the TPU bf16 right-view divergence
    (RESULTS.md round 4; VERDICT r4 item 3). Promoted from
    scripts/probe_scan_right.py: a small end-to-end render through a real
    PSFMLP net in each mode."""

    @pytest.fixture(scope="class")
    def tiny_render(self):
        import jax
        import jax.numpy as jnp

        from sdirt_tpu.psfnet.arch import build_psfnet
        from sdirt_tpu.render.pipeline import render_dp

        net = build_psfnet("mlp@64", ks=7)
        params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 3)))
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 48)).astype(np.float32))
        depth = jnp.asarray(
            rng.uniform(0.4, 3.0, (1, 1, 32, 48)).astype(np.float32))

        def render(**kw):
            return np.asarray(render_dp(
                net.apply, params, img, -depth * 1e3, jnp.float32([-1000.0]),
                d_sensor=62.25, d_min=-9000.0, d_max=-300.0, ks=7,
                train=False, variant="scan", **kw))

        return render

    def test_noflip_bitexact_vs_flip(self, tiny_render):
        """Folding the x-mirror into the conv gather is the identical
        computation — same multiplies, same addition order — so the outputs
        must be bit-equal on every backend."""
        a = tiny_render(mlp_bf16=True, scan_right="flip")
        b = tiny_render(mlp_bf16=True, scan_right="noflip")
        assert np.array_equal(a, b), np.abs(a - b).max()

    def test_f32_right_matches_f32_truth(self, tiny_render):
        """The f32 right trunk must reproduce the all-f32 render's right
        view to bf16-conv precision (the conv stays bf16 in both)."""
        truth = tiny_render(mlp_bf16=False, scan_right="flip")
        mixed = tiny_render(mlp_bf16=True, scan_right="f32")
        c = truth.shape[1] // 2
        assert np.abs(mixed[:, c:] - truth[:, c:]).max() < 2e-2

    def test_tpu_scan_bf16_right_view_parity(self, tiny_render):
        """On TPU, the production scan_right mode's bf16 right view must sit
        within 0.2 dB-equivalent MSE of the f32 truth (the round-4 bug was a
        1.0 dB gap). Skipped off-TPU (CPU agrees in all modes)."""
        import jax

        if jax.devices()[0].platform not in ("tpu", "axon"):
            pytest.skip("TPU-only numerics check")
        truth = tiny_render(mlp_bf16=False, scan_right="flip")
        prod = tiny_render(mlp_bf16=True)   # whatever the env default is
        c = truth.shape[1] // 2
        mse_r = float(np.mean((prod[:, c:] - truth[:, c:]) ** 2))
        mse_l = float(np.mean((prod[:, :c] - truth[:, :c]) ** 2))
        # right-view bf16 error must be within ~5% (0.2 dB) of the left's
        assert mse_r < mse_l * 1.05 + 1e-9, (mse_l, mse_r)
