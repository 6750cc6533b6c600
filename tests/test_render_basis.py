"""Parity tests for the MXU basis-convolution render (render/basis.py).

The basis path is algebraically exact w.r.t. a linear-output PSFMLPBasis
student (pure reassociation of sum_t psf*img through the basis), so parity
against the golden-tested scan path holds for ANY parameter values — these
tests run on a random-init student, no fitted checkpoint needed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdirt_tpu.psfnet.arch import PSFMLPBasis, build_psfnet
from sdirt_tpu.psfnet.surrogate import pred_psf
from sdirt_tpu.render.basis import basis_dp_conv
from sdirt_tpu.render.perpixel import local_dp_conv

KS = 7
N, H, W, C = 2, 16, 24, 3


@pytest.fixture(scope="module")
def setup():
    net = build_psfnet("mlpb@64x12", KS)
    assert isinstance(net, PSFMLPBasis)
    assert net.hidden_features == 64 and net.basis_k == 12
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    # A fitted student regresses non-negative PSFs, so its taps carry no
    # large cancelling +/- mass; a random SIGNED basis is unrepresentative
    # (bf16 reassociation amplifies the cancellation). Make the basis
    # non-negative and bias the sums positive like any fitted PSF net.
    last = sorted(params["params"], key=lambda s: int(s.split("_")[-1]))[-1]
    params["params"][last]["kernel"] = jnp.abs(params["params"][last]["kernel"])
    params["params"][last]["bias"] = (
        params["params"][last]["bias"] + 0.2)
    rng = np.random.default_rng(1)
    o = rng.uniform(-1, 1, (N, H, W, 3)).astype(np.float32)
    o[..., 2] = rng.uniform(0, 1, (N, H, W))
    img = jnp.asarray(rng.uniform(0, 1, (N, H, W, C)).astype(np.float32))
    return net, params, jnp.asarray(o), img


def _scan_path(net, params, o, img):
    """The golden-tested reference path at the same (bf16) precision."""
    p = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)
    fn = lambda pp, q: net.apply(pp, q.astype(jnp.bfloat16)).astype(jnp.float32)
    psf = pred_psf(fn, p, o, KS)
    return local_dp_conv(img, psf, KS)


@pytest.mark.slow
def test_basis_conv_matches_scan(setup):
    net, params, o, img = setup
    rl_ref, rr_ref = _scan_path(net, params, o, img)
    rl, rr = basis_dp_conv(params, o, img, KS)
    assert float(jnp.abs(rl - rl_ref).max()) < 5e-3
    assert float(jnp.abs(rr - rr_ref).max()) < 5e-3


def test_basis_conv_exact_with_signed_basis_f32():
    """ADVICE r3: the production (fitted) students have SIGNED basis
    kernels, where bf16 reassociation differences are amplified by
    cancellation. The reassociation itself must still be exact: in f32
    compute, basis must match the f32 scan path on a raw random-init
    (signed) student to float32 tolerance, both views."""
    net = build_psfnet("mlpb@64x12", KS)
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 3)))
    last = sorted(params["params"], key=lambda s: int(s.split("_")[-1]))[-1]
    k = np.asarray(params["params"][last]["kernel"])
    assert (k < 0).mean() > 0.2, "random init should be well signed"

    rng = np.random.default_rng(4)
    o = rng.uniform(-1, 1, (N, H, W, 3)).astype(np.float32)
    o[..., 2] = rng.uniform(0, 1, (N, H, W))
    o = jnp.asarray(o)
    img = jnp.asarray(rng.uniform(0, 1, (N, H, W, C)).astype(np.float32))

    # pure-f32 reference conv (local_dp_conv semantics without its
    # internal bf16 casts): out[y,x] = sum img_pad[y+dy,x+dx] *
    # psf[y,x,ks-1-dy,ks-1-dx]
    psf = np.asarray(pred_psf(net.apply, params, o, KS), np.float32)
    pad = (KS - 1) // 2
    img_np = np.asarray(img, np.float32)
    img_p = np.pad(img_np, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="edge")
    ref = np.zeros((N, H, W, 2, C), np.float32)
    for dy in range(KS):
        for dx in range(KS):
            patch = img_p[:, dy:dy + H, dx:dx + W]        # [N,H,W,C]
            kk = psf[:, :, :, :, KS - 1 - dy, KS - 1 - dx]  # [N,H,W,2]
            ref += patch[:, :, :, None] * kk[..., None]
    rl, rr = basis_dp_conv(params, o, img, KS, compute_dtype=jnp.float32)
    assert float(np.abs(np.asarray(rl) - ref[:, :, :, 0]).max()) < 1e-5
    assert float(np.abs(np.asarray(rr) - ref[:, :, :, 1]).max()) < 1e-5


def test_basis_right_view_is_mirrored_query(setup):
    """The right view must come from the x-negated query with kx-mirrored
    taps (reference psfnet.py:327-333): rendering a left-right mirrored
    scene with mirrored queries must reproduce the mirrored opposite view."""
    net, params, o, img = setup
    rl, rr = basis_dp_conv(params, o, img, KS)
    o_m = np.asarray(o).copy()
    o_m[..., 0] *= -1.0
    rl_m, rr_m = basis_dp_conv(params, jnp.asarray(o_m[:, :, ::-1]),
                               img[:, :, ::-1], KS)
    np.testing.assert_allclose(np.asarray(rr), np.asarray(rl_m)[:, :, ::-1],
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(rl), np.asarray(rr_m)[:, :, ::-1],
                               rtol=0, atol=5e-3)


def test_render_dp_basis_variant(setup):
    from sdirt_tpu.render.pipeline import render_dp

    net, params, o, img = setup
    img_nchw = img.transpose(0, 3, 1, 2)
    depth = -(np.random.default_rng(2)
              .uniform(100, 1000, (N, 1, H, W)).astype(np.float32))
    kw = dict(d_sensor=62.25, d_min=-20000.0, d_max=-200.0, ks=KS)
    out_scan = render_dp(net.apply, params, img_nchw, depth, [-1000.0],
                         variant="scan", **kw)
    out_basis = render_dp(net.apply, params, img_nchw, depth, [-1000.0],
                          variant="basis", **kw)
    assert out_basis.shape == (N, 2 * C, H, W)
    assert float(jnp.abs(out_basis - out_scan).max()) < 1e-2


def test_basis_int8_close_to_bf16(setup):
    """Static-scale int8 coefficient chain (mlp_fast.quantize_mlp reused on
    the 12-layer student) stays within the quantization band of bf16."""
    from sdirt_tpu.render.mlp_fast import quantize_mlp

    net, params, o, img = setup
    rl, rr = basis_dp_conv(params, o, img, KS)
    qd = quantize_mlp(params)
    rl_q, rr_q = basis_dp_conv(params, o, img, KS, quant=qd)
    rel = float((jnp.abs(rl_q - rl).sum() + jnp.abs(rr_q - rr).sum())
                / (jnp.abs(rl).sum() + jnp.abs(rr).sum()))
    assert rel < 3e-2


def test_partial_warmstart_carries_trunk(tmp_path):
    """A PSFMLP checkpoint warm-starts a PSFMLPBasis student's trunk: every
    same-shaped Dense carries over, the new head layers stay initialized."""
    from sdirt_tpu.psfnet.surrogate import PSFNetLens

    teacher = PSFNetLens("lenses/rf50mm/lens_web.json", model_name="mlp@64",
                         kernel_size=KS, sensor_res=(64, 96))
    teacher.params = jax.tree.map(lambda t: t + 1.0, teacher.params)
    ck = str(tmp_path / "teacher_ck")
    teacher.save_net(ck)

    student = PSFNetLens("lenses/rf50mm/lens_web.json",
                         model_name="mlpb@64x12", kernel_size=KS,
                         sensor_res=(64, 96))
    before = jax.tree.map(lambda t: np.asarray(t).copy(), student.params)
    student.load_net(ck)

    t = teacher.params["params"]
    s = student.params["params"]
    b = before["params"]
    shared = [k for k in s if k in t
              and t[k]["kernel"].shape == s[k]["kernel"].shape]
    fresh = [k for k in s if k not in shared]
    assert len(shared) >= 10 and len(fresh) >= 1
    for k in shared:
        np.testing.assert_array_equal(np.asarray(s[k]["kernel"]),
                                      np.asarray(t[k]["kernel"]))
    for k in fresh:
        np.testing.assert_array_equal(np.asarray(s[k]["kernel"]),
                                      np.asarray(b[k]["kernel"]))

    # exact-structure restore still round-trips
    student2 = PSFNetLens("lenses/rf50mm/lens_web.json",
                          model_name="mlp@64", kernel_size=KS,
                          sensor_res=(64, 96))
    student2.load_net(ck)
    jax.tree.map(lambda a, c: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(c)), student2.params, teacher.params)
