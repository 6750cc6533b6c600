"""Numeric forward parity of the DDDNet Feature tower vs the reference
(torch) on fixed weights: validates conv padding/dilation/stride, eval-mode
BatchNorm, SPP average pooling and align_corners=True bilinear upsampling.

(Deconv-bearing submodules use flax 'SAME' transpose geometry by design and
are validated semantically elsewhere.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from tests.conftest import GOLDEN_DIR


def _port_feature_weights(params, batch_stats, g):
    """Map reference torch state_dict arrays onto the Flax Feature tree."""
    import flax

    p = flax.traverse_util.flatten_dict(params, sep="/")
    s = flax.traverse_util.flatten_dict(batch_stats, sep="/")

    def conv(dst, src):
        w = g[f"w/{src}.weight"]
        p[f"{dst}/kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))

    def bn(dst, src):
        p[f"{dst}/scale"] = jnp.asarray(g[f"w/{src}.weight"])
        p[f"{dst}/bias"] = jnp.asarray(g[f"w/{src}.bias"])
        s[f"{dst}/mean"] = jnp.asarray(g[f"w/{src}.running_mean"])
        s[f"{dst}/var"] = jnp.asarray(g[f"w/{src}.running_var"])

    # creation order in models.dddnet.Feature.__call__
    order = [("BasicConv_0", "start.0"), ("BasicConv_1", "start.1"),
             ("BasicConv_2", "start.2"), ("BasicConv_3", "layer1.0"),
             ("BasicConv_4", "layer1.1"), ("BasicConv_5", "layer1.2")]
    for dst, src in order:
        conv(f"{dst}/Conv_0", f"{src}.conv")
        bn(f"{dst}/BatchNorm_0", f"{src}.bn")
    # SPP branches: convbn Sequential(conv, bn)
    conv("ConvBN_0/Conv_0", "branch1.1.0")
    bn("ConvBN_0/BatchNorm_0", "branch1.1.1")
    conv("ConvBN_1/Conv_0", "branch3.1.0")
    bn("ConvBN_1/BatchNorm_0", "branch3.1.1")
    # end: BasicConv(96) + BasicConv(32, bn=False)
    conv("BasicConv_6/Conv_0", "end.0.conv")
    bn("BasicConv_6/BatchNorm_0", "end.0.bn")
    conv("BasicConv_7/Conv_0", "end.1.conv")

    return (flax.traverse_util.unflatten_dict(p, sep="/"),
            flax.traverse_util.unflatten_dict(s, sep="/"))


def test_feature_tower_forward_parity():
    from sdirt_tpu.dfdp.models.dddnet import Feature

    g = dict(np.load(GOLDEN_DIR / "feature_tower.npz"))
    x = g["x"]                      # [1, 3, 128, 192] NCHW
    y_ref = g["y"]                  # [1, 32, 32, 48]

    model = Feature()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    params, batch_stats = _port_feature_weights(
        variables["params"], variables["batch_stats"], g)

    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == y_ref.shape
    scale = np.abs(y_ref).max()
    err = np.abs(out - y_ref).max() / scale
    # measured 6.6e-7: f32 accumulation-order noise only (BN eps/momentum
    # semantics are pinned; full-network parity in test_dddnet_full_parity.py)
    assert err < 1e-5, f"relative err {err}"


def test_trilinear_resize_matches_torch_aligncorners_false():
    """Disp upsampling (dddnet.Disp): jax.image.resize 'trilinear' must match
    torch F.interpolate(align_corners=False)."""
    import torch

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1, 5, 8, 12)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.tensor(x), size=(20, 32, 48), mode="trilinear",
        align_corners=False).numpy()
    ours = np.asarray(jax.image.resize(jnp.asarray(x[0, 0]), (20, 32, 48),
                                       "trilinear"))
    np.testing.assert_allclose(ours, ref[0, 0], atol=2e-6)


def test_align_corners_true_matches_torch():
    """Conv2x/SPP upsampling: our explicit gather interpolation must match
    torch align_corners=True (bilinear and trilinear)."""
    import torch

    from sdirt_tpu.dfdp.models.layers import resize_linear_align_corners

    rng = np.random.default_rng(1)
    x2 = rng.normal(size=(1, 7, 11, 4)).astype(np.float32)   # NHWC
    ref2 = torch.nn.functional.interpolate(
        torch.tensor(x2.transpose(0, 3, 1, 2)), size=(21, 33),
        mode="bilinear", align_corners=True).numpy().transpose(0, 2, 3, 1)
    ours2 = np.asarray(resize_linear_align_corners(jnp.asarray(x2), (21, 33), (1, 2)))
    np.testing.assert_allclose(ours2, ref2, atol=2e-6)

    x3 = rng.normal(size=(1, 3, 6, 9, 2)).astype(np.float32)  # NDHWC
    ref3 = torch.nn.functional.interpolate(
        torch.tensor(x3.transpose(0, 4, 1, 2, 3)), size=(6, 12, 18),
        mode="trilinear", align_corners=True).numpy().transpose(0, 2, 3, 4, 1)
    ours3 = np.asarray(resize_linear_align_corners(jnp.asarray(x3), (6, 12, 18),
                                                   (1, 2, 3)))
    np.testing.assert_allclose(ours3, ref3, atol=2e-6)
