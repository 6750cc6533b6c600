"""Full-network forward parity: YRStereonet_3D and Mydeblur vs the reference
torch implementation with ported weights (f32, eval mode).

The reference module is loaded straight from
/root/reference/dfdp/dddnet/dddnet.py; every conv/BN tensor (including
running statistics — BatchNorm semantics are pinned, eps 1e-5) is randomized,
ported onto the Flax tree, and the forward outputs compared at <=1e-4
relative error. Covers cost volume -> Matching -> Disp end-to-end and the
multi-patch deblur head (reference dddnet.py:32-152, 409-568)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

TOL = 1e-4


# ---------------------------------------------------------------------------
# reference loading / weight randomization
# ---------------------------------------------------------------------------

def _load_ref():
    import torch

    if "skimage.io" not in sys.modules:
        sk = sys.modules.get("skimage") or types.ModuleType("skimage")
        skio = types.ModuleType("skimage.io")
        sk.io = skio
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = skio
    spec = importlib.util.spec_from_file_location(
        "ref_dddnet", "/root/reference/dfdp/dddnet/dddnet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # DisparityRegression insists on torch.cuda.current_device(); CPU run
    torch.cuda.current_device = lambda: "cpu"
    return mod


def _randomize(module, seed):
    """Randomize every parameter AND BatchNorm running stat so the parity
    test exercises all of them (fresh init leaves BN at identity)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.empty_like(p).normal_(0, 0.1, generator=g))
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.copy_(torch.empty_like(m.running_mean)
                                     .normal_(0, 0.5, generator=g))
                m.running_var.copy_(torch.empty_like(m.running_var)
                                    .uniform_(0.5, 1.5, generator=g))


# ---------------------------------------------------------------------------
# torch -> flax weight ports
# ---------------------------------------------------------------------------

def _conv_w(w):
    """torch Conv2d/3d [out, in, *k] -> flax [*k, in, out]."""
    nd = w.ndim - 2
    return jnp.asarray(np.transpose(w, (*range(2, 2 + nd), 1, 0)))


def _deconv_w(w):
    """torch ConvTranspose [in, out, *k] -> flax ConvTranspose('SAME')
    [*k, in, out]: spatial flip + axis move (verified exact for the k4/s2/p1
    geometry both nets use)."""
    nd = w.ndim - 2
    w = w[(slice(None), slice(None)) + (slice(None, None, -1),) * nd]
    return jnp.asarray(np.ascontiguousarray(
        np.transpose(w, (*range(2, 2 + nd), 0, 1))))


class _Port:
    def __init__(self, state_dict, params, batch_stats=None):
        self.sd = {k: v.detach().numpy() for k, v in state_dict.items()}
        import flax

        self.p = flax.traverse_util.flatten_dict(params, sep="/")
        self.s = (flax.traverse_util.flatten_dict(batch_stats, sep="/")
                  if batch_stats is not None else {})

    def conv(self, dst, src, bias=False):
        self.p[f"{dst}/kernel"] = _conv_w(self.sd[f"{src}.weight"])
        if bias:
            self.p[f"{dst}/bias"] = jnp.asarray(self.sd[f"{src}.bias"])

    def deconv(self, dst, src, bias=False):
        self.p[f"{dst}/kernel"] = _deconv_w(self.sd[f"{src}.weight"])
        if bias:
            self.p[f"{dst}/bias"] = jnp.asarray(self.sd[f"{src}.bias"])

    def bn(self, dst, src):
        self.p[f"{dst}/scale"] = jnp.asarray(self.sd[f"{src}.weight"])
        self.p[f"{dst}/bias"] = jnp.asarray(self.sd[f"{src}.bias"])
        self.s[f"{dst}/mean"] = jnp.asarray(self.sd[f"{src}.running_mean"])
        self.s[f"{dst}/var"] = jnp.asarray(self.sd[f"{src}.running_var"])

    def basic(self, dst, src, bn=True, deconv=False):
        (self.deconv if deconv else self.conv)(f"{dst}/Conv_0" if not deconv
                                               else f"{dst}/ConvTranspose_0",
                                               f"{src}.conv")
        if bn:
            self.bn(f"{dst}/BatchNorm_0", f"{src}.bn")

    def done(self):
        import flax

        return (flax.traverse_util.unflatten_dict(self.p, sep="/"),
                flax.traverse_util.unflatten_dict(self.s, sep="/"))


def _port_feature(port, pre, src):
    order = [("BasicConv_0", "start.0"), ("BasicConv_1", "start.1"),
             ("BasicConv_2", "start.2"), ("BasicConv_3", "layer1.0"),
             ("BasicConv_4", "layer1.1"), ("BasicConv_5", "layer1.2")]
    for dst, s in order:
        port.basic(f"{pre}/{dst}", f"{src}.{s}")
    port.conv(f"{pre}/ConvBN_0/Conv_0", f"{src}.branch1.1.0")
    port.bn(f"{pre}/ConvBN_0/BatchNorm_0", f"{src}.branch1.1.1")
    port.conv(f"{pre}/ConvBN_1/Conv_0", f"{src}.branch3.1.0")
    port.bn(f"{pre}/ConvBN_1/BatchNorm_0", f"{src}.branch3.1.1")
    port.basic(f"{pre}/BasicConv_6", f"{src}.end.0")
    port.basic(f"{pre}/BasicConv_7", f"{src}.end.1", bn=False)


def _port_matching(port, pre, src):
    order = [("BasicConv_0", "start.0"), ("BasicConv_1", "start.1"),
             ("BasicConv_2", "start.2"), ("BasicConv_3", "conv1a.0"),
             ("BasicConv_4", "conv1a.1")]
    for dst, s in order:
        port.basic(f"{pre}/{dst}", f"{src}.{s}")
    port.basic(f"{pre}/Conv2x_0/BasicConv_0", f"{src}.deconv1a.conv1")
    port.basic(f"{pre}/Conv2x_0/BasicConv_1", f"{src}.deconv1a.conv2")
    port.basic(f"{pre}/BasicConv_5", f"{src}.end.0", deconv=True)
    port.basic(f"{pre}/BasicConv_6", f"{src}.end.1", bn=False)


def _port_encoder(port, pre, src):
    # flax auto-names by CONSTRUCTION order: in `Conv(a)(relu(Conv(b)(x)))`
    # the outer module is constructed (and numbered) before the inner one,
    # so each torch Sequential(conv, relu, conv) maps outer-first
    names = ["layer1", "layer2.2", "layer2.0", "layer3.2", "layer3.0",
             "layer5", "layer6.2", "layer6.0", "layer7.2", "layer7.0",
             "layer9", "layer10.2", "layer10.0", "layer11.2", "layer11.0"]
    for i, s in enumerate(names):
        port.conv(f"{pre}/Conv_{i}", f"{src}.{s}", bias=True)


def _port_decoder(port, pre, src):
    convs = ["layer13.2", "layer13.0", "layer14.2", "layer14.0",
             "layer17.2", "layer17.0", "layer18.2", "layer18.0",
             "layer21.2", "layer21.0", "layer22.2", "layer22.0", "layer24"]
    for i, s in enumerate(convs):
        port.conv(f"{pre}/Conv_{i}", f"{src}.{s}", bias=True)
    port.deconv(f"{pre}/ConvTranspose_0", f"{src}.layer16", bias=True)
    port.deconv(f"{pre}/ConvTranspose_1", f"{src}.layer20", bias=True)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_yrstereonet3d_full_forward_parity():
    import torch

    ref = _load_ref()
    torch.manual_seed(0)
    net = ref.YRStereonet_3D(maxdisp=20).eval()
    _randomize(net, seed=1)

    rng = np.random.default_rng(2)
    # H, W >= 128 so the 32x32 SPP pooling branch is non-degenerate
    l = rng.normal(size=(1, 3, 128, 192)).astype(np.float32)
    r = rng.normal(size=(1, 3, 128, 192)).astype(np.float32)
    with torch.no_grad():
        y_ref = net(torch.tensor(l), torch.tensor(r)).numpy()

    from sdirt_tpu.dfdp.models.dddnet import YRStereonet3D

    model = YRStereonet3D(maxdisp=20)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(l),
                           jnp.asarray(r), train=False)
    port = _Port(net.state_dict(), variables["params"],
                 variables["batch_stats"])
    _port_feature(port, "Feature_0", "feature")
    _port_matching(port, "Matching_0", "matching")
    params, batch_stats = port.done()

    out = np.asarray(model.apply({"params": params, "batch_stats": batch_stats},
                                 jnp.asarray(l), jnp.asarray(r), train=False))
    assert out.shape == y_ref.shape
    scale = np.abs(y_ref).max()
    err = np.abs(out - y_ref).max() / scale
    assert err < TOL, f"relative err {err}"


@pytest.mark.slow
def test_mydeblur_full_forward_parity():
    import torch

    ref = _load_ref()
    torch.manual_seed(3)
    net = ref.Mydeblur().eval()
    _randomize(net, seed=4)

    rng = np.random.default_rng(5)
    l = rng.normal(size=(1, 3, 64, 96)).astype(np.float32)
    r = rng.normal(size=(1, 3, 64, 96)).astype(np.float32)
    d = rng.normal(size=(1, 1, 64, 96)).astype(np.float32)
    with torch.no_grad():
        mdisp_ref, deblur_ref = net(torch.tensor(l), torch.tensor(r),
                                    torch.tensor(d))

    from sdirt_tpu.dfdp.models.dddnet import Mydeblur

    model = Mydeblur()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(l),
                           jnp.asarray(r), jnp.asarray(d))
    port = _Port(net.state_dict(), variables["params"])
    # creation order in Mydeblur.__call__: enc1, enc2, enc3, dec3, dec2,
    # dec1, decd, down (ConvBlock), CAM
    _port_encoder(port, "Encoder_0", "encoder1")
    _port_encoder(port, "Encoder_1", "encoder2")
    _port_encoder(port, "Encoder_2", "encoder3")
    _port_decoder(port, "Decoder_0", "decoder3")
    _port_decoder(port, "Decoder_1", "decoder2")
    _port_decoder(port, "Decoder_2", "decoder1")
    _port_decoder(port, "Decoder_3", "decoderd")
    port.conv("ConvBlock_0/Conv_0", "down.conv", bias=True)
    port.p["CAMModule_0/gamma"] = jnp.asarray(
        port.sd["cam_attention.gamma"])
    params, _ = port.done()

    mdisp, deblur = model.apply({"params": params}, jnp.asarray(l),
                                jnp.asarray(r), jnp.asarray(d))
    for ours, theirs in ((mdisp, mdisp_ref.numpy()), (deblur, deblur_ref.numpy())):
        ours = np.asarray(ours)
        assert ours.shape == theirs.shape
        err = np.abs(ours - theirs).max() / np.abs(theirs).max()
        assert err < TOL, f"relative err {err}"
