"""Full DP image formation: depth map -> per-pixel PSFs -> camera-space pair.

Parity source: /root/reference/deeplens/psfnet.py:644-714 (render, 4D branch).
One jitted graph per image shape: depth normalization, per-pixel MLP PSF
prediction, degamma -> per-pixel DP convolution -> gamma, optional structured
noise, clip.

Three compute variants (all parity-tested against each other):
  "scan"  — Flax apply per view + XLA tap-scan conv (the round-1/2 path)
  "fused" — one-GEMM batched MLP (mlp_fast) emitting the PSF tap-major,
            consumed by the fused Pallas conv+normalize kernel
            (fused_conv_pallas) that never materializes a pixel-major PSF
  "fused_int8" — "fused" with the eight 512x512 trunk layers on the int8
            MXU path (w8a8, STATIC per-tensor activation scales calibrated
            over the query domain — see render/mlp_fast.py docstring)
  "basis" — MXU basis-convolution path (render/basis.py); requires a
            linear-output PSFMLPBasis student (psfnet/arch.py "mlpb@WxK"),
            never materializes the per-pixel PSF tensor
  "basis_int8" — "basis" with the coefficient chain on the int8 MXU path

The fused/fused_int8 variants assume an all-ReLU PSFMLP head (they apply
ReLU after the last GEMM) — use scan/basis(_int8) with PSFMLPBasis nets.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .camera import degamma, dp_noise, gamma
from .perpixel import local_dp_conv

# Default compute variant when neither the `variant` argument nor the
# SDIRT_RENDER_VARIANT env var is set. Flipped to the fastest variant that
# passes the real-capture fidelity gate (scripts/gate_render_variants.py,
# within 0.1 dB PSNR of "scan") by scripts/tpu_queue_runner.py.
_DEFAULT_VARIANT = "fused_int8"

_QUANT_CACHE = {}
_SCAN_RIGHT_DEFAULT = None


def _scan_right_default() -> str:
    """Production scan_right mode: the on-chip gate's promotion manifest
    (ckpt/SCAN_RIGHT.json, written by scripts/gate_scan_right.py) wins;
    "flip" (the legacy path) otherwise. Cached per process."""
    global _SCAN_RIGHT_DEFAULT
    if _SCAN_RIGHT_DEFAULT is None:
        import json
        import os

        man = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "ckpt", "SCAN_RIGHT.json")
        mode = "flip"
        try:
            with open(man) as f:
                mode = json.load(f).get("mode", "flip")
        except (OSError, ValueError):
            pass
        _SCAN_RIGHT_DEFAULT = mode
    return _SCAN_RIGHT_DEFAULT


def _get_quant(params):
    """Host-side int8 trunk tensors, cached per concrete params object.

    Small FIFO (not single-entry): a multi-focus stack (psfnet/stack.py)
    renders through several live params sets per batch, and a one-slot
    cache would re-quantize on every alternation. Entries keep a reference
    to their params so a live key's id() can never be recycled."""
    key = id(params)
    if key not in _QUANT_CACHE:
        from .mlp_fast import quantize_mlp

        while len(_QUANT_CACHE) >= 8:
            _QUANT_CACHE.pop(next(iter(_QUANT_CACHE)))
        _QUANT_CACHE[key] = (quantize_mlp(params), params)
    return _QUANT_CACHE[key][0]


@partial(jax.jit, static_argnames=("apply_fn", "ks", "train", "variant",
                                   "mlp_bf16", "scan_right"))
def _render_dp_jit(apply_fn, params, quant, img, depth, foc_dist, scalars,
                   key, ks: int, train: bool, variant: str = "scan",
                   mlp_bf16: bool = True, scan_right: str = "flip"):
    d_sensor, d_min, d_max = scalars["d_sensor"], scalars["d_min"], scalars["d_max"]
    n, c, h, w = img.shape

    # "fix ignoring d_sensor bug" shift (psfnet.py:658-659)
    depth = depth + d_sensor
    del foc_dist  # 4D render branch uses per-pixel z only (psfnet.py:683-694)

    z = jnp.clip((depth - d_min) / (d_max - d_min), 0.0, 1.0)
    z = z.reshape(n, h, w)
    x, y = jnp.meshgrid(jnp.linspace(-1, 1, w), jnp.linspace(1, -1, h), indexing="xy")
    x = jnp.broadcast_to(x[None], (n, h, w))
    y = jnp.broadcast_to(y[None], (n, h, w))
    o = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)     # [N, H, W, 3]

    img_nhwc = img.transpose(0, 2, 3, 1)
    lum = degamma(img_nhwc)

    if variant in ("basis", "basis_int8"):
        from .basis import basis_dp_conv

        render_l, render_r = basis_dp_conv(params, o, lum, ks, quant=quant)
    elif variant in ("fused", "fused_int8"):
        from .fused_conv_pallas import fused_dp_conv_tapmajor
        from .mlp_fast import mlp_psf_tapmajor

        psf_tm = mlp_psf_tapmajor(params, o, ks, quant=quant)
        render_l, render_r = fused_dp_conv_tapmajor(lum, psf_tm, ks)
    else:
        from ..psfnet.surrogate import pred_psf

        def bf16_fn(p, q):
            pb = jax.tree.map(lambda t: t.astype(jnp.bfloat16), p)
            return apply_fn(pb, q.astype(jnp.bfloat16)).astype(jnp.float32)

        if mlp_bf16:
            # bf16 MLP halves matmul passes and activation traffic; A/B on
            # the real-capture fidelity metric is a wash (PSNR 37.531 vs
            # 37.530, SSIM equal) because sum-normalization + 441-tap
            # averaging cancel the per-kernel quantization — and the
            # reference itself renders in fp16.
            fn = bf16_fn
        else:
            fn = apply_fn
        # scan_right: the TPU-scan bf16 RIGHT view measured 1.0 dB below the
        # identical program on CPU (RESULTS.md round 4). Two candidate
        # remedies, both exact w.r.t. the left view:
        #   "noflip" — fold the x-mirror into local_dp_conv's tap gather so
        #              no jnp.flip (lane-axis reverse) appears in the graph;
        #   "f32"    — run the right-view trunk in f32 while the left stays
        #              bf16 (costs ~half the bf16 saving, guaranteed fix).
        fn_r = apply_fn if (mlp_bf16 and scan_right == "f32") else None
        psf = pred_psf(fn, params, o, ks,
                       flip_right=(scan_right != "noflip"),
                       apply_fn_right=fn_r)                # [N, H, W, 2, ks, ks]
        render_l, render_r = local_dp_conv(lum, psf, ks,
                                           mirror_right=(scan_right == "noflip"))

    render = jnp.concatenate([render_l, render_r], axis=-1)    # [N, H, W, 2C]
    render = gamma(render).transpose(0, 3, 1, 2)               # [N, 2C, H, W]

    if train:
        render = dp_noise(key, render, (n, 2 * c, h, w))
    return jnp.clip(render, 0.0, 1.0)


def render_dp(apply_fn, params, img, depth, foc_dist, *, d_sensor, d_min,
              d_max, ks, train=False, key=None, variant=None,
              mlp_bf16=None, scan_right=None, use_pallas=None):
    """Host-facing wrapper; see _render_dp_jit.

    variant: None -> the SDIRT_RENDER_VARIANT env var, else "scan".
    "fused"/"fused_int8" select the tap-major Pallas path (TPU only).
    mlp_bf16: None -> the SDIRT_RENDER_MLP_BF16 env var ("0" disables),
    else bf16 on. Only the "scan" variant consumes it.
    scan_right: None -> the SDIRT_SCAN_RIGHT env var, else "flip" (legacy),
    "noflip" (mirror folded into the conv gather) or "f32" (f32 right
    trunk). Only the "scan" variant consumes it.
    use_pallas is the legacy knob for the retired standalone conv kernel;
    accepted and ignored.
    """
    import os

    del use_pallas
    key = jax.random.PRNGKey(0) if key is None else key
    if variant is None:
        variant = os.environ.get("SDIRT_RENDER_VARIANT", _DEFAULT_VARIANT)
    if mlp_bf16 is None:
        mlp_bf16 = os.environ.get("SDIRT_RENDER_MLP_BF16", "1") != "0"
    if scan_right is None:
        scan_right = os.environ.get("SDIRT_SCAN_RIGHT") or _scan_right_default()
    assert scan_right in ("flip", "noflip", "f32"), scan_right
    quant = (_get_quant(params) if variant in ("fused_int8", "basis_int8")
             else None)
    scalars = {
        "d_sensor": jnp.float32(d_sensor),
        "d_min": jnp.float32(d_min),
        "d_max": jnp.float32(d_max),
    }
    img = jnp.asarray(img, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)
    if depth.ndim == 3:
        depth = depth[:, None]
    foc = jnp.asarray(foc_dist, jnp.float32)
    return _render_dp_jit(apply_fn, params, quant, img, depth, foc, scalars,
                          key, ks=ks, train=train, variant=variant,
                          mlp_bf16=mlp_bf16, scan_right=scan_right)
