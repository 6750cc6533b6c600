"""MXU basis-convolution DP render for linear-output PSF students.

Reference op: /root/reference/deeplens/render_psf.py:120-155 — a per-pixel
spatially-varying 2x(ks x ks) convolution. Every prior variant (scan /
fused tap-major Pallas) evaluates the full [H, W, ks^2] PSF tensor and
streams it through a VPU-bound tap loop. This path removes that tensor
entirely by exploiting the PSFMLPBasis head (psfnet/arch.py): the last
Dense is LINEAR, so with per-pixel coefficients c[px, k] (ReLU'd, K~64)
and fixed basis kernels B[k, ks, ks] + bias kernel b,

    out[px] = sum_t psf[px, t] * img[px + t]
            = sum_k c[px, k] * (B_k * img)[px] + (b * img)[px]

where (B_k * img) are ORDINARY dense convolutions — batched, static, MXU
work that XLA lowers at matmul rates — followed by an elementwise
K-contraction. Sum-normalization commutes (it is a per-output-pixel
scalar): s[px] = c[px] @ rowsum(B) + sum(b), divided at the end.

The right view needs no second PSF evaluation either: its taps are the
kx-mirror of the mirrored-x query (reference psfnet.py:327-333), which
folds into a second, x-flipped filter bank over the SAME image.

Cost at 512x768 / ks 21 / K 64: ~0.14 TFLOP of basis conv + the trunk
GEMMs — vs 8 ms of VPU tap-loop plus a 0.7 GB PSF round-trip on the fused
path. Exact w.r.t. the student (pure reassociation); fidelity of the
student itself is gated on real captures like every variant
(scripts/gate_render_variants.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .mlp_fast import dense_layers, quant_trunk, stack_views


def basis_coeffs(params, o, quant=None, compute_dtype=jnp.bfloat16):
    """ReLU'd basis coefficients for both DP views in ONE GEMM chain.

    o: [N, ..., 3] query points. Returns [N, 2, P, K] f32 (view 0 = left,
    view 1 = the x-mirrored right query, reference psfnet.py:327-333).
    quant: optional static-scale int8 pack (mlp_fast.quantize_mlp — its
    trunk slice [2:-1] covers the coefficient layer too, so the whole
    coefficient chain after the first two bf16 layers runs w8a8).
    compute_dtype: GEMM input dtype; jnp.float32 gives the exact-parity
    debug path (tests/test_render_basis.py signed-basis check).
    """
    layers = dense_layers(params)
    x = stack_views(o)                                  # [N*2*P, 3]
    if quant is not None:
        h = quant_trunk(layers, quant, x)               # [N*2*P, K] f32
    else:
        h = x.astype(compute_dtype)
        for w, b in layers[:-1]:
            h = lax.dot_general(h, w.astype(compute_dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            h = jax.nn.relu(h + b).astype(compute_dtype)
    n = o.shape[0]
    k = h.shape[-1]
    return h.astype(jnp.float32).reshape(n, 2, -1, k)


def basis_dp_conv(params, o, lum, ks: int, quant=None,
                  compute_dtype=jnp.bfloat16):
    """DP pair via basis convolution.

    params: PSFMLPBasis Flax params (last Dense linear, [K, ks*ks] + bias).
    o:   [N, H, W, 3] per-pixel queries (x, y, z).
    lum: [N, H, W, C] linear-luminance image.
    compute_dtype: conv/einsum input dtype (f32 = exact-parity debug path).
    Returns (render_l, render_r): [N, H, W, C] f32, sum-normalized exactly
    like surrogate.pred_psf + perpixel.local_dp_conv.
    """
    n, hh, ww, c = lum.shape
    layers = dense_layers(params)
    bm, bb = layers[-1]                                 # [K, ks*ks], [ks*ks]
    kdim = bm.shape[0]

    coeff = basis_coeffs(params, o, quant=quant,
                         compute_dtype=compute_dtype).reshape(
                             n, 2, hh, ww, kdim)

    # normalization sums: per-view sum of UNNORMALIZED taps (pred_psf
    # divides by sum + 1e-9; a tap flip leaves the sum unchanged)
    s = coeff @ bm.sum(1) + bb.sum()                    # [N, 2, H, W]

    # filter banks. local_dp_conv applies psf[ks-1-dy, ks-1-dx] to
    # img_pad[y+dy, x+dx] (true convolution): left taps enter flipped in
    # both axes; the right view's taps are raw[..., ::-1] (kx-mirror), so
    # its bank is flipped in ky only.
    basis = bm.reshape(kdim, ks, ks)
    bias_k = bb.reshape(ks, ks)
    bank = jnp.concatenate([
        jnp.flip(basis, (-1, -2)), jnp.flip(bias_k, (-1, -2))[None],
        jnp.flip(basis, (-2,)), jnp.flip(bias_k, (-2,))[None],
    ])                                                  # [2K+2, ks, ks]

    # channels-as-batch dense conv: [N*C, Hp, Wp, 1] x [ks, ks, 1, 2K+2]
    pad = (ks - 1) // 2
    img_p = jnp.pad(lum, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    img_b = img_p.transpose(0, 3, 1, 2).reshape(n * c, *img_p.shape[1:3], 1)
    g = lax.conv_general_dilated(
        img_b.astype(compute_dtype),
        bank.transpose(1, 2, 0)[:, :, None, :].astype(compute_dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    g = g.reshape(n, c, hh, ww, 2 * kdim + 2).astype(compute_dtype)

    cl = coeff[:, 0].astype(compute_dtype)
    cr = coeff[:, 1].astype(compute_dtype)
    out_l = jnp.einsum("nhwk,nchwk->nchw", cl, g[..., :kdim],
                       preferred_element_type=jnp.float32)
    out_r = jnp.einsum("nhwk,nchwk->nchw", cr, g[..., kdim + 1:2 * kdim + 1],
                       preferred_element_type=jnp.float32)
    out_l = out_l + g[..., kdim].astype(jnp.float32)
    out_r = out_r + g[..., 2 * kdim + 1].astype(jnp.float32)

    inv = 1.0 / (s + 1e-9)                              # [N, 2, H, W]
    out_l = (out_l * inv[:, 0, None]).transpose(0, 2, 3, 1)
    out_r = (out_r * inv[:, 1, None]).transpose(0, 2, 3, 1)
    return out_l, out_r
