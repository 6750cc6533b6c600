"""Fast explicit-GEMM forward for the production PSF MLP.

The Flax `net.apply` path is kept for training/parity; this module re-expresses
the same 11-Dense all-ReLU chain (psfnet/arch.py PSFMLP, reference
deeplens/psfnet_arch.py MLP) as explicit `dot_general`s so the render pipeline
can:

  * batch the left + mirrored-right query sets into ONE GEMM chain
    (reference psfnet.py:317-336 issues two full forward passes);
  * emit the last layer TAP-MAJOR — out[t, p] instead of out[p, t] — by
    choosing dot_general dimension numbers, so the fused Pallas conv kernel
    (fused_conv_pallas.py) consumes the PSF without a 0.7 GB transpose pass;
  * run the eight 512x512 trunk layers on the int8 MXU path (w8a8, 2x the
    bf16 peak on v5e) with per-output-channel weight scales and per-tensor
    activation scales calibrated over the network's closed input domain
    [-1,1]^2 x [0,1].

Numerics: bf16 GEMMs accumulate in f32 (preferred_element_type); the int8
path rescales in f32 between layers. PSF sum-normalization commutes with the
per-pixel convolution (the norm depends only on the output pixel), so it is
folded into the conv kernel's epilogue rather than materialized here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def dense_layers(params):
    """Extract [(kernel, bias), ...] in layer order from Flax PSFMLP params."""
    p = params["params"] if "params" in params else params
    keys = sorted((k for k in p if k.startswith("Dense_")),
                  key=lambda s: int(s.split("_")[-1]))
    return [(p[k]["kernel"], p[k]["bias"]) for k in keys]


def stack_views(o):
    """[N, ..., 3] query points -> [N*2*P, 3] rows ordered (sample, view,
    pixel): per sample, left queries then x-mirrored right queries
    (reference psfnet.py:327-333), one batch for one GEMM chain."""
    n = o.shape[0]
    flat = o.reshape(n, -1, 3)
    both = jnp.stack([flat, flat * jnp.array([-1.0, 1.0, 1.0], o.dtype)], 1)
    return both.reshape(-1, 3)                             # [N*2*P, 3]


def mlp_psf_tapmajor(params, o, ks: int, *, quant=None):
    """Evaluate the PSF MLP for both DP views, returning the UNNORMALIZED
    PSF tap-major: [ks*ks, N, 2, P] (taps ky-major, sample, views
    left/right, P pixels per sample).

    quant: None for bf16, or a QuantizedMLP (int8 trunk) from quantize_mlp.
    The right view's kx-flip (reference psfnet.py:333) is NOT applied here;
    the fused conv kernel indexes the right view's taps mirrored instead.
    """
    layers = dense_layers(params)
    x = stack_views(o)                                     # [N*2*P, 3]
    if quant is not None:
        h = quant_trunk(layers, quant, x)                  # [N*2*P, 512] f32
    else:
        h = x.astype(jnp.bfloat16)
        for w, b in layers[:-1]:
            h = jax.lax.dot_general(
                h, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = jax.nn.relu(h + b).astype(jnp.bfloat16)
    w, b = layers[-1]                                      # [512, ks*ks]
    # Tap-major output: psf[t, p] = relu(sum_k w[k, t] h[p, k] + b[t]).
    psf = jax.lax.dot_general(
        w.astype(jnp.bfloat16), h.astype(jnp.bfloat16),
        (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    psf = jax.nn.relu(psf + b[:, None])                    # [ks*ks, N*2*P]
    n = o.shape[0]
    p = x.shape[0] // (2 * n)
    return psf.reshape(ks * ks, n, 2, p).astype(jnp.bfloat16)


def mlp_psf_pixelmajor(params, o, ks: int, *, quant=None):
    """Same math as psfnet.surrogate.pred_psf (normalized, pixel-major
    [..., 2, ks, ks]) but through the one-GEMM batched chain. Used for
    parity tests and as the non-Pallas fallback."""
    psf_tm = mlp_psf_tapmajor(params, o, ks, quant=quant)  # [ks*ks, N, 2, P]
    psf = psf_tm.astype(jnp.float32).transpose(1, 3, 2, 0)  # [N, P, 2, ks*ks]
    psf = psf.reshape(*o.shape[:-1], 2, ks, ks)
    psf = psf.at[..., 1, :, :].set(jnp.flip(psf[..., 1, :, :], -1))
    return psf / (psf.sum((-1, -2), keepdims=True) + 1e-9)


# ---------------------------------------------------------------------------
# int8 (w8a8) trunk
# ---------------------------------------------------------------------------

def quantize_mlp(params):
    """Precompute the int8 trunk tensors (a plain pytree, safe to pass into
    jit) for the eight 512x512 hidden layers of PSFMLP.

    Weights: symmetric per-output-channel scales. The matching activation
    quantization (quant_trunk) is dynamic per-ROW asymmetric — ReLU outputs
    live in [0, rowmax], so quantizing (h/s - 128) uses the full signed-8
    range; the zero-point cross term is the rank-1 correction
    128 * s[p] * colsum(Wq)[c], with colsum precomputed here.
    """
    layers = dense_layers(params)
    wq, ws, cs = [], [], []
    for w, b in layers[2:-1]:
        s = jnp.max(jnp.abs(w), axis=0) / 127.0 + 1e-12   # per out-channel
        q = jnp.round(w / s).astype(jnp.int8)
        wq.append(q)
        ws.append(s.astype(jnp.float32))
        cs.append(q.astype(jnp.float32).sum(0))            # [out]
    return {"wq": tuple(wq), "ws": tuple(ws), "cs": tuple(cs)}


def quant_trunk(layers, qd, x):
    """int8 (w8a8) forward of the PSFMLP trunk. Layers 0..1 (3->128->512)
    stay bf16 (negligible FLOPs, widest dynamic range); the 512x512 chain
    runs int8 x int8 -> int32 on the MXU (2x the bf16 peak on v5e)."""
    h = x.astype(jnp.bfloat16)
    for w, b in layers[:2]:
        h = jax.lax.dot_general(
            h, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = jax.nn.relu(h + b)
    # h: [2P, 512] f32, non-negative (ReLU)
    for i, (wq, ws, cs) in enumerate(zip(qd["wq"], qd["ws"], qd["cs"])):
        sa = jnp.max(h, axis=1, keepdims=True) / 255.0 + 1e-12  # [2P, 1]
        hq = (jnp.round(h / sa) - 128.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            hq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        b = layers[2 + i][1]
        deq = (acc.astype(jnp.float32) + 128.0 * cs[None, :]) \
            * (sa * ws[None, :])
        h = jax.nn.relu(deq + b)
    return h
