"""Fast explicit-GEMM forward for the production PSF MLP.

The Flax `net.apply` path is kept for training/parity; this module
re-expresses the same 11-Dense all-ReLU chain (psfnet/arch.py PSFMLP,
reference deeplens/psfnet_arch.py MLP) as explicit `dot_general`s so the
render pipeline can:

  * batch the left + mirrored-right query sets into ONE GEMM chain
    (reference psfnet.py:317-336 issues two full forward passes);
  * emit the last layer TAP-MAJOR — out[t, p] instead of out[p, t] — by
    choosing dot_general dimension numbers, so the fused Pallas conv kernel
    (fused_conv_pallas.py) consumes the PSF without a 0.7 GB transpose pass;
  * run the eight 512x512 trunk layers on the int8 MXU path (w8a8: ~348
    TOPS measured on v5e vs ~190 TFLOP/s bf16).

int8 design note (r3, all timings 512x768/ks21 on the v5e): activation
scales are STATIC per-tensor, calibrated over the network's closed input
domain [-1,1]^2 x [0,1] — NOT dynamic per-row. Dynamic scales need a
cross-lane rowmax reduction between layers, which XLA cannot fuse into the
s8xs8->s32 dot; that path streamed ~50 GB/pair of quant/dequant activation
traffic and measured 61.6 ms/pair for the full MLP vs 33.4 bf16. With
static scales the requant is pure elementwise work with per-column vectors
(the weight scale, activation scale, and int8 zero-point correction all
pre-folded by quantize_mlp), XLA fuses it into the GEMM chain, and the
full MLP runs at 22.7 ms/pair — 1.5x the bf16 chain. A whole-chain
VMEM-resident Pallas kernel was also built and measured SLOWER (36.5 ms
best over row tiles 512-2048): one grid program runs its 11 data-dependent
dots serially, losing the cross-GEMM pipelining XLA gets on full-batch
[786k, 512] operands — so it was deleted in favor of this XLA path.

Numerics: bf16 GEMMs accumulate in f32 (preferred_element_type); the int8
path rescales in f32 between layers. PSF sum-normalization commutes with
the per-pixel convolution (the norm depends only on the output pixel), so
it is folded into the conv kernel's epilogue rather than materialized here.
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

    quant: None for bf16, or the static-scale int8 pack from quantize_mlp.
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
# int8 (w8a8) trunk with static activation scales
# ---------------------------------------------------------------------------

def _calibrate_amax(np_layers, n_cal=65536, margin=1.05, seed=0):
    """Per-trunk-layer input amax over the CLOSED query domain
    [-1,1]^2 x [0,1] (the mirrored-x right-view queries live in the same
    domain by symmetry). Numpy forward on n_cal random points + corners;
    values above amax*margin at runtime clip, which the fidelity gate
    (scripts/gate_render_variants.py) bounds on real captures."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n_cal, 3)).astype(np.float32)
    x[:, 2] = rng.uniform(0, 1, n_cal)
    corners = np.array([[sx, sy, z] for sx in (-1, 1) for sy in (-1, 1)
                        for z in (0.0, 0.5, 1.0)], np.float32)
    x = np.concatenate([x, corners])
    h = np.maximum(x @ np_layers[0][0] + np_layers[0][1], 0.0)
    h = np.maximum(h @ np_layers[1][0] + np_layers[1][1], 0.0)
    amax = [float(h.max())]
    for w, b in np_layers[2:-1]:
        h = np.maximum(h @ w + b, 0.0)
        amax.append(float(h.max()))
    return [a * margin + 1e-12 for a in amax]


def quantize_mlp(params):
    """Precompute the static-scale int8 trunk pack (a plain pytree, safe to
    close over or pass into jit; params must be concrete, not traced).

    Weights: symmetric per-output-channel scales ws = amax(w, col)/127.
    Activations: ReLU outputs quantized asymmetrically with a STATIC
    per-tensor scale sa_i = calibrated_amax_i / 255 as
        hq = clip(round(h / sa), 0, 255) - 128        (full signed-8 range)
    so the dequant of acc = hq @ wq is
        h_out = relu(acc * wse + be)
    with wse = sa*ws and be = b + 128*colsum(wq)*wse both precomputed —
    the whole inter-layer step is elementwise with per-column vectors and
    fuses into the s8xs8->s32 GEMM chain.

    Returns {"wq": list of [in_i, out_i] int8, "sc": list of [4, out_i] f32}
    (lists, not stacked arrays, so non-square trunk layers — e.g. the
    PSFMLPBasis coefficient layer — quantize too; a list is an ordinary jit
    pytree). sc rows: 0 = raw bias (debug), 1 = wse, 2 = be, 3 = 1/sa of
    the layer's INPUT broadcast across columns.
    """
    layers = dense_layers(params)
    np_layers = [(np.asarray(w, np.float32), np.asarray(b, np.float32))
                 for w, b in layers]
    amax = _calibrate_amax(np_layers)
    sc = []
    wq = []
    for i, (w, b) in enumerate(np_layers[2:-1]):
        ws = np.abs(w).max(0) / 127.0 + 1e-12              # per out-channel
        q = np.round(w / ws).astype(np.int8)
        wq.append(jnp.asarray(q))
        sa = amax[i] / 255.0
        wse = sa * ws
        sci = np.zeros((4, w.shape[1]), np.float32)
        sci[0, :] = b
        sci[1, :] = wse
        sci[2, :] = b + 128.0 * q.astype(np.float32).sum(0) * wse
        sci[3, :] = 1.0 / sa
        sc.append(jnp.asarray(sci))
    return {"wq": wq, "sc": sc}


def quant_trunk(layers, qd, x):
    """int8 (w8a8, static scales) forward of the PSFMLP trunk. Layers 0..1
    (3->128->512) stay bf16 (negligible FLOPs, widest dynamic range); the
    512x512 chain runs int8 x int8 -> int32 on the MXU with the requant
    fused into the GEMM chain by XLA (see module docstring)."""
    h = x.astype(jnp.bfloat16)
    for w, b in layers[:2]:
        h = jax.lax.dot_general(
            h, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = jax.nn.relu(h + b)
    # h: [2P, 512] f32, non-negative (ReLU)
    n_trunk = len(qd["wq"])
    inv0 = qd["sc"][0][3, 0]
    hq = (jnp.clip(jnp.round(h * inv0), 0.0, 255.0) - 128.0).astype(jnp.int8)
    for i in range(n_trunk):
        acc = jax.lax.dot_general(
            hq, qd["wq"][i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        wse, be = qd["sc"][i][1, :], qd["sc"][i][2, :]
        y = jax.nn.relu(acc.astype(jnp.float32) * wse[None, :] + be[None, :])
        if i < n_trunk - 1:
            inv = qd["sc"][i + 1][3, 0]
            hq = (jnp.clip(jnp.round(y * inv), 0.0, 255.0)
                  - 128.0).astype(jnp.int8)
        else:
            h = y
    return h
