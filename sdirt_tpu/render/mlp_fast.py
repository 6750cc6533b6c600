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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


# ---------------------------------------------------------------------------
# Fully-fused MLP kernel: the whole 11-Dense chain in ONE pallas_call
# ---------------------------------------------------------------------------
#
# Why: the XLA int8 path (quant_trunk below) is HBM-bound, not MXU-bound —
# XLA cannot fuse the f32 dequant epilogue / requant prologue into an
# s8xs8->s32 dot, so every trunk layer streams ~6 GB of activations
# (rowmax read, quantize read, int8 write, s32 accum write, f32 relu write)
# for a [786k, 512] batch: ~50 GB/pair ~= 60 ms at v5e HBM bandwidth, which
# is why the r3 A/B measured fused_int8 at 61.6 ms/pair vs 34.5 bf16.
#
# This kernel keeps one row-tile of activations in VMEM for the WHOLE chain:
# head (3->128->512 bf16), 8x512x512 trunk (int8 w8a8 or bf16), and the
# tap-major last layer (512->ks*ks). All 11 weight matrices (~2.5 MB int8)
# are VMEM-resident across grid steps (constant index_map). HBM traffic is
# one read of the [M, 3] queries and one bf16 write of the [ks*ks, M] PSF —
# the roofline becomes the int8 MXU (~394 TOPS on v5e) instead of HBM.

_TAP_PAD = 128   # tap rows padded to a lane multiple for the output tile


def _mlp_kernel(x_ref, w01_ref, wq_ref, sc_ref, wl_ref, out_ref, *,
                n_trunk: int, int8_trunk: bool):
    """Grid: (M // R,). Blocks:
    x_ref:   [R, 128]   bf16 — query rows, 3 valid columns, zero-padded
    w01_ref: [2, 512, 512] bf16 — head weights: slot 0 has w0 [3,128] at
             [:3, :128]; slot 1 has w1 [128,512] at [:128, :] (zero-padded
             rows/cols keep the padded activation columns exactly zero)
    wq_ref:  [n_trunk, 512, 512] int8|bf16 — trunk weights
    sc_ref:  [n_trunk, 4, 512] f32 — rows: bias, ws, cs, b01 (row 3 of
             layer 0 holds b0 in cols :128, row 3 of layer 1 holds b1)
    wl_ref:  [640, tp] bf16 — last-layer weight (rows :512) with the bias
             folded in as row 512 (consumed by an all-ones h column)
    out_ref: [tp, R] bf16 — tap-major PSF tile (tp = padded tap count)
    """
    x = x_ref[:]                                            # [R, 128] bf16
    b0 = sc_ref[0, 3, :]                                    # [512] (cols :128)
    h = jax.lax.dot_general(x, w01_ref[0, 0:128, :], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + b0[None, :]).astype(jnp.bfloat16)   # [R, 512] (:128)
    b1 = sc_ref[1, 3, :]
    h = jax.lax.dot_general(h, w01_ref[1], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + b1[None, :])                        # [R, 512] f32

    for i in range(n_trunk):
        b = sc_ref[i, 0, :]
        if int8_trunk:
            ws, cs = sc_ref[i, 1, :], sc_ref[i, 2, :]
            sa = jnp.max(h, axis=1, keepdims=True) / 255.0 + 1e-12
            hq = (jnp.round(h / sa) - 128.0).astype(jnp.int8)
            acc = jax.lax.dot_general(hq, wq_ref[i], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            h = (acc.astype(jnp.float32) + 128.0 * cs[None, :]) \
                * (sa * ws[None, :])
            h = jax.nn.relu(h + b[None, :])
        else:
            acc = jax.lax.dot_general(h.astype(jnp.bfloat16), wq_ref[i],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            h = jax.nn.relu(acc + b[None, :])

    # tap-major last layer: psf[t, p] = relu(w_l[k, t] h[p, k] + b_l[t]);
    # the bias is folded into wl via an appended all-ones h column
    # (pack_fused_mlp), so no [tp] bias vector is needed here.
    hb = jnp.concatenate(
        [h.astype(jnp.bfloat16),
         jnp.ones((h.shape[0], 128), jnp.bfloat16)], axis=1)   # [R, 640]
    psf = jax.lax.dot_general(wl_ref[:], hb, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[:] = jax.nn.relu(psf).astype(jnp.bfloat16)


def pack_fused_mlp(params, ks: int, int8_trunk: bool):
    """Host-side weight packing for mlp_psf_tapmajor_fused (cache the result:
    plain pytree, safe to close over or pass into jit)."""
    layers = dense_layers(params)
    n_trunk = len(layers) - 3
    w01 = np.zeros((2, 512, 512), np.float32)
    w01[0, :3, :128] = np.asarray(layers[0][0])             # [3, 128]
    w01[1, :128, :] = np.asarray(layers[1][0])              # [128, 512]
    sc = np.zeros((n_trunk, 4, 512), np.float32)
    sc[0, 3, :128] = np.asarray(layers[0][1])
    sc[1, 3, :] = np.asarray(layers[1][1])
    trunk = []
    for i, (w, b) in enumerate(layers[2:-1]):
        sc[i, 0, :] = np.asarray(b)
        if int8_trunk:
            s = np.abs(np.asarray(w)).max(0) / 127.0 + 1e-12
            q = np.round(np.asarray(w) / s).astype(np.int8)
            sc[i, 1, :] = s
            sc[i, 2, :] = q.astype(np.float32).sum(0)
            trunk.append(q)
        else:
            trunk.append(np.asarray(w, np.float32).astype(jnp.bfloat16))
    wl, bl = layers[-1]                                     # [512, ks*ks]
    tp = ((ks * ks + _TAP_PAD - 1) // _TAP_PAD) * _TAP_PAD
    wl_p = np.zeros((512 + 128, tp), np.float32)
    wl_p[:512, :ks * ks] = np.asarray(wl)
    wl_p[512, :ks * ks] = np.asarray(bl)                    # ones-column bias
    return {
        "w01": jnp.asarray(w01, jnp.bfloat16),
        "wq": jnp.asarray(np.stack(trunk)),
        "sc": jnp.asarray(sc),
        "wl": jnp.asarray(wl_p, jnp.bfloat16),
    }


@partial(jax.jit, static_argnames=("ks", "int8_trunk", "interpret", "rows"))
def _fused_call(packed, x, ks: int, int8_trunk: bool, interpret: bool,
                rows: int):
    m = x.shape[0]
    n_trunk = packed["wq"].shape[0]
    tp = packed["wl"].shape[1]
    xp = jnp.zeros((m, 128), jnp.bfloat16).at[:, :3].set(x.astype(jnp.bfloat16))
    kernel = partial(_mlp_kernel, n_trunk=n_trunk, int8_trunk=int8_trunk)
    psf = pl.pallas_call(
        kernel,
        grid=(m // rows,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 512, 512), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_trunk, 512, 512), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_trunk, 4, 512), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512 + 128, tp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tp, rows), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, m), jnp.bfloat16),
        interpret=interpret,
    )(xp, packed["w01"], packed["wq"], packed["sc"], packed["wl"])
    return psf[:ks * ks]


_PACK_CACHE = {}


def get_packed_mlp(params, ks: int, int8_trunk: bool):
    """Cached host-side packing (params must be concrete, NOT traced)."""
    key = (id(params), ks, int8_trunk)
    if key not in _PACK_CACHE:
        _PACK_CACHE.clear()   # one live params set per process in practice
        _PACK_CACHE[key] = pack_fused_mlp(params, ks, int8_trunk)
    return _PACK_CACHE[key]


def fused_psf_from_packed(packed, o, ks: int, *,
                          interpret: bool | None = None, rows: int = 512):
    """Tap-major PSF from pre-packed weights; safe to call under jit (the
    int8-vs-bf16 switch is the packed trunk dtype — static at trace time)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    int8_trunk = packed["wq"].dtype == jnp.int8
    x = stack_views(o)                                      # [M, 3]
    m = x.shape[0]
    r = rows
    while m % r:
        r //= 2
    psf = _fused_call(packed, x, ks, int8_trunk, interpret, r)
    n = o.shape[0]
    return psf.reshape(ks * ks, n, 2, m // (2 * n))


def mlp_psf_tapmajor_fused(params, o, ks: int, *, int8_trunk: bool = True,
                           interpret: bool | None = None, rows: int = 512):
    """Drop-in for mlp_psf_tapmajor through the single fused Pallas kernel.

    Returns the UNNORMALIZED tap-major PSF [ks*ks, N, 2, P] (right view not
    kx-flipped), bf16 — identical contract to mlp_psf_tapmajor.
    """
    packed = get_packed_mlp(params, ks, int8_trunk)
    return fused_psf_from_packed(packed, o, ks, interpret=interpret,
                                 rows=rows)


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
