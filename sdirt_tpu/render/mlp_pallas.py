"""Fused PSF-MLP megakernel (Pallas/Mosaic).

The XLA path for the render-time MLP (reference psfnet.py:683-694 predicts a
per-pixel PSF with a 3->128->512x9->ks^2 all-ReLU MLP) dispatches 11 separate
matmuls; between layers the [N, 512] activation tensor (N = 2*H*W queries at
512x768, ~786k rows) streams out to HBM and back, ~400 MB per layer boundary
in bf16. This kernel runs ALL layers for a tile of pixels inside VMEM:

  HBM traffic per tile = input [T, 3] + output [T, ks^2] only;
  weights (~4.8 MB bf16) stay VMEM-resident across grid steps because their
  BlockSpec index_map is constant, so Mosaic fetches them once.

Matmuls accumulate in f32 on the MXU (preferred_element_type) with bf16
operands — the same numerics as the XLA bf16 path the render already uses.

STATUS (measured on the dev chip, marginal-dispatch timing at 512x768):
XLA bf16 chain 28.9 ms (~131 TF/s, 66% of v5e bf16 peak) vs this kernel
51.7 ms. Parity-exact but slower: within one grid step the 10 layer matmuls
are strictly serialized with their VPU epilogues (bias+relu+cast), while
XLA's full-width layer passes software-pipeline MXU and VPU across row
tiles. Kept as an experimental engine and as the substrate for a future
fused MLP+conv render pass; the XLA chain remains the production default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024


def _mlp_kernel(x_ref, *refs):
    """refs = w0, b0, w1, b1, ..., wL, bL, out_ref (biases as [1, D])."""
    out_ref = refs[-1]
    wb = refs[:-1]
    h = x_ref[...].astype(jnp.bfloat16)
    n_layers = len(wb) // 2
    for i in range(n_layers):
        w, b = wb[2 * i], wb[2 * i + 1]
        acc = jax.lax.dot_general(
            h, w[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = jnp.maximum(acc + b[...].astype(jnp.float32), 0.0)
        h = acc.astype(jnp.bfloat16)
    out_ref[...] = h


def fused_mlp(layers, x, *, tile: int = TILE):
    """Apply the all-ReLU MLP defined by `layers` = [(w, b), ...] to x [N, F].

    Weights may be f32 or bf16; they are cast to bf16 (matching the render's
    mlp_bf16 default). Returns f32 [N, out_features].
    """
    n, f = x.shape
    out_dim = layers[-1][0].shape[1]
    n_pad = -n % tile
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    npad = x.shape[0]

    flat = []
    specs = []
    for w, b in layers:
        flat.append(w.astype(jnp.bfloat16))
        flat.append(b.reshape(1, -1).astype(jnp.float32))
        specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0)))
        specs.append(pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0)))

    grid = (npad // tile,)
    out = pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, f), lambda i: (i, 0))] + specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, out_dim), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, *flat)
    out = out.astype(jnp.float32)
    return out[:n] if n_pad else out


def dense_layers_from_params(params):
    """Extract [(kernel, bias), ...] in layer order from a flax PSFMLP tree."""
    p = params["params"] if "params" in params else params
    names = sorted((k for k in p if k.startswith("Dense_")),
                   key=lambda s: int(s.split("_")[1]))
    return [(p[k]["kernel"], p[k]["bias"]) for k in names]


def pred_psf_fused(params, inp, ks: int, *, tile: int = TILE):
    """Drop-in for psfnet.surrogate.pred_psf using the fused kernel.

    inp: [..., 3]; returns [..., 2, ks, ks] sum-normalized per view, with the
    right PSF as the x-mirrored query (reference psfnet.py:317-336).
    """
    layers = dense_layers_from_params(params)
    lead = inp.shape[:-1]
    flat = inp.reshape(-1, inp.shape[-1])
    mirrored = flat * jnp.array([-1.0, 1.0, 1.0], flat.dtype)
    both = jnp.concatenate([flat, mirrored], axis=0)
    out = fused_mlp(layers, both, tile=tile)
    n = flat.shape[0]
    psfl = out[:n].reshape(*lead, ks, ks)
    psfr = jnp.flip(out[n:].reshape(*lead, ks, ks), axis=-1)
    psf = jnp.stack([psfl, psfr], axis=-3)
    return psf / (psf.sum((-1, -2), keepdims=True) + 1e-9)
