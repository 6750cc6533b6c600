"""Fused tap-major per-pixel DP convolution + PSF normalization (Pallas TPU).

Replaces the pred_psf -> normalize -> local_dp_conv chain of the render
pipeline (reference deeplens/psfnet.py:683-694 + render_psf.py:120-155) for
the production shapes. Three structural wins over the XLA tap-scan path:

  1. The PSF arrives TAP-MAJOR straight from the last MLP GEMM
     (mlp_fast.mlp_psf_tapmajor emits out[t, p] by transposed dot_general
     dimension numbers), so the 0.7 GB pixel-major->tap-major relayout that
     capped the retired standalone perpixel kernel never happens.
  2. Sum-normalization commutes with the convolution — the kernel divides
     the accumulated output by the in-kernel tap sum (norm depends only on
     the output pixel), so no normalized PSF tensor is ever materialized.
  3. The [N,H,W,C] f32 accumulators live in VMEM across the whole tap loop;
     the XLA scan's dominant cost (ks^2 HBM read+write round trips of the
     accumulator, ~8 GB at 512x768/ks21) becomes a single output write.

HBM traffic ~= one bf16 read of the tap-major PSF (0.69 GB at 512x768/ks21)
plus ks small reads of the row-shifted image variants (~51 MB total).

Flip bookkeeping (matches surrogate.pred_psf + perpixel.local_dp_conv):
  out_L[y,x] = sum_{ty,dx} img[y + ks-1-ty, x+dx] * netL[ty, ks-1-dx]
  out_R[y,x] = sum_{ty,dx} img[y + ks-1-ty, x+dx] * netR[ty, dx]
(the right view's stored kx-flip and the conv's kernel flip cancel), so the
kernel walks network tap rows ty on the grid and unrolls image column
offsets dx, reading the RAW network outputs for both views.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(img_ref, psf_ref, out_ref, norm_ref, *, ks: int, th: int, w: int,
            channels: int):
    """Grid: (N, H//th, ks). Per step (n, i, ty):
    img_ref:  [1, 1, C, th, w + ks-1]  — the dy = ks-1-ty row-shifted variant
    psf_ref:  [ks, 1, 2, th, w]        — network tap row ty, both views, raw
    out_ref:  [1, 2*C, th, w] f32      — revisited/accumulated across ty
    norm_ref: [2, th, w] f32 scratch   — running tap sum per view
    """
    ty = pl.program_id(2)

    @pl.when(ty == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        norm_ref[:] = jnp.zeros_like(norm_ref)

    accs = [jnp.zeros((th, w), jnp.float32) for _ in range(2 * channels)]
    nrm = [jnp.zeros((th, w), jnp.float32) for _ in range(2)]
    for dx in range(ks):
        kmap_l = psf_ref[ks - 1 - dx, 0, 0]                # netL[ty, ks-1-dx]
        kmap_r = psf_ref[dx, 0, 1]                         # netR[ty, dx]
        nrm[0] += kmap_l.astype(jnp.float32)
        nrm[1] += kmap_r.astype(jnp.float32)
        for c in range(channels):
            patch = img_ref[0, 0, c, :, dx:dx + w]
            accs[c] += (patch * kmap_l).astype(jnp.float32)
            accs[channels + c] += (patch * kmap_r).astype(jnp.float32)
    norm_ref[:] = norm_ref[:] + jnp.stack(nrm)

    @pl.when(ty < ks - 1)
    def _():
        out_ref[:] = out_ref[:] + jnp.stack(accs)[None]

    @pl.when(ty == ks - 1)
    def _():
        total = out_ref[0] + jnp.stack(accs)               # [2C, th, w]
        inv = 1.0 / (norm_ref[:] + 1e-9)                   # [2, th, w]
        scaled = [total[v * channels + c] * inv[v]
                  for v in range(2) for c in range(channels)]
        out_ref[:] = jnp.stack(scaled)[None]


@partial(jax.jit, static_argnames=("ks", "th", "interpret"))
def fused_dp_conv_tapmajor(img, psf_tm, ks: int, th: int = 32,
                           interpret: bool | None = None):
    """Normalized per-pixel DP convolution from a RAW tap-major PSF.

    img:    [N, H, W, C] linear luminance
    psf_tm: [ks*ks, N, 2, H*W] unnormalized network outputs
            (mlp_fast.mlp_psf_tapmajor; right view NOT kx-flipped)
    Returns (render_l, render_r): [N, H, W, C] f32, equal to
    local_dp_conv(img, pred_psf(...)) up to bf16 rounding.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"   # static at trace time
    n, h, w, c = img.shape
    while h % th:
        th //= 2
    pad = (ks - 1) // 2
    halo = ks - 1

    psf_g = psf_tm.reshape(ks * ks, n, 2, h, w)

    img_chw = img.transpose(0, 3, 1, 2).astype(jnp.bfloat16)
    img_p = jnp.pad(img_chw, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                    mode="edge")                           # [N, C, H+halo, W+halo]
    # ks row-shifted variants: shifted[dy] = rows dy : dy+H
    idx = jnp.arange(ks)[:, None] + jnp.arange(h)[None, :]
    img_shift = img_p[:, :, idx, :].transpose(0, 2, 1, 3, 4)  # [N, ks, C, H, W+halo]

    grid = (n, h // th, ks)
    out = pl.pallas_call(
        partial(_kernel, ks=ks, th=th, w=w, channels=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, c, th, w + halo),
                         lambda nn, i, ty: (nn, ks - 1 - ty, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ks, 1, 2, th, w),
                         lambda nn, i, ty: (ty, nn, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * c, th, w),
                               lambda nn, i, ty: (nn, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * c, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, th, w), jnp.float32)],
        interpret=interpret,
    )(img_shift, psf_g)

    out = out.transpose(0, 2, 3, 1)                        # [N, H, W, 2C]
    return out[..., :c], out[..., c:]
