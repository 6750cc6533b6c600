"""Pallas TPU kernel for the spatially-varying dual-PSF convolution.

The XLA tap-scan in perpixel.py streams the padded image per tap; this
kernel streams the dominant tensor — the per-pixel kernel stack (~0.7GB bf16
at 512x768xks21) — from HBM exactly once and accumulates in VMEM. Measured
on-device (v5e, 512x768/ks21): 10.7 ms vs the XLA scan's 10.3 ms — XLA fuses
the scan well, so this kernel is kept at parity as the substrate for a
future fully-fused MLP+conv render (where producing kernels directly into
VMEM tiles removes the 1.4GB HBM round trip entirely).

Mosaic constraints shape the design (this stack rejects dynamic sublane
slices and sliced DMAs): the kernel-row offset ky runs on the GRID with the
output block revisited and accumulated across steps; the image is pre-shifted
into ks row-offset variants so the grid's index_map (a plain leading-dim
block lookup) selects the dy shift; the kernel-column offset kx is a static
unroll over (cheap, unaligned-allowed) static lane slices. Row bands span the
full image width, so no halo blocks are ever needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(img_ref, psf_ref, out_ref, *, ks: int, th: int, w: int,
                 channels: int):
    """Grid: (n_rowbands, ks). Per step:
    img_ref: [1, C, th, w + ks-1]  — the dy = ks-1-ky row-shifted variant
    psf_ref: [1, 2*ks, th, w]      — kernel row ky, both views
    out_ref: [2*C, th, w]          — revisited across the ky grid axis.
    """
    ky = pl.program_id(1)

    @pl.when(ky == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    accs = [jnp.zeros((th, w), jnp.float32) for _ in range(2 * channels)]
    for kx in range(ks):
        dx = (ks - 1) - kx           # flipped kernel: true convolution
        patches = [img_ref[0, c, :, dx:dx + w] for c in range(channels)]
        for v in range(2):
            kmap = psf_ref[0, v * ks + kx]                  # [th, w]
            for c in range(channels):
                accs[v * channels + c] += (patches[c] * kmap).astype(jnp.float32)
    out_ref[:] = out_ref[:] + jnp.stack(accs)


@partial(jax.jit, static_argnames=("ks", "th", "interpret"))
def local_dp_conv_pallas(img, psf, ks: int, th: int = 8, interpret=False):
    """Per-pixel DP convolution with on-chip accumulation.

    img: [N, H, W, C] linear luminance
    psf: [N, H, W, 2, ks, ks] per-pixel kernels
    Returns (render_l, render_r): [N, H, W, C] f32, matching
    perpixel.local_dp_conv (bf16 compute, f32 accumulation).
    """
    n, h, w, c = img.shape
    assert h % th == 0, (h, th)
    pad = (ks - 1) // 2
    halo = ks - 1

    # [N, ks(ky), 2*ks(v,kx), H, W] kernel layout: row-major grid streaming
    psf_t = psf.transpose(0, 4, 3, 5, 1, 2).reshape(n, ks, 2 * ks, h, w)
    psf_t = psf_t.astype(jnp.bfloat16)

    img_chw = img.transpose(0, 3, 1, 2).astype(jnp.bfloat16)
    img_p = jnp.pad(img_chw, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                    mode="edge")                       # [N, C, H+halo, W+halo]
    # ks row-shifted variants: shifted[dy] = rows dy : dy+H
    idx = (jnp.arange(ks)[:, None] + jnp.arange(h)[None, :])   # [ks, H]
    img_shift = img_p[:, :, idx, :]                    # [N, C, ks, H, W+halo]
    img_shift = img_shift.transpose(0, 2, 1, 3, 4)     # [N, ks, C, H, W+halo]

    def one(img1, psf1):
        grid = (h // th, ks)
        return pl.pallas_call(
            partial(_conv_kernel, ks=ks, th=th, w=w, channels=c),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, c, th, w + halo),
                             lambda i, ky: (ks - 1 - ky, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * ks, th, w),
                             lambda i, ky: (ky, 0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * c, th, w), lambda i, ky: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * c, h, w), jnp.float32),
            interpret=interpret,
        )(img1, psf1)

    out = jax.vmap(one)(img_shift, psf_t)              # [N, 2C, H, W]
    out = out.transpose(0, 2, 3, 1)
    return out[..., :c], out[..., c:]
