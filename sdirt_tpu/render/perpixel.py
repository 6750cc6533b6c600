"""Spatially-varying per-pixel dual-PSF convolution.

Parity source: /root/reference/deeplens/render_psf.py:120-155
(local_psf_render_fast). The reference materializes an unfold of the padded
image ([B, C*ks^2, H*W] — O(H W ks^2) memory) and runs fp16 elementwise
multiply/fold. TPU-first redesign: scan over the ks^2 taps with a
dynamic-slice window — the image is streamed tap-by-tap, nothing is
materialized beyond one [N,H,W,C] accumulator per view, and the whole loop
fuses under jit. The dominant HBM traffic is the per-pixel kernel tensor
itself (read exactly once). Compute runs in bf16 (the reference uses fp16),
accumulating in f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("ks", "mirror_right"))
def local_dp_conv(img, psf, ks: int, mirror_right: bool = False):
    """Per-pixel DP convolution.

    img: [N, H, W, C] (linear luminance)
    psf: [N, H, W, 2, ks, ks] per-pixel left/right kernels
    Returns (render_l, render_r): [N, H, W, C].

    out[v, y, x] = sum_{dy,dx} img_pad[y+dy, x+dx] * psf[y, x, v, ks-1-dy, ks-1-dx]
    (kernel flipped: true convolution, matching the reference's flip before
    its unfold correlation, render_psf.py:136).

    mirror_right=True consumes a right kernel that was NOT x-mirrored by
    pred_psf (flip_right=False): the mirror folds into this gather's tap
    index — k_r[dy, dx] = psf_r_raw[ks-1-dy, dx] — so no flip op appears
    anywhere in the graph. Same multiplies, same addition order: bit-exact
    vs the flip path.
    """
    n, h, w, c = img.shape
    pad = (ks - 1) // 2
    img_p = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    img_p = img_p.astype(jnp.bfloat16)
    psf_b = psf.astype(jnp.bfloat16)

    def tap(acc, idx):
        dy, dx = idx // ks, idx % ks
        patch = lax.dynamic_slice(img_p, (0, dy, dx, 0), (n, h, w, c))
        k_l = psf_b[:, :, :, 0, ks - 1 - dy, ks - 1 - dx]  # [N, H, W]
        rx = dx if mirror_right else ks - 1 - dx
        k_r = psf_b[:, :, :, 1, ks - 1 - dy, rx]
        acc_l = acc[0] + (patch * k_l[..., None]).astype(jnp.float32)
        acc_r = acc[1] + (patch * k_r[..., None]).astype(jnp.float32)
        return (acc_l, acc_r), None

    zero = jnp.zeros((n, h, w, c), jnp.float32)
    (out_l, out_r), _ = lax.scan(tap, (zero, zero), jnp.arange(ks * ks))
    return out_l, out_r


@partial(jax.jit, static_argnames=("ks",))
def uniform_psf_conv(img, psf, ks: int):
    """Same PSF at every pixel: plain grouped convolution on the MXU
    (reference render_psf.py:12-28).

    img: [N, H, W, C], psf: [C, ks, ks]. Reflect padding like the reference.
    """
    pad = (ks - 1) // 2
    img_p = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # depthwise conv: rhs [ks, ks, C_in/groups=1, C_out=C]
    kern = jnp.flip(psf, (-1, -2)).transpose(1, 2, 0)[:, :, None, :]
    return lax.conv_general_dilated(
        img_p, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=img.shape[-1],
    )


def psf_map_conv(img, psf_map, grid: int):
    """Patchwise PSF-map convolution (reference render_psf.py:31-73):
    a different kernel per image patch, overlap-padded to avoid seams.

    img: [N, H, W, C]; psf_map: [C, grid*ks, grid*ks].
    """
    cpsf, hpsf, wpsf = psf_map.shape
    assert hpsf % grid == 0 and wpsf % grid == 0
    ks = hpsf // grid
    assert ks % 2 == 1, "PSF kernel size should be odd"
    n, h, w, c = img.shape
    pad = (ks - 1) // 2
    img_p = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    rows = []
    for i in range(grid):
        cols = []
        for j in range(grid):
            psf = psf_map[:, i * ks:(i + 1) * ks, j * ks:(j + 1) * ks]
            kern = jnp.flip(psf, (-1, -2)).transpose(1, 2, 0)[:, :, None, :]
            h0, w0 = i * h // grid, j * w // grid
            h1, w1 = (i + 1) * h // grid, (j + 1) * w // grid
            patch = img_p[:, h0:h1 + 2 * pad, w0:w1 + 2 * pad, :]
            out = lax.conv_general_dilated(
                patch, kern, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)
            cols.append(out)
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def render_single_image(lens, img, depth: float, psf_grid: int = 21,
                        psf_ks: int = 44, noise: float = 0.0, key=None):
    """Render one ndarray image through the lens via a patchwise PSF map
    (reference optics.py:724-809, method='psf'). img: [H, W, 3] uint8/float.

    Note the reference uses an even ks=44 here and psf_map_conv asserts odd;
    we bump even sizes by one.
    """
    import jax
    import numpy as np

    from ..dp.psf import compute_psf_rgb
    from ..optics.sampling import point_source_grid

    key = jax.random.PRNGKey(0) if key is None else key
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    if psf_ks % 2 == 0:
        psf_ks += 1
    h, w, _ = img.shape

    pts = point_source_grid(depth=depth, grid=psf_grid).reshape(-1, 3)
    psfs = jnp.asarray(compute_psf_rgb(lens, pts, key=key, ks=psf_ks))
    psfs = psfs / (psfs.sum((-1, -2), keepdims=True) + 1e-9)
    psf_map = psfs.reshape(psf_grid, psf_grid, 3, psf_ks, psf_ks)
    psf_map = psf_map.transpose(2, 0, 3, 1, 4).reshape(3, psf_grid * psf_ks,
                                                       psf_grid * psf_ks)
    out = psf_map_conv(jnp.asarray(img)[None], psf_map, psf_grid)[0]
    if noise > 0:
        k = jax.random.split(key)[0]
        out = out + jax.random.normal(k, out.shape) * noise
    return np.asarray(jnp.clip(out, 0, 1))
