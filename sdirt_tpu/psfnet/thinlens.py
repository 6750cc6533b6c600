"""Thin-lens Gaussian-PSF baseline renderer (no ray tracing).

Parity source: /root/reference/deeplens/psfnet.py:788-869. Depth of field via
the thin-lens circle-of-confusion formula; per-pixel Gaussian kernels, then
the same spatially-varying convolution as the main pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.constants import DMAX, DMIN
from ..render.perpixel import local_dp_conv


class ThinLens:
    def __init__(self, foc_len: float, fnum: float, kernel_size: int,
                 sensor_size, sensor_res):
        self.d_max = DMAX
        self.d_min = DMIN
        self.kernel_size = kernel_size
        self.foc_len = foc_len
        self.fnum = fnum
        self.sensor_size = list(sensor_size)
        self.sensor_res = tuple(sensor_res)
        self.ps = self.sensor_size[0] / self.sensor_res[0]

    def coc(self, depth, foc_dist):
        """CoC diameter in pixels (reference psfnet.py:802-810)."""
        depth = jnp.abs(depth)
        foc_dist = jnp.abs(foc_dist)
        depth = jnp.clip(depth, self.d_min, self.d_max)
        coc = (self.foc_len / self.fnum * jnp.abs(depth - foc_dist) / depth
               * self.foc_len / (foc_dist - self.foc_len))
        return jnp.clip(coc / self.ps, 0.1, None)

    @partial(jax.jit, static_argnames=("self",))
    def _psf(self, depth, foc_dist):
        ks = self.kernel_size
        x, y = jnp.meshgrid(jnp.linspace(-ks / 2 + 0.5, ks / 2 - 0.5, ks),
                            jnp.linspace(ks / 2 - 0.5, -ks / 2 + 0.5, ks),
                            indexing="xy")
        radius = (self.coc(depth, foc_dist) / 2)[..., None, None]
        r2 = x**2 + y**2
        psf = jnp.exp(-r2 / (2 * radius**2)) / (2 * jnp.pi * radius**2)
        psf = psf * (r2 < radius**2)
        return psf / (psf.sum((-1, -2), keepdims=True) + 1e-9)

    def render(self, img, depth, foc_dist, train: bool = False, key=None):
        """img [N,C,H,W], depth [N,1,H,W] (mm), foc_dist [N] -> [N,2C,H,W]
        (identical Gaussian kernel on both DP views)."""
        img = jnp.asarray(img, jnp.float32)
        depth = jnp.asarray(depth, jnp.float32)
        if depth.ndim == 3:
            depth = depth[:, None]
        n, c, h, w = img.shape
        foc = jnp.asarray(foc_dist, jnp.float32).reshape(n, 1, 1, 1)
        psf = self._psf(depth.reshape(n, h, w), foc.reshape(n, 1, 1))
        psf2 = jnp.stack([psf, psf], axis=-3)          # [N,H,W,2,ks,ks]
        lum = img.transpose(0, 2, 3, 1)
        rl, rr = local_dp_conv(lum, psf2, self.kernel_size)
        out = jnp.concatenate([rl, rr], axis=-1).transpose(0, 3, 1, 2)
        return jnp.clip(out, 0.0, 1.0)
