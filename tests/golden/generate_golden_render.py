"""Golden: reference per-pixel DP convolution + camera response curves.

Dumps local_psf_render_fast outputs (reference render_psf.py:120-155, fp16
compute) and the fitted gamma/degamma curves (psfnet.py:589-620) on fixed
inputs, for bit-level comparison of the JAX render path.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests/golden")
from generate_golden import install_stubs

install_stubs()
sys.path.insert(0, "/root/reference")
import torch

from deeplens.render_psf import local_psf_render_fast, render_psf


def main():
    rng = np.random.default_rng(42)
    g = {}

    b, c, h, w, ks = 1, 3, 24, 40, 7
    img = rng.uniform(0, 1, (b, c, h, w)).astype(np.float32)
    psf = rng.uniform(0, 1, (b, h, w, 2, ks, ks)).astype(np.float32)
    psf = psf / psf.sum((-1, -2), keepdims=True)
    rl, rr = local_psf_render_fast(torch.tensor(img), torch.tensor(psf), ks)
    g["img"] = img
    g["psf"] = psf
    g["render_l"] = rl.numpy()
    g["render_r"] = rr.numpy()

    # uniform-PSF conv (render_psf.py:12-28)
    upsf = rng.uniform(0, 1, (c, ks, ks)).astype(np.float32)
    upsf = upsf / upsf.sum((-1, -2), keepdims=True)
    g["uniform_psf"] = upsf
    g["uniform_out"] = render_psf(torch.tensor(img), torch.tensor(upsf)).numpy()

    # camera response curves (psfnet.py:589-620) — reproduce the reference
    # formulas directly on a fixed grid
    x = np.linspace(0.0, 1.0, 257).astype(np.float32)
    a1, b1, c1 = 0.89129432, 0.27217316, -0.00246187
    a2, b2, c2 = 5.94018909e-01, 1.20060450e01, -5.24983855e-03
    xx = x * 255.0
    l1 = 1 / (1 / (a1 * xx + b1) + c1)
    l2 = 1 / (1 / (a2 * xx + b2) + c2)
    ratio = np.minimum(xx / 100.0, 1.0)
    g["degamma_x"] = x
    g["degamma_y"] = l2 * ratio + l1 * (1 - ratio)

    np.savez("/root/repo/tests/golden/render.npz", **g)
    print("saved render goldens")


if __name__ == "__main__":
    main()
