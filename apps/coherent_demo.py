#!/usr/bin/env python
"""Coherent (interference-aware) imaging demo: interference rings from rays.

The reference carries per-surface optical-path/phase bookkeeping
(/root/reference/deeplens/basics.py:266-272, surfaces.py:435-510) and a
complex-amplitude splat branch (monte_carlo.py:109-115), but no entry point
ever exercises them. This demo drives the TPU-native coherent pipeline end
to end: a regular pupil-grid quadrature of rays is traced with phase, and
their complex amplitudes are integrated on a FINE sensor grid (~1.5 um
analysis pixels — interference structure at f/4 lives at the few-micron
scale, far below the 47 um sensor pixel where it correctly averages away).

What ray-phase binning can and cannot show: interference requires multiple
rays (pupil zones) arriving at the same sensor point with different
accumulated phase. At full f/4 aperture the rf50mm's spherical aberration
folds the pupil->sensor map near focus, so the defocused blur disk carries
concentric interference rings — the coherent panel shows them, the
incoherent one is a flat disk, from the SAME traced rays. It cannot show
diffraction beyond the geometric envelope (no rays land there); stopping
down to a one-to-one ray map correctly collapses the coherent PSF back to
the geometric one.

Outputs (to --out):
  psf_panel_<depth>.png   coherent vs incoherent PSF (log display)
  profile_<depth>.png     azimuthally averaged radial profiles
and prints a ring-contrast figure per depth.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def radial_profile(psf: np.ndarray, nbins: int = 24):
    """Azimuthally averaged profile (averages out quadrature artifacts)."""
    ks = psf.shape[-1]
    yy, xx = np.mgrid[0:ks, 0:ks].astype(np.float32) - (ks - 1) / 2
    r = np.sqrt(yy**2 + xx**2).ravel()
    idx = np.minimum((r / r.max() * nbins).astype(int), nbins - 1)
    flat = psf.ravel()
    prof = np.bincount(idx, flat, nbins) / np.maximum(
        np.bincount(idx, None, nbins), 1)
    return prof


def ring_contrast(prof: np.ndarray) -> float:
    """Detrended oscillation energy of the radial profile inside the blur
    disk: interference rings oscillate around the smooth trend; a geometric
    (incoherent) blur is monotone and scores ~0."""
    disk = prof > 0.05 * prof.max()
    p = prof[disk]
    if len(p) < 7:
        return 0.0
    k = 5
    trend = np.convolve(p, np.ones(k) / k, mode="valid")
    resid = p[k // 2:k // 2 + len(trend)] - trend
    return float(resid.std() / (p.mean() + 1e-12))


def interference_image(lens, depths, ks, ps, M, h=256, w=320, seed=0):
    """Coherent-phase rendering beyond PSFs: image a sparse emitter scene.

    Builds a layered scene of point emitters and thin bars on a black field
    at each object depth (mutually incoherent layers — distinct sources),
    renders every layer twice from the SAME traced rays — once with the
    complex-amplitude (coherent) on-axis PSF, once with the energy-sum
    (incoherent) one — and composites additively. The scene lives on the
    FINE analysis grid (`ps` mm per pixel, ~1.5 um), i.e. a microscope-scale
    sensor patch: that is where f/4 interference structure exists; at the
    47 um sensor pitch both renders correctly agree.

    Returns (img_coh, img_inc, probe_pts): [h, w] float arrays and the
    (y, x, depth) of one guaranteed-isolated probe emitter per depth.
    """
    import jax.numpy as jnp

    from sdirt_tpu.dp.coherent import coherent_psf_grid
    from sdirt_tpu.render.perpixel import uniform_psf_conv

    rng = np.random.default_rng(seed)
    img_coh = np.zeros((h, w), np.float32)
    img_inc = np.zeros((h, w), np.float32)
    probes = []
    margin = ks
    for li, depth in enumerate(depths):
        coh, inc = coherent_psf_grid(lens, depth, grid=1, ks=ks, M=M, ps=ps)
        coh = np.array(coh)[0, 0]
        inc = np.array(inc)[0, 0]
        coh /= coh.sum() + 1e-12          # energy-normalize for compositing
        inc /= inc.sum() + 1e-12

        layer = np.zeros((h, w), np.float32)
        for _ in range(14):               # random point emitters
            layer[rng.integers(margin, h - margin),
                  rng.integers(margin, w - margin)] = rng.uniform(0.5, 1.0)
        x0 = rng.integers(margin, w - margin)  # one thin vertical bar
        layer[rng.integers(margin, h // 2): rng.integers(h // 2 + 1, h - margin),
              x0] = 0.8
        # guaranteed-isolated probe emitter in this depth's image third
        py = h // 2
        px = int((li + 0.5) / len(depths) * (w - 2 * margin)) + margin
        layer[py - ks: py + ks, px - ks: px + ks] = 0.0
        layer[py, px] = 1.0
        probes.append((py, px, depth))

        lay4 = jnp.asarray(layer)[None, :, :, None]
        img_coh += np.asarray(uniform_psf_conv(
            lay4, jnp.asarray(coh)[None], ks))[0, :, :, 0]
        img_inc += np.asarray(uniform_psf_conv(
            lay4, jnp.asarray(inc)[None], ks))[0, :, :, 0]
    return img_coh, img_inc, probes


def run_image_mode(lens, args):
    import matplotlib.pyplot as plt

    img_coh, img_inc, probes = interference_image(
        lens, args.depths, args.ks, args.ps, args.M)

    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    vmax = max(img_coh.max(), img_inc.max())
    for ax, im, name in ((axes[0], img_coh, "coherent"),
                         (axes[1], img_inc, "incoherent")):
        ax.imshow(np.power(im / vmax, 0.4), cmap="inferno")
        ax.set_title(name)
        ax.set_axis_off()
    axes[2].imshow(img_coh - img_inc, cmap="coolwarm")
    axes[2].set_title("difference")
    axes[2].set_axis_off()
    um = args.ps * 1e3
    fig.suptitle(f"interference imaging, {um:.1f} um/px, "
                 f"depths {tuple(int(-d) for d in args.depths)} mm")
    path = f"{args.out}/interference_image.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)

    for py, px, depth in probes:
        r = args.ks // 2
        crop_c = img_coh[py - r: py + r + 1, px - r: px + r + 1]
        crop_i = img_inc[py - r: py + r + 1, px - r: px + r + 1]
        print(f"probe @ depth {depth:9.1f} mm  in-image ring contrast: "
              f"coherent {ring_contrast(radial_profile(crop_c)):.3f} vs "
              f"incoherent {ring_contrast(radial_profile(crop_i)):.3f}")
    print(f"Wrote {path}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lens", default="./lenses/rf50mm/lens_web.json")
    ap.add_argument("--depths", type=float, nargs="+",
                    default=(-1000.0, -1100.0, -1300.0))
    ap.add_argument("--ks", type=int, default=65,
                    help="analysis window in fine pixels")
    ap.add_argument("--ps", type=float, default=0.0015,
                    help="analysis pixel pitch, mm (1.5 um default)")
    ap.add_argument("--M", type=int, default=512,
                    help="pupil quadrature grid (M*M rays per point)")
    ap.add_argument("--fnum", type=float, default=0.0,
                    help="optionally stop the lens down (0 keeps native "
                         "f/4). Multi-path interference needs the full "
                         "aperture's spherical aberration; stopped down, "
                         "the pupil->sensor map turns one-to-one and the "
                         "coherent PSF correctly collapses to the "
                         "geometric one")
    ap.add_argument("--out", default="./results/coherent_demo")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--image", action="store_true",
                    help="also render the multi-depth interference-imaging "
                         "panel (coherent vs incoherent composite scene)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sdirt_tpu.dp.coherent import coherent_psf_grid
    from sdirt_tpu.optics.lens import Lens

    os.makedirs(args.out, exist_ok=True)
    lens = Lens(args.lens, sensor_res=(512, 768))
    lens.refocus(-1000 + lens.d_sensor)   # 1 m focus, like the fit pipeline
    if args.fnum:
        lens.set_aperture(fnum=args.fnum)

    if args.image:
        run_image_mode(lens, args)

    for depth in args.depths:
        coh, inc = coherent_psf_grid(lens, depth, grid=1, ks=args.ks,
                                     M=args.M, ps=args.ps)
        coh, inc = np.asarray(coh)[0, 0], np.asarray(inc)[0, 0]

        fig, axes = plt.subplots(1, 2, figsize=(8, 4))
        for ax, psf, name in ((axes[0], coh, "coherent"),
                              (axes[1], inc, "incoherent")):
            ax.imshow(np.log10(psf + 1e-4), cmap="inferno")
            ax.set_title(name)
            ax.set_axis_off()
        um = args.ps * 1e3 * args.ks
        fig.suptitle(f"depth {depth:.0f} mm — {um:.0f} um window")
        fig.savefig(f"{args.out}/psf_panel_{int(-depth)}.png", dpi=120,
                    bbox_inches="tight")
        plt.close(fig)

        pc, pi = radial_profile(coh), radial_profile(inc)
        fig, ax = plt.subplots(figsize=(5, 3.2))
        r_um = np.linspace(0, args.ps * 1e3 * args.ks / 2 * 1.414, len(pc))
        ax.semilogy(r_um, pc + 1e-5, label="coherent")
        ax.semilogy(r_um, pi + 1e-5, label="incoherent")
        ax.set_xlabel("radius (um)")
        ax.set_ylabel("normalized intensity")
        ax.legend()
        fig.savefig(f"{args.out}/profile_{int(-depth)}.png", dpi=120,
                    bbox_inches="tight")
        plt.close(fig)

        print(f"depth {depth:9.1f} mm  ring contrast: "
              f"coherent {ring_contrast(pc):.3f} vs "
              f"incoherent {ring_contrast(pi):.3f}")

    print(f"Wrote panels to {args.out}")


if __name__ == "__main__":
    main()
