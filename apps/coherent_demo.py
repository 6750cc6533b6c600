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
