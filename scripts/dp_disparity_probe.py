#!/usr/bin/env python
"""DP disparity-vs-depth probe: how much signal does depth estimation have?

Queries the fitted PSF surrogate on-axis across depth and reports the
left/right PSF centroid separation (the stereo baseline the DfDP cost
volume sees) and the blur radius. Quantifies the physical ceiling of
depth-from-dual-pixel for a lens/focus configuration: where the disparity
curve flattens, per-pixel depth discrimination is impossible no matter the
network. (rf50mm @ 1 m focus: ~2.3 px of total swing below 2 m, but only
~0.13 px between 5 m and 9 m.)

Usage: python scripts/dp_disparity_probe.py [--lens ...] [--ckpt ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="lenses/rf50mm/lens_web.json")
    ap.add_argument("--ckpt", default="ckpt/rf50mm/F4_PSFNet_mlp")
    ap.add_argument("--ks", type=int, default=21)
    ap.add_argument("--depths", type=float, nargs="+",
                    default=(0.3, 0.5, 0.7, 0.9, 1.0, 1.2, 1.5, 2.0, 3.0,
                             5.0, 9.0))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fnum", type=float, default=None,
                    help="re-stop the lens (e.g. 1.8 with --ks 35)")
    ap.add_argument("--focus-mm", type=float, default=-1000.0,
                    help="object-side focus (mm, negative) for --traced; "
                         "-5000 probes the 5 m-focused view of the 2-focus "
                         "stack (configs/dfdp_f4_2focus_256.yml)")
    ap.add_argument("--traced", action="store_true",
                    help="probe ray-traced PSFs instead of the fitted "
                         "surrogate (no ckpt needed; authoritative for the "
                         "physical-ceiling claim)")
    ap.add_argument("--spp", type=int, default=200_000,
                    help="rays per point for --traced")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from sdirt_tpu.psfnet.surrogate import PSFNetLens

    lens = PSFNetLens(args.lens, kernel_size=args.ks, sensor_res=(512, 768))
    if args.fnum is not None:
        lens.set_aperture(fnum=args.fnum)
        print(f"aperture re-stopped to F/{lens.fnum:.3f}")
    if args.traced:
        # match the production fit configuration (default: focus at 1 m)
        lens.refocus(args.focus_mm + lens.d_sensor)
    else:
        lens.load_net(args.ckpt)

    ks = args.ks
    xx = np.arange(ks) - ks // 2
    print(f"{'depth (m)':>10} {'disparity (px)':>15} {'blur sigma (px)':>16}")
    for d_m in args.depths:
        # same convention as the render pipeline: depth (negative mm) gets
        # the "+ d_sensor" shift before z-normalization (pipeline.py:28-29,
        # reference psfnet.py:658)
        depth_mm = -d_m * 1e3 + lens.d_sensor
        if args.traced:
            pts = np.array([[0.0, 0.0, depth_mm]], np.float32)
            psfl = np.asarray(lens.psf(pts, spp=args.spp,
                                       key=jax.random.PRNGKey(0)))[0]
            psfr = np.asarray(lens.psf(pts * np.array([-1, 1, 1], np.float32),
                                       spp=args.spp,
                                       key=jax.random.PRNGKey(1)))[0, :, ::-1]
            psf = np.stack([psfl, psfr])
        else:
            z = lens.depth2z(jnp.array([depth_mm]))
            o = jnp.stack([jnp.zeros(1), jnp.zeros(1), z], -1)
            psf = np.asarray(lens.pred(o[None])).reshape(-1, 2, ks, ks)[0]
        cl = (psf[0].sum(0) * xx).sum() / psf[0].sum()
        cr = (psf[1].sum(0) * xx).sum() / psf[1].sum()
        sig = np.sqrt((psf[0].sum(0) * (xx - cl) ** 2).sum() / psf[0].sum())
        print(f"{d_m:>10.2f} {cl - cr:>+15.3f} {sig:>16.2f}")


if __name__ == "__main__":
    main()
