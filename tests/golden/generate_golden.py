"""Generate golden parity fixtures from the reference PyTorch implementation.

Runs /root/reference (read-only) on CPU with stubs for its unavailable heavy
deps (torchvision/skimage/lpips are only used for visualization/metrics, not
for the numerics dumped here) and records:

  - paraxial geometry: pupils, hfov, foclen, fnum, refocused d_sensor
  - traced ray state at the sensor for a FIXED deterministic ray set
  - PSFs from forward_integral for the same fixed rays + fixed chief centers
  - dual-pixel microlens split weights for a grid of incidence slopes

Usage: python tests/golden/generate_golden.py
Output: tests/golden/*.npz (committed; tests compare the JAX build to these).
"""

import sys
import types

import numpy as np


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    _stub("lpips", LPIPS=lambda **kw: (lambda *a, **k: None))
    sk = _stub("skimage")
    skm = _stub("skimage.metrics",
                peak_signal_noise_ratio=lambda *a, **k: 0.0,
                structural_similarity=lambda *a, **k: 0.0)
    skf = _stub("skimage.filters")
    sk.metrics, sk.filters = skm, skf
    tv = _stub("torchvision")
    tvu = _stub("torchvision.utils", save_image=lambda *a, **k: None,
                make_grid=lambda *a, **k: None)
    tvt = _stub("torchvision.transforms")
    tvtf = _stub("torchvision.transforms.functional", resize=lambda *a, **k: None)
    tv.utils, tv.transforms = tvu, tvt
    tvt.functional = tvtf


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch

    torch.manual_seed(0)
    from deeplens.monte_carlo import (assign_points_to_pixels_big_r,
                                      assign_points_to_pixels_small_r,
                                      forward_integral)
    from deeplens.optics import Lensgroup
    from deeplens.basics import Ray

    out = {}
    rng = np.random.default_rng(1234)

    for lens_name in ("rf50mm", "rf35mm"):
        lens = Lensgroup(filename=f"/root/reference/lenses/{lens_name}/lens_web.json",
                         sensor_res=(512, 768), device="cpu")
        g = {}
        g["d_sensor"] = lens.d_sensor
        g["hfov"] = lens.hfov
        g["foclen"] = lens.foclen
        g["fnum"] = lens.fnum
        g["aper_idx"] = lens.aper_idx
        g["entrance_pupil"] = np.array(lens.entrance_pupil())
        g["exit_pupil"] = np.array(lens.exit_pupil())
        fp, bp = lens.calc_principal()
        g["principal"] = np.array([fp, bp])

        # ---- fixed forward trace: point sources through pupil ----
        pupilz, pupilr = lens.entrance_pupil()
        n_pts, spp = 6, 64
        pts = np.stack([
            np.array([0.0, 0.0, -1000.0]),
            np.array([5.0, 3.0, -1000.0]),
            np.array([-8.0, 6.0, -2000.0]),
            np.array([12.0, -10.0, -5000.0]),
            np.array([40.0, 30.0, -937.75]),
            np.array([-60.0, -45.0, -10000.0]),
        ]).astype(np.float32)
        theta = rng.uniform(0, 2 * np.pi, spp)
        r = np.sqrt(rng.uniform(0, 1, spp)) * pupilr
        pupil_xy = np.stack([r * np.cos(theta), r * np.sin(theta)], -1).astype(np.float32)
        g["trace_points"] = pts
        g["trace_pupil_xy"] = pupil_xy

        o = np.broadcast_to(pts[None], (spp, n_pts, 3)).copy()
        o2 = np.concatenate([pupil_xy, np.full((spp, 1), pupilz, np.float32)], -1)
        d = o2[:, None, :] - o
        for wvln_name, wvln in (("g", 0.589), ("r", 0.656), ("b", 0.486)):
            ray = Ray(torch.tensor(o), torch.tensor(d), wvln=wvln, device="cpu")
            ray = lens.trace2sensor(ray)
            g[f"sensor_o_{wvln_name}"] = ray.o.numpy()
            g[f"sensor_d_{wvln_name}"] = ray.d.numpy()
            g[f"sensor_ra_{wvln_name}"] = ray.ra.numpy()
            g[f"sensor_obliq_{wvln_name}"] = ray.obliq.numpy()

        # ---- backward trace (exit-pupil style rays) ----
        mb = 32
        o1 = np.tile(np.array([lens.r_last, 0.0, lens.d_sensor], np.float32), (mb, 1))
        ez, er = lens.exit_pupil(shrink_pupil=True)
        x2 = np.linspace(-er, er, mb).astype(np.float32)
        o2b = np.stack([x2, np.zeros(mb, np.float32), np.full(mb, ez, np.float32)], -1)
        ray = Ray(torch.tensor(o1), torch.tensor(o2b - o1), device="cpu")
        ray, _, _ = lens.trace(ray)
        g["back_o"] = ray.o.numpy()
        g["back_d"] = ray.d.numpy()
        g["back_ra"] = ray.ra.numpy()

        # ---- forward_integral PSF on the fixed traced green rays ----
        ray = Ray(torch.tensor(o), torch.tensor(d), wvln=0.589, device="cpu")
        ray = lens.trace2sensor(ray)
        pointc = torch.tensor(-pts[:, :2] * 0.99)  # arbitrary fixed chief centers
        ks = 21
        psf = forward_integral(ray, ps=lens.pixel_size, ks=ks, pointc_ref=pointc)
        g["psf_points_fixed_center"] = psf.numpy()
        g["psf_pointc"] = pointc.numpy()
        # RMS-centered variant
        psf2 = forward_integral(ray, ps=lens.pixel_size, ks=ks, pointc_ref=None)
        g["psf_points_rms_center"] = psf2.numpy()

        # ---- refocus ----
        if lens_name == "rf50mm":
            d_sensor_override = 62.25
        else:
            d_sensor_override = 80.447
        lens.d_sensor = d_sensor_override
        lens.refocus(-1000 + d_sensor_override)
        g["d_sensor_refocused"] = lens.d_sensor
        g["hfov_refocused"] = lens.hfov
        g["fnum_refocused"] = lens.fnum

        np.savez(f"/root/repo/tests/golden/{lens_name}.npz", **g)
        print(lens_name, {k: v for k, v in g.items() if np.isscalar(v)})

    # ---- DP microlens split weights (lens-independent) ----
    x_tan = np.linspace(-0.8, 0.8, 257).astype(np.float32)
    xt = torch.tensor(x_tan)
    pts2 = torch.zeros(257, 2)
    ra = torch.ones(257)
    ks = 21
    ps = 24.0 / 512
    rangev = [(-ks / 2 + 0.5) * ps, (ks / 2 - 0.5) * ps]
    for tag, fn, params in (
        ("small_r", assign_points_to_pixels_small_r, (0.78, 1.44, 0.3, 0.5, "l")),
        ("big_r", assign_points_to_pixels_big_r, (0.78, 1.44, 0.3, 0.7, "l")),
    ):
        # Single-ray grids: splat one ray at center per x_tan to recover weights
        grids_l = []
        grids_r = []
        for i in range(0, 257, 16):
            p1 = torch.zeros(1, 2)
            l, rr = fn(points=p1, ks=ks, x_range=rangev, y_range=rangev,
                       ra=torch.ones(1), obliq=None, x_tan=xt[i:i + 1],
                       param_list=list(params))
            grids_l.append(l.sum().item())
            grids_r.append(rr.sum().item())
        out[f"dp_{tag}_x_tan"] = x_tan[::16]
        out[f"dp_{tag}_w_l"] = np.array(grids_l, np.float32)
        out[f"dp_{tag}_w_r"] = np.array(grids_r, np.float32)

    np.savez("/root/repo/tests/golden/dp_weights.npz", **out)
    print("dp weights dumped")


if __name__ == "__main__":
    main()
