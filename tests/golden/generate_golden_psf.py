"""Golden: full PSF pipeline through the reference with INJECTED pupil
samples, at the production configuration (d_sensor override + 1m refocus,
reference psfnet.py:42-52, 1_fit_psfnet.py:23-25).

Dumps, for the compare_psf field points (psfnet.py:529-551), the reference's
chief-ray centers and final max-normalized left/right-eligible PSF so the JAX
build can be compared ray-for-ray (L1 <= 1e-3 target from BASELINE.json).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests/golden")
from generate_golden import install_stubs

install_stubs()
sys.path.insert(0, "/root/reference")
import torch

from deeplens.monte_carlo import forward_integral
from deeplens.optics import Lensgroup
from deeplens.basics import Ray

SPP_MAIN = 8192
SPP_CHIEF = 2048
KS = 21


def replica_psf(lens, points_norm, pupil_main, pupil_chief, param_list=None):
    """Replicates psf_diff (optics.py:934-996) with injected pupil samples."""
    points = torch.tensor(points_norm)
    depth = points[:, 2]
    scale = -depth * np.tan(lens.hfov) / lens.r_last
    point_obj = points.clone()
    point_obj[:, 0] = points[:, 0] * scale * lens.sensor_size[1] / 2
    point_obj[:, 1] = points[:, 1] * scale * lens.sensor_size[0] / 2

    pupilz, pupilr = lens.entrance_pupil()

    def make_rays(pupil_xy, shrink):
        spp = pupil_xy.shape[0]
        r = pupil_xy * (0.25 if shrink else 1.0)
        o = point_obj.unsqueeze(0).repeat(spp, 1, 1)
        o2 = torch.cat([torch.tensor(r), torch.full((spp, 1), pupilz)], dim=-1).float()
        d = o2.unsqueeze(1) - o
        return Ray(o, d, wvln=0.589, device="cpu")

    # chief-ray center (optics.py:898-904)
    chief = make_rays(pupil_chief, shrink=True)
    chief = lens.trace2sensor(chief)
    c = (chief.o * chief.ra.unsqueeze(-1)).sum(0) / chief.ra.unsqueeze(-1).sum(0).add(1e-9)
    pointc = -c[..., :2]

    rays = make_rays(pupil_main, shrink=False)
    rays = lens.trace2sensor(rays)
    psf = forward_integral(rays, ps=lens.pixel_size, ks=KS, pointc_ref=pointc,
                           param_list=param_list)
    vals = psf.reshape(psf.shape[0], -1).max(-1).values[:, None, None]
    psf = psf / (vals + 1e-6)
    return pointc.numpy(), psf.numpy()


def main():
    rng = np.random.default_rng(77)

    g = {}
    lens = Lensgroup(filename="/root/reference/lenses/rf50mm/lens_web.json",
                     sensor_res=(512, 768), device="cpu")
    lens.d_sensor = 62.25
    torch.manual_seed(0)
    lens.refocus(-1000 + 62.25)
    g["d_sensor"] = lens.d_sensor
    g["hfov"] = lens.hfov
    g["pupil"] = np.array(lens.entrance_pupil())

    # compare_psf grid (psfnet.py:530-539): x=y in {0,0.4,0.8}, two depths
    d_sensor = lens.d_sensor
    pts = []
    for depth in (-500.0 + d_sensor, -20000.0 + d_sensor):
        for v in (0.0, 0.4, 0.8):
            pts.append([v, v, depth])
    pts = np.array(pts, np.float32)
    g["points"] = pts

    _, pupilr = lens.entrance_pupil()
    theta = rng.uniform(0, 2 * np.pi, SPP_MAIN)
    r = np.sqrt(rng.uniform(0, 1, SPP_MAIN)) * pupilr
    pm = np.stack([r * np.cos(theta), r * np.sin(theta)], -1).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi, SPP_CHIEF)
    r = np.sqrt(rng.uniform(0, 1, SPP_CHIEF)) * pupilr
    pc = np.stack([r * np.cos(theta), r * np.sin(theta)], -1).astype(np.float32)
    g["pupil_main"] = pm
    g["pupil_chief"] = pc

    pointc, psf = replica_psf(lens, pts, pm, pc, param_list=None)
    g["pointc"] = pointc
    g["psf_l"] = psf

    # Also with explicit DP params -> right PSF filled (monte_carlo.py:231)
    pointc2, psf_lr = replica_psf(lens, pts, pm, pc,
                                  param_list=[0.78, 1.44, 0.3, 0.5, "l"])
    g["psf_l_params"] = psf_lr

    np.savez("/root/repo/tests/golden/psf_rf50mm.npz", **g)
    print("saved; d_sensor", lens.d_sensor, "hfov", lens.hfov)


if __name__ == "__main__":
    main()
