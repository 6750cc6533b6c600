"""Data-preparation tools: Middlebury PFM disparity -> 16-bit depth PNG.

Parity source: /root/reference/dfdp/data_src/pfm2depth.py. depth [mm] =
baseline * f / (disp * pfm_scale + doffs), written as uint16 PNG. The
reference depends on the `png` package; cv2 writes 16-bit PNGs natively.
"""

from __future__ import annotations

import re
from glob import glob

import cv2 as cv
import numpy as np


def read_pfm(path: str) -> tuple[np.ndarray, float]:
    """Parse a PFM file (http://davis.lbl.gov/Manuals/NETPBM/doc/pfm.html).

    Returns (data [H, W] or [H, W, 3], scale). Rows are bottom-up in the file
    and returned top-down.
    """
    with open(path, "rb") as f:
        header = f.readline().decode().rstrip()
        if header not in ("PF", "Pf"):
            raise ValueError(f"Not a PFM file: {path}")
        channels = 3 if header == "PF" else 1
        m = re.match(r"^(\d+)\s(\d+)\s*$", f.readline().decode())
        if not m:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, m.groups())
        scale = float(f.readline().decode().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.frombuffer(f.read(), dtype=endian + "f4")
    shape = (height, width, 3) if channels == 3 else (height, width)
    return np.flipud(data.reshape(shape)).copy(), abs(scale)


def read_middlebury_calib(path: str) -> tuple[float, float, float]:
    """(focal_px, doffs, baseline_mm) from a Middlebury calib.txt."""
    with open(path) as fh:
        lines = fh.readlines()
    focal = float(re.findall(r"\d+\.\d+", lines[0])[0])
    try:
        doffs = float(re.findall(r"\d+\.\d+", lines[2])[0])
    except IndexError:
        doffs = float(re.findall(r"\d+", lines[2])[0])
    baseline = float(re.findall(r"\d+\.\d+", lines[3])[0])
    return focal, doffs, baseline


def process_pfm(scene_dir: str) -> np.ndarray:
    """Convert {scene}/disp0.pfm + calib.txt -> {scene}/depth.png [mm,
    uint16] (reference pfm2depth.py:process_pfm)."""
    disp, scale = read_pfm(f"{scene_dir}/disp0.pfm")
    disp = disp * scale
    focal, doffs, baseline = read_middlebury_calib(f"{scene_dir}/calib.txt")
    depth = baseline * focal / (disp + doffs)   # [mm]
    depth_u16 = np.round(depth).astype(np.uint16)
    cv.imwrite(f"{scene_dir}/depth.png", depth_u16)
    return depth


def process_middlebury(root: str) -> None:
    for scene in glob(f"{root}/*"):
        process_pfm(scene)


if __name__ == "__main__":
    import sys

    process_middlebury(sys.argv[1] if len(sys.argv) > 1 else "./Middlebury2014")
