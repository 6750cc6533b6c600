"""Fixture tests for the real-data loaders and the EXR codec.

Miniature synthetic dataset trees are generated on the fly with the exact
directory conventions and encodings of the reference
(/root/reference/dfdp/dataset.py:18-240): NYU jpg + png/25.5 depth,
FlyingThings AiF.png + disp.exr/20 (+ focal-stack <dist>.png frames),
Middlebury im0.png + 16-bit depth.png/1000, Middlebury_FS disp.exr/10.
A depth-scaling or EXR-decode bug surfaces here instead of on the first
real training run.
"""

import os

import cv2 as cv
import numpy as np
import pytest

from sdirt_tpu.dfdp.datasets import (FlyingThings3D, Middlebury, MiddleburyFS,
                                     NYUData, auto_augment, depth_preprocess)
from sdirt_tpu.io.exr import read_exr, write_exr

RES = (48, 64)   # (H, W) target


# ---------------------------------------------------------------------------
# fixture trees
# ---------------------------------------------------------------------------

def _write_rgb(path, h=96, w=128, value=None, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 255, (h, w, 3)) if value is None
           else np.full((h, w, 3), value)).astype(np.uint8)
    assert cv.imwrite(path, img)
    return img


@pytest.fixture
def nyu_tree(tmp_path):
    """3-image NYU scene: jpg rgb + 8-bit png depth at /25.5 scaling."""
    scene = tmp_path / "nyu" / "scene_a"
    os.makedirs(scene)
    depths_m = [2.0, 0.1, 4.0]   # 0.1 m clips up to the 0.25 m floor
    for i, dm in enumerate(depths_m):
        _write_rgb(str(scene / f"{i:04d}.jpg"), seed=i)
        dpng = np.full((96, 128), dm * 25.5, np.uint8)
        assert cv.imwrite(str(scene / f"{i:04d}.png"), dpng)
    return str(tmp_path / "nyu"), depths_m


@pytest.fixture
def flying_tree(tmp_path):
    """2 FlyingThings scenes: AiF.png + disp.exr (values are depth*20) +
    a 3-frame focal stack named <focus_dist_mm*20>.png."""
    root = tmp_path / "fly"
    rng = np.random.default_rng(7)
    for s in ("s0", "s1"):
        d = root / s
        os.makedirs(d)
        _write_rgb(str(d / "AiF.png"), seed=hash(s) % 100)
        disp = rng.uniform(0.3, 9.0, (96, 128)).astype(np.float32) * 20.0
        write_exr(str(d / "disp.exr"), disp)
        for dist in (10.0, 20.0, 40.0):   # stored value = meters * 20
            _write_rgb(str(d / f"{dist:g}.png"), seed=int(dist))
    return str(root)


@pytest.fixture
def middlebury_tree(tmp_path):
    root = tmp_path / "mb"
    scene = root / "adirondack"
    os.makedirs(scene)
    _write_rgb(str(scene / "im0.png"))
    _write_rgb(str(scene / "AiF.png"))
    dpng = np.full((96, 128), 2345, np.uint16)   # 2.345 m at /1000
    assert cv.imwrite(str(scene / "depth.png"), dpng)
    disp = np.full((96, 128), 31.4, np.float32)  # 3.14 m at /10
    disp[:4] = -1.0                              # negatives must zero out
    write_exr(str(scene / "disp.exr"), disp)
    return str(root)


# ---------------------------------------------------------------------------
# EXR codec
# ---------------------------------------------------------------------------

def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for shape, pt, comp in [((37, 53), "float", "zip"), ((16, 16), "half", "zips"),
                            ((5, 7), "float", "none"), ((33, 65), "float", "zip")]:
        d = (rng.random(shape) * 30).astype(np.float32)
        p = str(tmp_path / "t.exr")
        write_exr(p, d, pixel_type=pt, compression=comp)
        r = read_exr(p)
        want = d.astype(np.float16).astype(np.float32) if pt == "half" else d
        assert r.shape == shape and np.array_equal(r, want)


def test_exr_rgb_returns_bgr(tmp_path):
    d = np.stack([np.full((6, 8), v, np.float32) for v in (1.0, 2.0, 3.0)], -1)
    p = str(tmp_path / "rgb.exr")
    write_exr(p, d, channel_names=["R", "G", "B"])
    r = read_exr(p)
    # cv2-order (BGR) for R/G/B-named channels
    assert r.shape == (6, 8, 3)
    assert (r[..., 0] == 3.0).all() and (r[..., 2] == 1.0).all()


def test_exr_piz_reference_file():
    """Decode the PIZ-compressed EXR shipped inside the reference repo —
    real-world output of the official OpenEXR writer."""
    path = "/root/reference/dfdp/data_src/disp.exr"
    if not os.path.exists(path):
        pytest.skip("reference disp.exr not present")
    r = read_exr(path)
    assert r.shape == (496, 718) and r.dtype == np.float32
    assert np.isfinite(r).all()
    assert 0.0 <= r.min() and r.max() < 100.0       # plausible disparity range
    assert abs(float(r.mean()) - 28.5129) < 1e-3    # pinned golden mean


# ---------------------------------------------------------------------------
# dataset classes
# ---------------------------------------------------------------------------

def test_nyu_eval_scaling_and_shapes(nyu_tree):
    root, depths_m = nyu_tree
    ds = NYUData(root, resize=RES, train=False)
    assert len(ds) == 50          # fixed virtual eval length (dataset.py:33)
    rgb, depth = ds[0]
    assert rgb.shape == (3, *RES) and rgb.dtype == np.float32
    assert depth.shape == (1, *RES)
    # BICUBIC resize overshoots slightly; the reference does not clip either
    assert -0.1 <= rgb.min() and rgb.max() <= 1.1
    # png/25.5 scaling, then the 20-px crop leaves the constant plane intact
    assert np.allclose(depth, depths_m[0], atol=0.03)
    # 0.1 m clips to the 0.25 m working-range floor (dataset.py:308-315)
    _, d1 = ds[1]
    assert np.allclose(d1, 0.25, atol=1e-6)


def test_nyu_train_augments_within_range(nyu_tree):
    root, _ = nyu_tree
    ds = NYUData(root, resize=RES, train=True)
    assert len(ds) == 2000        # virtual train length (dataset.py:31)
    np.random.seed(3)
    for _ in range(8):
        rgb, depth = ds[0]
        assert rgb.shape == (3, *RES) and depth.shape == (1, *RES)
        assert -0.2 <= rgb.min() and rgb.max() <= 1.2   # bicubic overshoot
        pos = depth[depth > 0]
        assert pos.size and (pos >= 0.25).all() and (pos <= 10.0).all()


def test_flyingthings_depth_factor(flying_tree):
    ds = FlyingThings3D(flying_tree, resize=RES, train=False)
    assert len(ds) == 2
    rgb, depth = ds[0]
    assert rgb.shape == (3, *RES) and depth.shape == (1, *RES)
    # disp.exr stores depth*20; loader divides by DEPTH_FACTOR=20 then clips
    pos = depth[depth > 0]
    assert (pos >= 0.25).all() and (pos <= 9.01).all()


def test_flyingthings_focal_stack(flying_tree):
    ds = FlyingThings3D(flying_tree, resize=RES, train=True, fs_num=2)
    import random

    random.seed(0)
    stack, depth, dists = ds[0]
    assert stack.shape == (2, 3, *RES)
    assert depth.shape == (1, *RES)
    # frame names are <meters*20>.png -> loader returns meters
    assert set(np.round(dists * 20.0, 3)).issubset({10.0, 20.0, 40.0})
    assert len(dists) == 2


def test_middlebury_16bit_depth(middlebury_tree):
    ds = Middlebury(middlebury_tree, resize=RES)
    assert len(ds) == 1
    rgb, depth = ds[0]
    assert rgb.shape == (3, *RES)
    assert np.allclose(depth, 2.345, atol=1e-6)   # uint16 png / 1000


def test_middlebury_fs_exr_and_negative_zeroing(middlebury_tree):
    ds = MiddleburyFS(middlebury_tree, resize=RES)
    rgb, depth = ds[0]
    assert rgb.shape == (3, *RES)
    vals = np.unique(np.round(depth, 3))
    assert 0.0 in vals                   # negative disparities zeroed
    assert np.isclose(vals.max(), 3.14, atol=1e-3)


def test_get_dataset_mixing(nyu_tree, flying_tree):
    from sdirt_tpu.dfdp.factory import get_dataset

    root, _ = nyu_tree
    args = {"res": RES,
            "train": {"dataset": "NYUdata"}, "test": {"dataset": "FlyingThings3D"},
            "NYUdata_train": root, "FlyingThings3D_train": flying_tree,
            "FlyingThings3D_test": flying_tree}
    nyu_fs_train, nyu_train, test_set = get_dataset(args)
    # reference factory.py:58-61: NYU + 2x FlyingThings, then NYU-only
    assert len(nyu_fs_train) == 2000 + 2 * 2
    assert len(nyu_train) == 2 * 2000
    assert len(test_set) == 2
    # the concat boundary yields FlyingThings samples
    rgb, depth = nyu_fs_train[2000]
    assert rgb.shape == (3, *RES) and depth.shape == (1, *RES)


def test_auto_augment_ranges():
    rng = np.random.RandomState(11)
    img = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    depth = rng.uniform(0.5, 9.0, (96, 128)).astype(np.float32)
    for _ in range(16):
        a_img, a_depth = auto_augment(img.copy(), depth.copy(), rng=rng)
        assert 0.0 <= a_img.min() and a_img.max() <= 1.0
        # crop branch removes exactly `limit`=20 px per cropped axis
        assert a_img.shape[0] in (96, 76) and a_img.shape[1] in (128, 108)
        assert a_img.shape[:2] == a_depth.shape[:2]
        # depth scale in [0.25, 1.25]x
        assert a_depth.min() >= 0.5 * 0.25 - 1e-5
        assert a_depth.max() <= 9.0 * 1.25 + 1e-4


def test_depth_preprocess_keeps_empty_pixels():
    d = np.array([[0.0, 0.1, 5.0, 20.0]], np.float32)
    out = depth_preprocess(d.copy())
    assert np.allclose(out, [[0.0, 0.25, 5.0, 10.0]])


def test_synthetic_v5_scene_statistics():
    """v5 scenes stay in the discriminable depth band, include perspective
    ground planes (smooth vertical depth gradients), and draw multi-color
    textures (per-pixel chroma variation, not single-hue luminance)."""
    from sdirt_tpu.dfdp.datasets import SyntheticRGBD

    ds = SyntheticRGBD((128, 192), length=16, seed=7, train=False, style="v5")
    saw_ground = saw_chroma = False
    for i in range(16):
        img, depth = ds[i]
        d = depth[0]
        assert img.shape == (3, 128, 192) and d.shape == (128, 192)
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert d.min() >= 0.35 and d.max() <= 5.01, (d.min(), d.max())
        # ground plane: some column's lower half decreases monotonically
        # (nearer toward the bottom edge) over a >=20-row run
        lower = d[64:, :]
        dec = np.diff(lower, axis=0) <= 1e-5
        runs = dec[:-1].astype(np.int32)
        for _ in range(19):
            runs = runs[:-1] * dec[1:len(runs)]
        if runs.any() and np.ptp(lower) > 0.3:
            saw_ground = True
        # multi-color texture: channel-to-channel structure differs
        rg = np.corrcoef(img[0].ravel(), img[1].ravel())[0, 1]
        if rg < 0.85:
            saw_chroma = True
    assert saw_ground, "no perspective ground plane found in 16 v5 scenes"
    assert saw_chroma, "no multi-color texture found in 16 v5 scenes"


def test_synthetic_v6_scene_statistics():
    """v6 scenes stay in the band, keep v5's ground planes, and add the
    box-set statistics: smooth pictorial gradients (poster textures: long
    monotone color ramps) and thin-line grid textures (a row/column comb of
    darker grout lines)."""
    from sdirt_tpu.dfdp.datasets import SyntheticRGBD

    ds = SyntheticRGBD((128, 192), length=24, seed=11, train=False,
                       style="v6")
    saw_poster = saw_grid = False
    for i in range(24):
        img, depth = ds[i]
        d = depth[0]
        assert img.shape == (3, 128, 192) and d.shape == (128, 192)
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert d.min() >= 0.35 and d.max() <= 5.01, (d.min(), d.max())
    # the two new texture families are deterministic static methods —
    # assert their signatures directly
    rng = np.random.default_rng(5)
    p = SyntheticRGBD._texture_poster(rng, 96, 128)
    assert p.shape == (96, 128, 3) and p.dtype == np.float32
    assert p.min() >= 0.0 and p.max() <= 1.0
    # smooth gradient: blurred image still carries large-scale color range
    lo = cv.resize(cv.blur(p, (15, 15)), (16, 12))
    saw_poster = float(np.ptp(lo.reshape(-1, 3), axis=0).max()) > 0.08
    assert saw_poster, "poster texture lacks a large-scale color ramp"
    g = SyntheticRGBD._texture_grid(rng, 96, 128)
    assert g.shape == (96, 128, 3) and g.min() >= 0.0 and g.max() <= 1.0
    # grid: many rows AND columns are uniformly darker than their neighbors
    lum = g.mean(-1)
    row = lum.mean(1)
    col = lum.mean(0)
    saw_grid = (np.sum(row < 0.9 * np.median(row)) >= 2
                and np.sum(col < 0.9 * np.median(col)) >= 2)
    assert saw_grid, "grid texture lacks dark grout lines"


def test_synthetic_photometric_augment():
    """Train-mode SyntheticRGBD applies photometric jitter (reference
    dataset.py:249-258) without touching depth or shapes; eval mode is
    deterministic and un-jittered."""
    from sdirt_tpu.dfdp.datasets import SyntheticRGBD

    tr = SyntheticRGBD((64, 96), length=4, seed=3, train=True, style="v4")
    ev = SyntheticRGBD((64, 96), length=4, seed=3, train=False, style="v4")
    img_t, dep_t = tr[1]
    img_e, dep_e = ev[1]
    assert img_t.shape == img_e.shape == (3, 64, 96)
    np.testing.assert_array_equal(dep_t, dep_e)       # depth untouched
    assert img_t.min() >= 0 and img_t.max() <= 1
    # eval is reproducible
    np.testing.assert_array_equal(ev[2][0], ev[2][0])
    # across many items, at least one draws the jitter branch and differs
    diffs = [float(np.abs(tr[i][0] - ev[i][0]).max()) for i in range(4)]
    assert max(diffs) > 0.02, diffs


def test_pil_resize_engine_torchvision_semantics():
    """SDIRT_RESIZE_ENGINE=pil must antialias on downscale (the torchvision
    Resize(antialias=True) semantic of reference dataset.py:36-43) where the
    cv2 default does not, agree with cv2 on upscale (no antialias in play,
    same a=-0.5 bicubic kernel), and keep NEAREST depth exact-valued."""
    from sdirt_tpu.dfdp import datasets as D

    # Nyquist pattern: alternating 0/1 columns; 3x downscale must average it
    # (at 3x, cv2's point samples land ON columns: src=(dst+.5)*3-.5=1,4,7..)
    img = np.zeros((60, 60, 3), np.float32)
    img[:, ::2, :] = 1.0
    old = D._RESIZE_ENGINE
    try:
        grad = (np.linspace(0, 1, 8, dtype=np.float32)[None, :, None]
                * np.ones((8, 8, 3), np.float32))
        D.set_resize_engine("cv2")
        down_cv = D._resize_rgb(img, (20, 20))
        up_cv = D._resize_rgb(grad, (32, 32))
        D.set_resize_engine("pil")
        down_pil = D._resize_rgb(img, (20, 20))
        up_pil = D._resize_rgb(grad, (32, 32))
        const = D._resize_rgb(np.full((40, 60, 3), 0.37, np.float32),
                              (13, 17))
        dep = D._resize_depth(
            np.arange(36, dtype=np.float32).reshape(6, 6) * 10.0, (3, 3))
    finally:
        D.set_resize_engine(old)

    # antialiased downscale of the Nyquist pattern sits at its mean ...
    assert np.abs(down_pil - 0.5).max() < 0.12, np.abs(down_pil - 0.5).max()
    # ... while cv2 INTER_CUBIC point-samples it (values stay near 0/1)
    assert np.abs(down_cv - 0.5).max() > 0.35
    # upscale of a smooth image: same half-pixel-centered bicubic kernel in
    # both engines (they may diverge at hard edges from border handling)
    assert np.abs(up_pil - up_cv).max() < 0.02, np.abs(up_pil - up_cv).max()
    # constants and value sets are preserved
    np.testing.assert_allclose(const, 0.37, atol=1e-6)
    assert set(np.unique(dep)).issubset(set(np.arange(36.0) * 10.0))
    assert down_pil.shape == (20, 20, 3) and dep.shape == (3, 3)
