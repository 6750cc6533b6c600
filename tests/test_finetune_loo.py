"""DP-aware augmentation used by the real-capture LOO fine-tune script.

The subtle invariant: a captured DP pair under horizontal flip must SWAP
its l/r views (the reference only ever flips BEFORE rendering —
dataset.py:246-306 — so it never encodes this; getting it wrong trains
the net on inverted disparity for half the batches).
"""

import importlib.util
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "finetune_real_loo", os.path.join(_ROOT, "scripts",
                                          "finetune_real_loo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


MOD = _load()


def _pair():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (6, 8, 10)).astype(np.float32)
    depth = rng.uniform(0.3, 9, (1, 8, 10)).astype(np.float32)
    return img, depth


def test_hflip_swaps_views_and_mirrors():
    img, depth = _pair()
    out, dout = MOD.hflip_dp(img, depth)
    # former right view, mirrored in W, is now the left stack
    np.testing.assert_array_equal(out[:3], img[3:, :, ::-1])
    np.testing.assert_array_equal(out[3:], img[:3, :, ::-1])
    np.testing.assert_array_equal(dout, depth[:, :, ::-1])


def test_hflip_is_involution():
    img, depth = _pair()
    out, dout = MOD.hflip_dp(*MOD.hflip_dp(img, depth))
    np.testing.assert_array_equal(out, img)
    np.testing.assert_array_equal(dout, depth)


def test_augment_shapes_and_range():
    img, depth = _pair()
    rng = np.random.default_rng(7)
    for _ in range(20):
        out, dout = MOD.augment(img, depth, rng)
        assert out.shape == img.shape and dout.shape == depth.shape
        assert out.flags["C_CONTIGUOUS"] and dout.flags["C_CONTIGUOUS"]
        assert out.min() >= 0.0
        # depth is metric ground truth: augmentation must never rescale it
        assert set(np.round(np.sort(dout, axis=None), 6)) <= set(
            np.round(np.sort(depth, axis=None), 6))
