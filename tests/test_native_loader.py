"""Native C++ loader: decode/resize parity with the cv2 pipeline on the
bundled real captures, 16-bit depth support, threaded batch API."""

import glob

import numpy as np
import pytest

from sdirt_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

FLAT_L = "/root/repo/real_sample_set/flat/001/1500/f4/l.png"
ORBBEC_D = "/root/repo/real_sample_set/casual/orbbec/001/d.png"


def test_decode_rgb_matches_cv2():
    import cv2 as cv

    res = (96, 144)
    ours = native.decode(FLAT_L, res, channels=3, interp=native.CUBIC)
    ref = cv.cvtColor(cv.imread(FLAT_L), cv.COLOR_BGR2RGB).astype(np.float32)
    ref = cv.resize(ref, (res[1], res[0]), interpolation=cv.INTER_CUBIC)
    ref = ref.transpose(2, 0, 1)
    # same Catmull-Rom kernel; cv2 runs fixed-point — allow a few counts
    diff = np.abs(ours - ref)
    assert diff.mean() < 0.5 and diff.max() < 16, (diff.mean(), diff.max())


def test_decode_nearest_16bit_depth():
    import cv2 as cv

    res = (64, 96)
    ours = native.decode(ORBBEC_D, res, channels=1, interp=native.NEAREST)[0]
    raw = cv.imread(ORBBEC_D, cv.IMREAD_UNCHANGED)
    assert raw.dtype == np.uint16
    ref = cv.resize(raw, (res[1], res[0]), interpolation=cv.INTER_NEAREST)
    np.testing.assert_array_equal(ours, ref.astype(np.float32))


def test_jpeg_roundtrip(tmp_path):
    import cv2 as cv

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (40, 60, 3))).astype(np.uint8)
    p = str(tmp_path / "t.jpg")
    cv.imwrite(p, cv.cvtColor(img, cv.COLOR_RGB2BGR),
               [cv.IMWRITE_JPEG_QUALITY, 98])
    out = native.decode(p, (40, 60), channels=3, interp=native.NEAREST)
    ref = cv.cvtColor(cv.imread(p), cv.COLOR_BGR2RGB).transpose(2, 0, 1)
    assert np.abs(out - ref).max() <= 1   # identical decode up to rounding


def test_batch_threads_match_serial():
    paths = sorted(glob.glob("/root/repo/real_sample_set/flat/**/*.png",
                             recursive=True))[:8]
    res = (64, 96)
    batch = native.load_batch(paths, res, channels=3, interp=native.CUBIC,
                              n_threads=8)
    assert batch.shape == (8, 3, 64, 96)
    for i, p in enumerate(paths):
        single = native.decode(p, res, channels=3, interp=native.CUBIC)
        np.testing.assert_array_equal(batch[i], single)


def test_missing_file_fails_cleanly():
    with pytest.raises(IOError):
        native.decode("/nonexistent/file.png", (8, 8))
    # batch reports the number of failures
    with pytest.raises(IOError):
        native.load_batch(["/nonexistent/a.png", FLAT_L], (8, 8))
