"""Native C++ loader: decode/resize parity with the cv2 pipeline on the
bundled real captures, 16-bit depth support, threaded batch API."""

import glob
import os

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


def test_corrupt_jpeg_raises_instead_of_exiting(tmp_path):
    """libjpeg's default error manager calls exit(); the loader installs a
    longjmp handler so a fatally corrupt file reports failure instead of
    killing the process (ADVICE round 1)."""
    rng = np.random.default_rng(3)
    p = str(tmp_path / "garbage.jpg")
    with open(p, "wb") as f:
        f.write(b"\xff\xd8" + bytes(rng.integers(0, 256, 400, dtype=np.uint8)))
    with pytest.raises(IOError):
        native.decode(p, (16, 16))
    # the process survived and can still decode valid files
    out = native.decode(FLAT_L, (16, 24))
    assert np.isfinite(out).all()


def test_interlaced_png_decodes_correctly(tmp_path):
    """Adam7-interlaced PNGs go through the full-image de-interlacing path
    (row streaming would scramble rows)."""
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    plain, adam7 = str(tmp_path / "p.png"), str(tmp_path / "i.png")
    PIL.fromarray(img).save(plain)
    PIL.fromarray(img).save(adam7, interlace=True)
    a = native.decode(plain, (48, 64), interp=native.NEAREST)
    b = native.decode(adam7, (48, 64), interp=native.NEAREST)
    np.testing.assert_array_equal(a, b)


def test_bit_depth_reporting_and_16bit_rgb_parity(tmp_path):
    """decode/load_batch report per-file bit depth, and the dataset RGB
    loader normalizes 16-bit PNGs exactly like the cv2 engine (which
    collapses them to 8-bit at decode)."""
    import cv2 as cv

    from sdirt_tpu.dfdp import datasets as D

    rng = np.random.default_rng(5)
    deep = str(tmp_path / "deep.png")
    cv.imwrite(deep, rng.integers(0, 65536, (40, 60, 3)).astype(np.uint16))
    _, bits = native.decode(deep, (40, 60), return_bit_depth=True)
    assert bits == 16
    _, bits8 = native.decode(FLAT_L, (16, 24), return_bit_depth=True)
    assert bits8 == 8
    _, depths = native.load_batch([deep, FLAT_L], (16, 24),
                                  return_bit_depth=True)
    np.testing.assert_array_equal(depths, [16, 8])

    # pin BOTH engines: the native loader resizes in C++ with plain
    # bicubic, i.e. it mirrors the cv2 resize engine — under the PIL
    # (antialiased) session default the comparison is apples-to-oranges
    prev_img, prev_rsz = D._IMAGE_ENGINE, D._RESIZE_ENGINE
    try:
        D.set_image_engine("cv2")
        D.set_resize_engine("cv2")
        via_cv2 = D._load_rgb_chw(deep, (40, 60))
        res_cv2 = D._load_rgb_chw(deep, (20, 30))
        D.set_image_engine("native")
        via_native = D._load_rgb_chw(deep, (40, 60))
        res_nat = D._load_rgb_chw(deep, (20, 30))
    finally:
        D.set_image_engine(prev_img)
        D.set_resize_engine(prev_rsz)
    # identity size: bit-exact with cv2's 16->8 collapse (high byte)
    assert np.abs(via_cv2 - via_native).max() == 0.0
    # with resizing the engines interpolate at different bit depths
    # (native: 16-bit then quantize — strictly more precise); only the
    # pre-fix 255x saturation divergence would break this tolerance
    assert np.abs(res_cv2 - res_nat).mean() < 0.01


def test_native_exr_matches_python_codec(tmp_path):
    """sdirt_exr.cc must be bit-identical to io/exr.py on every supported
    compression, including the PIZ file the reference itself ships."""
    from sdirt_tpu.io.exr import read_exr, write_exr

    piz = "/root/reference/dfdp/data_src/disp.exr"
    if os.path.exists(piz):
        np.testing.assert_array_equal(native.decode_exr(piz), read_exr(piz))

    rng = np.random.default_rng(3)
    for comp in ("zip", "zips", "none"):
        d = (rng.random((37, 53)) * 30).astype(np.float32)
        p = str(tmp_path / f"{comp}.exr")
        write_exr(p, d, compression=comp)
        np.testing.assert_array_equal(native.decode_exr(p), d)
    d3 = rng.random((21, 17, 3)).astype(np.float32)
    p3 = str(tmp_path / "rgb.exr")
    write_exr(p3, d3, channel_names=["R", "G", "B"])
    np.testing.assert_array_equal(native.decode_exr(p3), d3[..., ::-1])
    dh = (rng.random((24, 31)) * 10).astype(np.float32)
    ph = str(tmp_path / "half.exr")
    write_exr(ph, dh, pixel_type="half")
    np.testing.assert_array_equal(native.decode_exr(ph),
                                  dh.astype(np.float16).astype(np.float32))


def test_dataset_exr_fallback_chain(tmp_path):
    """_load_exr returns identical data through whichever engine decodes."""
    from sdirt_tpu.dfdp.datasets import _load_exr
    from sdirt_tpu.io.exr import write_exr

    d = (np.random.default_rng(4).random((30, 40)) * 20).astype(np.float32)
    p = str(tmp_path / "disp.exr")
    write_exr(p, d)
    np.testing.assert_array_equal(np.asarray(_load_exr(p), np.float32), d)
