"""RGB-D and real dual-pixel capture datasets.

Parity source: /root/reference/dfdp/dataset.py (directory conventions, depth
scalings, augmentation policy, interpolation modes: BICUBIC for RGB, NEAREST
for depth). torchvision is unavailable here; two resize engines are provided:
'pil' (default — PIL's convolution resampler, whose support-scaled bicubic
is the semantic torchvision's `Resize(..., antialias=True)` was built to
match, dataset.py:36-39) and 'cv2' (INTER_CUBIC — sharp, NOT antialiased on
downscale; the pre-r4 behavior). Select with SDIRT_RESIZE_ENGINE or
set_resize_engine(). The opt-in 'native' image engine fuses decode+resize
in C++ with its own Catmull-Rom kernel (cv2-like).
Samples are numpy arrays in the reference's [C, H, W] layout and feed a
thread-pool prefetching loader (cv2/PIL release the GIL during decode, so
threads overlap IO/decode with TPU steps).
"""

from __future__ import annotations

import os

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import queue
import random
import threading
from glob import glob
from os.path import basename, dirname

import cv2 as cv
import numpy as np


# Image-decode engine: 'cv2' (default, exact reference parity) or 'native'
# (sdirt_tpu.native C++ threaded decode+resize; same Catmull-Rom kernel,
# few-count fixed-point differences vs cv2). The native engine applies to the
# augmentation-free real-capture sets where decode+resize fuse cleanly.
_IMAGE_ENGINE = os.environ.get("SDIRT_IMAGE_ENGINE", "cv2")


def set_image_engine(engine: str):
    global _IMAGE_ENGINE
    assert engine in ("cv2", "native"), engine
    _IMAGE_ENGINE = engine


# Resize engine: 'pil' (antialiased convolution resampling == torchvision
# antialias=True, the reference's semantic — default) or 'cv2' (INTER_CUBIC,
# no antialias on downscale; the pre-r4 behavior, kept for comparability).
# In-container this is moot: the bundled real captures are natively 512x768
# (identity resize) and the synthetic pipeline renders at target resolution;
# it matters for user-supplied NYU/FlyingThings/Middlebury trees.
_RESIZE_ENGINE = os.environ.get("SDIRT_RESIZE_ENGINE", "pil")


def set_resize_engine(engine: str):
    global _RESIZE_ENGINE
    assert engine in ("cv2", "pil"), engine
    _RESIZE_ENGINE = engine


def _pil_resize(img, hw, method):
    """Antialiased float32 resize via PIL's 'F'-mode resampler.

    PIL scales the filter support by the downsampling ratio, which is the
    exact behavior torchvision's Resize(antialias=True) reproduces for
    tensors (the reference's transform, dataset.py:36-43)."""
    from PIL import Image

    h, w = hw
    if img.ndim == 2:
        # np.array (copy) — np.asarray would alias PIL's read-only buffer
        return np.array(
            Image.fromarray(np.ascontiguousarray(img, np.float32))
            .resize((w, h), method), np.float32)
    return np.stack(
        [np.asarray(Image.fromarray(np.ascontiguousarray(img[..., c],
                                                         np.float32))
                    .resize((w, h), method), np.float32)
         for c in range(img.shape[-1])], axis=-1)


def _load_rgb_chw(path, resize):
    """Decode + BICUBIC resize + CHW, values in [0, 1]."""
    if _IMAGE_ENGINE == "native":
        from .. import native

        img, bits = native.decode(path, resize, channels=3,
                                  interp=native.CUBIC, return_bit_depth=True)
        if bits == 16:
            # match the cv2 path: default imread collapses 16-bit PNGs to
            # 8-bit by taking the high byte (libpng png_set_strip_16)
            img = np.floor(img / 256.0)
        return img.clip(0, 255) / np.float32(255.0)
    img = cv.cvtColor(cv.imread(path), cv.COLOR_BGR2RGB) / 255.0
    return _chw(_resize_rgb(img.astype(np.float32), resize))


def _load_exr(path):
    """Float EXR (disparity/depth): cv2 when its build has the codec
    (reference parity: IMREAD_ANYCOLOR|IMREAD_ANYDEPTH, dataset.py:108,165),
    else the native C++ decoder, else the pure-Python codec. All three
    produce identical float32 output (cross-checked in tests)."""
    d = cv.imread(path, cv.IMREAD_ANYCOLOR | cv.IMREAD_ANYDEPTH)
    if d is None:
        try:
            from .. import native

            d = native.decode_exr(path)
        except Exception:
            from ..io.exr import read_exr

            d = read_exr(path)
    return d


def _resize_rgb(img, resize):
    """BICUBIC resize to (H, W) like torchvision Resize (dataset.py:36-39)."""
    h, w = resize
    if _RESIZE_ENGINE == "pil":
        from PIL import Image

        return _pil_resize(img, (h, w), Image.Resampling.BICUBIC)
    return cv.resize(img, (w, h), interpolation=cv.INTER_CUBIC)


def _resize_depth(d, resize):
    h, w = resize
    if _RESIZE_ENGINE == "pil":
        from PIL import Image

        return _pil_resize(d, (h, w), Image.Resampling.NEAREST)
    return cv.resize(d, (w, h), interpolation=cv.INTER_NEAREST)


def _chw(img):
    return np.ascontiguousarray(img.transpose(2, 0, 1).astype(np.float32))


def auto_augment(img, depth, rng=None):
    """Photometric + geometric augmentation (reference dataset.py:246-306)."""
    rng = np.random if rng is None else rng
    if rng.rand() > 0.5:
        contrast = rng.uniform(0.75, 1.25)
        brightness = rng.uniform(-0.25, 0.25)
        img = np.clip(contrast * img + brightness, 0.0, 1.0)
    if rng.rand() > 0.5:
        gamma = rng.uniform(1, 2) if rng.rand() > 0.5 else rng.uniform(0.5, 1)
        img = img**gamma
    if rng.rand() > 0.5:
        img, depth = np.flip(img, 1), np.flip(depth, 1)
    if rng.rand() > 0.75:
        img, depth = np.flip(img, 0), np.flip(depth, 0)
    if rng.rand() > 0.5:
        limit = 20
        shift = rng.randint(0, limit)
        h, w = img.shape[:2]
        img = img[shift:h - (limit - shift), shift:w - (limit - shift)]
        depth = depth[shift:h - (limit - shift), shift:w - (limit - shift)]
    if rng.rand() > 0.5:
        depth = depth * rng.uniform(0.25, 1.25)
    return img, depth


def photometric_augment(img, rng):
    """The photometric half of auto_augment (contrast/brightness/gamma,
    reference dataset.py:249-258) for generated scenes: SyntheticRGBD
    already randomizes layout/texture/depth, but its procedural palette is
    narrower than real exposures — this closes the synthetic->real
    photometric gap. Geometric crop (shape-changing under fixed-shape jit)
    and the depth-scale jitter (would leave the style's curated
    discriminable-disparity band) are deliberately excluded."""
    if rng.random() > 0.5:
        contrast = rng.uniform(0.75, 1.25)
        brightness = rng.uniform(-0.25, 0.25)
        img = np.clip(contrast * img + brightness, 0.0, 1.0)
    if rng.random() > 0.5:
        gamma = rng.uniform(1, 2) if rng.random() > 0.5 else rng.uniform(0.5, 1)
        img = img**gamma
    return img


def depth_preprocess(depth):
    """Clip working range to 0.25-10 m, keep empty pixels 0
    (reference dataset.py:308-315)."""
    mark = depth * 1.0
    depth = np.clip(depth, 0.25, 10)
    depth[mark <= 0] = 0
    return depth


class NYUData:
    """NYUv2-style folders of (jpg rgb, png depth/25.5) pairs
    (reference dataset.py:18-74). Virtual length 2000 with random index in
    train mode."""

    def __init__(self, rgb_path, resize=None, train=True):
        self.resize = resize
        self.train = train
        self.scale = 25.5
        self.crop = 20
        self.imgs, self.depths = [], []
        for scene in glob(f"{rgb_path}/*"):
            self.imgs += sorted(glob(f"{scene}/*.jpg"))
            self.depths += sorted(glob(f"{scene}/*.png"))

    def __len__(self):
        return 2000 if self.train else 50

    def __getitem__(self, idx):
        if self.train:
            idx = np.random.randint(0, len(self.imgs))
        try:
            aif = cv.cvtColor(cv.imread(self.imgs[idx]), cv.COLOR_BGR2RGB) / 255.0
            depth = cv.imread(self.depths[idx], -1) / self.scale
            h, w, _ = aif.shape
            c = self.crop
            aif = aif[c:h - c, c:w - c]
            depth = depth[c:h - c, c:w - c]
            assert depth[depth > 0].any()
        except Exception:
            return self[(idx + 1) % len(self.imgs)]
        if self.train:
            aif, depth = auto_augment(aif, depth)
        depth = depth_preprocess(depth)
        return [_chw(_resize_rgb(aif.astype(np.float32), self.resize)),
                _resize_depth(depth.astype(np.float32), self.resize)[None]]


class FlyingThings3D:
    """AiF.png + disp.exr/20 scenes (reference dataset.py:76-140). With
    fs_num > 0, returns a random focal stack of pre-rendered defocused
    frames named <focus_dist>.png (reference dataset.py:110-129)."""

    DEPTH_FACTOR = 20.0

    def __init__(self, dataset_dir, resize=None, train=True, fs_num=0):
        self.dataset_dir = dataset_dir
        self.scenes = [s.split("/")[-1] for s in glob(f"{dataset_dir}/*")]
        self.resize = resize
        self.train = train
        self.fs_num = fs_num

    def __len__(self):
        return len(self.scenes) if self.train else min(50, len(self.scenes))

    def __getitem__(self, index):
        scene = self.scenes[index]
        depth = _load_exr(f"{self.dataset_dir}/{scene}/disp.exr") / self.DEPTH_FACTOR
        depth = _resize_depth(depth, self.resize)

        if self.fs_num > 0:
            stack_paths = sorted(glob(f"{self.dataset_dir}/{scene}/*.png"))[:-1]
            chosen = random.sample(stack_paths, self.fs_num)
            frames, dists = [], []
            for path in chosen:
                dists.append(float(path.split("/")[-1][:-4]) / self.DEPTH_FACTOR)
                img = cv.imread(path).astype(np.float32) / 255.0
                frames.append(_resize_rgb(img, self.resize))
            stack = np.stack([_chw(f) for f in frames])      # [S, C, H, W]
            return [stack, depth.astype(np.float32)[None],
                    np.asarray(dists, np.float32)]

        aif = cv.cvtColor(cv.imread(f"{self.dataset_dir}/{scene}/AiF.png"),
                          cv.COLOR_BGR2RGB) / 255.0
        if self.train:
            aif, depth = auto_augment(aif, depth)
        depth = depth_preprocess(depth)
        return [_chw(_resize_rgb(aif.astype(np.float32), self.resize)),
                _resize_depth(depth.astype(np.float32), self.resize)[None]]


class Middlebury:
    """im0.png + depth.png/1000 scenes (reference dataset.py:208-240)."""

    def __init__(self, dataset_dir, resize=None, train=False):
        self.dataset_dir = dataset_dir
        self.scenes = sorted(s.split("/")[-1] for s in glob(f"{dataset_dir}/*"))
        self.resize = resize

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, index):
        scene = self.scenes[index]
        aif = cv.cvtColor(cv.imread(f"{self.dataset_dir}/{scene}/im0.png"),
                          cv.COLOR_BGR2RGB) / 255.0
        depth = cv.imread(f"{self.dataset_dir}/{scene}/depth.png", -1) / 1000.0
        return [_chw(_resize_rgb(aif.astype(np.float32), self.resize)),
                _resize_depth(depth.astype(np.float32), self.resize)[None]]


class MiddleburyFS(Middlebury):
    """disp.exr/10 + AiF.png variant (reference dataset.py:142-205)."""

    def __getitem__(self, index):
        scene = self.scenes[index]
        depth = _load_exr(f"{self.dataset_dir}/{scene}/disp.exr") / 10.0
        depth[depth < 0] = 0
        aif = cv.cvtColor(cv.imread(f"{self.dataset_dir}/{scene}/AiF.png"),
                          cv.COLOR_BGR2RGB) / 255.0
        return [_chw(_resize_rgb(aif.astype(np.float32), self.resize)),
                _resize_depth(depth.astype(np.float32), self.resize)[None]]


# ---------------------------------------------------------------------------
# Real Canon DP captures (reference dataset.py:317-507)
# ---------------------------------------------------------------------------

def _require_scenes(scenes, dataset_dir, cls):
    if not scenes:
        raise FileNotFoundError(
            f"{cls}: no scenes found under '{dataset_dir}'. Point the config "
            "at your dataset root (see configs/*.yml); the bundled "
            "real_sample_set/ works with --stage sample.")
    return scenes


class CanonDepthSet:
    """Scenes of l/r DP pngs + d.png depth (box set)."""

    def __init__(self, dataset_dir, resize=None):
        self.scenes = _require_scenes(sorted(glob(f"{dataset_dir}/*")),
                                      dataset_dir, type(self).__name__)
        self.resize = resize
        self.file_type = glob(f"{self.scenes[0]}/l.*")[0].split(".")[-1]

    def __len__(self):
        return len(self.scenes)

    def _load_lr(self, scene):
        return np.concatenate(
            [_load_rgb_chw(f"{scene}/l.{self.file_type}", self.resize),
             _load_rgb_chw(f"{scene}/r.{self.file_type}", self.resize)], 0)

    def __getitem__(self, index):
        scene = self.scenes[index]
        if os.path.exists(f"{scene}/d.png"):
            depth = cv.imread(f"{scene}/d.png", 0) / 255.0 * 10.0
            depth = _resize_depth(depth, self.resize)
        else:
            depth = np.ones(self.resize, np.float64) * 2.5
        img = self._load_lr(scene)
        depth[depth < 0] = 0
        depth[depth >= 10] = 0
        return [img, _resize_depth(depth.astype(np.float32), self.resize)[None]]


class CanonCasualSet(CanonDepthSet):
    """iphone/orbbec depth-sensor scenes (reference dataset.py:465-507)."""

    def __init__(self, dataset_dir, resize=None):
        self.scenes = _require_scenes(sorted(glob(f"{dataset_dir}/*/*")),
                                      dataset_dir, type(self).__name__)
        self.resize = resize
        self.file_type = glob(f"{self.scenes[0]}/l.*")[0].split(".")[-1]

    def __getitem__(self, index):
        scene = self.scenes[index]
        if "iphone" in scene:
            depth = cv.imread(f"{scene}/d.png", 0) / 255.0 * 10.0
        else:   # orbbec
            depth = cv.imread(f"{scene}/d.png", cv.IMREAD_UNCHANGED) / 1000.0
        depth = _resize_depth(depth, self.resize)
        img = self._load_lr(scene)
        depth[depth < 0] = 0
        depth[depth >= 10] = 0
        return [img, _resize_depth(depth.astype(np.float32), self.resize)[None]]


class CanonFlat2DepthSet:
    """Flat-wall F/4 captures with known plane depth from the folder name
    (reference dataset.py:363-409)."""

    def __init__(self, dataset_dir, resize=None):
        img_paths = _require_scenes(
            sorted(glob(f"{dataset_dir}/**/f4/l.*", recursive=True)),
            dataset_dir, type(self).__name__)
        self.file_type = img_paths[0].split(".")[-1]
        self.resize = resize
        self.dis_l, self.imgp_l = [], []
        for p in img_paths:
            dis_str = basename(dirname(dirname(p)))
            if "inf" in dis_str:
                continue
            self.dis_l.append(float(dis_str) / 1000.0)
            self.imgp_l.append(dirname(dirname(p)))

    def __len__(self):
        return len(self.imgp_l)

    def _lr(self, folder):
        return np.concatenate(
            [_load_rgb_chw(f"{folder}/l.{self.file_type}", self.resize),
             _load_rgb_chw(f"{folder}/r.{self.file_type}", self.resize)], 0)

    def __getitem__(self, index):
        dis_m, imgp = self.dis_l[index], self.imgp_l[index]
        f4 = self._lr(f"{imgp}/f4")
        depth = np.ones(self.resize, np.float32) * dis_m
        return [f4, depth[None]]


class CanonFlatSet(CanonFlat2DepthSet):
    """F/4 + F/20 pairs for DP-simulation fidelity eval
    (reference dataset.py:411-463). Includes 'inf' scenes at 100 m."""

    def __init__(self, dataset_dir, resize=None):
        img_paths = _require_scenes(
            sorted(glob(f"{dataset_dir}/**/f4/l.*", recursive=True)),
            dataset_dir, type(self).__name__)
        self.file_type = img_paths[0].split(".")[-1]
        self.resize = resize
        self.dis_l, self.imgp_l = [], []
        for p in img_paths:
            dis_str = basename(dirname(dirname(p)))
            dis = 100000.0 if "inf" in dis_str else float(dis_str)
            self.dis_l.append(dis / 1000.0)
            self.imgp_l.append(dirname(dirname(p)))

    def __getitem__(self, index):
        dis_m, imgp = self.dis_l[index], self.imgp_l[index]
        f4 = self._lr(f"{imgp}/f4")
        f20 = self._lr(f"{imgp}/f20")
        depth = np.ones(self.resize, np.float32) * dis_m
        return [f4, f20, depth[None]]


class ConcatDataset:
    def __init__(self, *datasets):
        self.datasets = list(datasets)
        self._lens = [len(d) for d in self.datasets]

    def __len__(self):
        return sum(self._lens)

    def __getitem__(self, idx):
        for d, n in zip(self.datasets, self._lens):
            if idx < n:
                return d[idx]
            idx -= n
        raise IndexError


class _WorkerError:
    """Exception sentinel shipped through the prefetch queue."""

    def __init__(self, exc):
        self.exc = exc


class DataLoader:
    """Thread-pool prefetching batch loader (stand-in for the reference's
    torch DataLoader with num_workers=4). Worker exceptions propagate to the
    consumer instead of hanging the iteration."""

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=4,
                 drop_last=False, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.rng = random.Random(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(idx)
        batches = [idx[i:i + self.batch_size] for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        def work(worker_batches):
            # A worker that dies silently would leave the consumer blocked on
            # q.get() forever; ship the exception through the queue instead.
            try:
                for b in worker_batches:
                    if stop.is_set():
                        return
                    samples = [self.dataset[i] for i in b]
                    cols = [np.stack([s[j] for s in samples])
                            for j in range(len(samples[0]))]
                    q.put(cols)
            except BaseException as exc:  # noqa: BLE001 - re-raised in consumer
                q.put(_WorkerError(exc))

        threads = []
        for w in range(self.num_workers):
            t = threading.Thread(target=work,
                                 args=(batches[w::self.num_workers],), daemon=True)
            t.start()
            threads.append(t)

        try:
            for _ in range(len(batches)):
                item = q.get()
                if isinstance(item, _WorkerError):
                    raise RuntimeError(
                        "DataLoader worker failed") from item.exc
                yield item
        finally:
            stop.set()
            # unblock producers waiting on a full queue so join can succeed
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            for t in threads:
                t.join(timeout=0.1)


class SyntheticRGBD:
    """Procedural RGB-D scenes (colored rectangles over a background plane at
    random depths). Not in the reference — enables training/integration tests
    without external datasets; the directory-based sets above remain the
    production path.

    style 'v1': textured rectangles (round-1/2 generator).
    style 'v2': depth-from-defocus-oriented scenes — multi-scale texture
    octaves, more and smaller occluders (ellipses + rects) with sharp
    boundaries, and log-uniform depth biased toward the resolvable
    near-focus range (defocus changes fastest near the 1 m focus plane, so
    uniform-depth scenes spend most pixels where blur is depth-insensitive).
    style 'v3': v2 scenes with depths confined to the near band
    (occluders 0.4–3.5 m, background 0.8–3.5 m). Rationale: the rf50mm @
    1 m-focus DP disparity spans ~2.4 px below 2 m but only ~0.14 px from
    5 m to 9 m (scripts/dp_disparity_probe.py) — v2's far-field pixels are
    physically unresolvable and dominate the loss, so a v2-trained net
    converges to a near-constant predictor. v3 keeps every pixel inside the
    discriminable disparity range, matching where the reference's DP119
    results live (BASELINE.md: planar/box scenes at 0.5–2 m).
    style 'v4': v3 scenes with NON-fronto-parallel geometry — slanted
    planar occluders and background (linear depth gradients) plus curved
    (spherical-cap) surfaces. v1-v3 surfaces are all constant-depth, but the
    real evaluation sets are not: the box set is dominated by slanted faces
    and the casual set by smooth depth variation; a net trained only on
    piecewise-constant depth has never seen an in-surface depth gradient.
    style 'v5': composition realism modeled on the bundled real eval sets
    (65% new compositions + 35% v4 items for continuity). New: (a) a
    perspective GROUND plane — depth falls as 1/(y - horizon), the dominant
    structure of every casual capture and the tabletop of the box set;
    (b) CUBOID primitives — a fronto-ish front face plus a receding top
    face sharing the front-top edge (the box set is stacked cartons, whose
    top faces sweep ~the full near depth band within a few dozen rows);
    (c) full-height POLES with cylindrical curvature; (d) MULTI-COLOR
    textures (2-3 colors blended through smoothed noise masks, then octave
    detail) — the poster-covered real surfaces carry color structure the
    single-base-color v2 texture never produces.
    style 'v6': box-set-targeted iteration on v5 (the one real scene still
    under its round-3 target). The box captures are close-range STACKS of
    cartons wrapped in printed poster art in front of a poster-collage
    pinboard wall, on a grid-printed tablecloth. v6 adds what v5's
    statistics miss: (a) PICTORIAL poster textures — smooth multi-stop
    color gradients, soft shapes and thin dark strokes (line-art/text) with
    border frames, instead of noise-blob color fields; (b) GRID textures
    (thin grout/print lines over jittered cells) for the tablecloth — also
    the dominant texture of the casual set's tiled surfaces; (c) a
    box-stack composition: 3-7 near-range cuboids (0.4–2 m, the measured
    box-set depth band) over a poster-collage wall and gridded ground.
    Mix: 50% box-stack + 30% v5 compositions + 20% v4 continuity items.
    """

    DEPTH_RANGES = {          # (occluder lo/hi, background lo/hi), meters
        "v2": ((0.35, 9.0), (1.5, 9.0)),
        "v3": ((0.4, 3.5), (0.8, 3.5)),
        "v4": ((0.4, 3.5), (0.8, 3.5)),
        # v5 extends the BACKGROUND band to 5 m: the casual captures hold
        # true depths past 3.5 m, and a net whose training vocabulary caps
        # at 3.5 m can never score acc1 there (5 m truth needs >=4.0
        # predicted). F/4 disparity still moves ~0.15 px over 3.5-5 m
        # (scripts/dp_disparity_probe.py) — weak signal beats a guaranteed
        # miss. Occluders stay in the strongly discriminable 0.4-3.5 band,
        # so near-field learning is not diluted (the v2 far-field lesson).
        "v5": ((0.4, 3.5), (0.8, 5.0)),
        # v6 keeps the v5 bands; the box-stack items bias their cuboids
        # into 0.4-2 m (real box GT spans 0.47-2 m, scripts note in
        # RESULTS.md round 4).
        "v6": ((0.4, 3.5), (0.8, 5.0)),
    }

    def __init__(self, resize, length: int = 64, seed: int = 0, train=True,
                 style: str = "v1"):
        self.resize = resize
        self.length = length
        self.seed = seed
        self.train = train
        assert style in ("v1", "v2", "v3", "v4", "v5", "v6"), style
        self.style = style

    def __len__(self):
        return self.length

    @staticmethod
    def _texture(rng, bh, bw, base):
        """Textured patch around a base color: defocus carries depth
        information only where the image has spatial frequency content, so
        every surface gets one of several high-frequency patterns."""
        yy, xx = np.mgrid[0:bh, 0:bw].astype(np.float32)
        kind = rng.integers(0, 4)
        if kind == 0:      # band-limited noise (smoothed)
            t = rng.normal(0, 1, (bh, bw)).astype(np.float32)
            k = max(1, int(rng.integers(1, 4)))
            t = cv.blur(t, (k, k))
            t /= max(np.abs(t).max(), 1e-6)
        elif kind == 1:    # oriented stripes
            f = rng.uniform(0.2, 1.2)
            th = rng.uniform(0, np.pi)
            t = np.sin(f * (xx * np.cos(th) + yy * np.sin(th)))
        elif kind == 2:    # checkerboard
            p = rng.integers(3, 12)
            t = (((xx // p) + (yy // p)) % 2).astype(np.float32) * 2 - 1
        else:              # smooth gradient (low-frequency control case)
            t = (xx / max(bw - 1, 1) + yy / max(bh - 1, 1)) - 1
        amp = rng.uniform(0.1, 0.4)
        patch = base[None, None] * (1.0 + amp * t[..., None])
        return np.clip(patch, 0.0, 1.0).astype(np.float32)

    @staticmethod
    def _texture_v2(rng, bh, bw, base):
        """2-3 octaves of band-limited noise + optional stripes; stronger
        amplitude than v1 so defocus is observable everywhere. Coarse octaves
        are synthesized at low resolution and upsampled (loader-thread CPU
        budget: this runs per occluder per sample)."""
        acc = rng.standard_normal((bh, bw), dtype=np.float32)
        acc /= max(np.abs(acc).max(), 1e-6)
        for s in rng.choice([2, 4, 8], size=rng.integers(1, 3), replace=False):
            sh, sw = max(2, bh // s), max(2, bw // s)
            t = rng.standard_normal((sh, sw), dtype=np.float32)
            t = cv.resize(t, (bw, bh), interpolation=cv.INTER_LINEAR)
            acc += t / max(np.abs(t).max(), 1e-6)
        if rng.random() > 0.5:
            yy, xx = np.mgrid[0:bh, 0:bw].astype(np.float32)
            f, th = rng.uniform(0.3, 1.5), rng.uniform(0, np.pi)
            acc += np.sin(f * (xx * np.cos(th) + yy * np.sin(th)))
        acc /= max(np.abs(acc).max(), 1e-6)
        amp = rng.uniform(0.25, 0.6)
        patch = base[None, None] * (1.0 + amp * acc[..., None])
        return np.clip(patch, 0.02, 1.0).astype(np.float32)

    @staticmethod
    def _log_uniform_depth(rng, lo=0.35, hi=9.0):
        return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))

    @staticmethod
    def _depth_field_v4(rng, d0, yy, xx, h, w, lo, hi):
        """Full-frame per-pixel depth for one v4 surface around base d0:
        35% fronto-parallel, 40% slanted plane (linear in-image gradient up
        to ~±60% of d0 across the frame), 25% spherical-cap bulge. Clipped
        to the style's discriminable band so no pixel leaves the usable
        DP-disparity range."""
        mode = rng.random()
        if mode < 0.35:
            return np.full((h, w), d0, np.float32)
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        u = (xx - cx).astype(np.float32) / w
        v = (yy - cy).astype(np.float32) / h
        if mode < 0.75:
            gx, gy = rng.uniform(-0.6, 0.6, 2)
            d = d0 * (1.0 + gx * u + gy * v)
        else:
            a = rng.uniform(-0.4, 0.4)
            d = d0 * (1.0 + a * np.exp(-4.0 * (u * u + v * v)))
        return np.clip(d, lo, hi).astype(np.float32)

    @staticmethod
    def _texture_v5(rng, bh, bw):
        """Multi-color texture: 2-3 random colors blended through smoothed
        low-res noise masks (soft-max weights -> coherent color regions with
        sharp-ish boundaries, poster-like), then one fine luminance octave."""
        n = int(rng.integers(2, 4))
        cols = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
        masks = np.empty((n, bh, bw), np.float32)
        for i in range(n):
            s = int(rng.choice([4, 8, 16]))
            m = rng.standard_normal(
                (max(2, bh // s), max(2, bw // s))).astype(np.float32)
            masks[i] = cv.resize(m, (bw, bh), interpolation=cv.INTER_CUBIC)
        sharp = np.float32(rng.uniform(2.0, 6.0))
        wts = np.exp(sharp * (masks - masks.max(0, keepdims=True)))
        wts /= wts.sum(0, keepdims=True)
        img = np.einsum("nhw,nc->hwc", wts, cols)
        det = rng.standard_normal((bh, bw), dtype=np.float32)
        k = int(rng.integers(1, 4))
        det = cv.blur(det, (k, k))
        det /= max(np.abs(det).max(), 1e-6)
        img = img * (1.0 + rng.uniform(0.08, 0.35) * det[..., None])
        return np.clip(img, 0.02, 1.0).astype(np.float32)

    @staticmethod
    def _texture_poster(rng, bh, bw):
        """Pictorial 'poster art' texture: a smooth two-color gradient field
        (sky-like), a few filled shapes, thin dark strokes (line-art /
        text-like glyph strokes) and usually a border frame. These are the
        statistics of the printed art wrapping every box-set carton — large
        smooth gradients and stroke-scale detail that the noise-blob
        `_texture_v5` never produces."""
        yy, xx = np.mgrid[0:bh, 0:bw].astype(np.float32)
        u = xx / max(bw - 1, 1)
        v = yy / max(bh - 1, 1)
        c0, c1 = rng.uniform(0.15, 0.95, (2, 3)).astype(np.float32)
        if rng.random() < 0.5:      # linear gradient, random direction
            th = rng.uniform(0, 2 * np.pi)
            t = (u - 0.5) * np.cos(th) + (v - 0.5) * np.sin(th) + 0.5
        else:                       # radial (sunburst / vignette)
            cy, cx = rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8)
            t = np.sqrt((u - cx) ** 2 + (v - cy) ** 2) * rng.uniform(1.0, 2.0)
        t = np.clip(t, 0.0, 1.0)[..., None]
        img = c0 * (1.0 - t) + c1 * t
        for _ in range(int(rng.integers(1, 5))):   # filled shapes
            col = rng.uniform(0.05, 0.95, 3).astype(np.float32)
            cy, cx = rng.uniform(0, bh), rng.uniform(0, bw)
            ry = max(rng.uniform(bh / 12, bh / 3), 1.0)
            rx = max(rng.uniform(bw / 12, bw / 3), 1.0)
            m = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0)
            a = np.float32(rng.uniform(0.5, 1.0))
            mask = m[..., None].astype(np.float32) * a
            img = img * (1.0 - mask) + col * mask
        stroke = np.zeros((bh, bw), np.float32)    # line-art / text strokes
        for _ in range(int(rng.integers(4, 14))):
            x0, y0 = int(rng.integers(0, bw)), int(rng.integers(0, bh))
            x1 = int(np.clip(x0 + rng.integers(-bw // 3, bw // 3 + 1),
                             0, bw - 1))
            y1 = int(np.clip(y0 + rng.integers(-bh // 3, bh // 3 + 1),
                             0, bh - 1))
            cv.line(stroke, (x0, y0), (x1, y1), 1.0,
                    thickness=int(rng.integers(1, 3)))
        img = img * (1.0 - np.float32(rng.uniform(0.3, 0.85))
                     * stroke[..., None])
        if rng.random() < 0.6 and bh > 8 and bw > 8:   # border frame
            bpx = int(rng.integers(1, max(min(bh, bw) // 20, 2) + 1))
            col = (rng.uniform(0.6, 1.0, 3) if rng.random() < 0.7
                   else rng.uniform(0.0, 0.25, 3)).astype(np.float32)
            img[:bpx], img[-bpx:] = col, col
            img[:, :bpx], img[:, -bpx:] = col, col
        return np.clip(img, 0.02, 1.0).astype(np.float32)

    @staticmethod
    def _texture_grid(rng, bh, bw):
        """Regular grid of thin dark grout/print lines over a base color
        with per-cell luminance jitter — the box set's gridded tablecloth
        and the casual set's tiled walls/ledges."""
        base = rng.uniform(0.25, 0.85, 3).astype(np.float32)
        py = int(rng.integers(max(bh // 24, 6), max(bh // 6, 8)))
        px = int(rng.integers(max(bw // 24, 6), max(bw // 6, 8)))
        yy, xx = np.mgrid[0:bh, 0:bw]
        cell = ((yy // py) * 7919 + (xx // px) * 104729) % 97
        jit = (cell.astype(np.float32) / 96.0 - 0.5) * rng.uniform(0.05, 0.25)
        img = base[None, None] * (1.0 + jit[..., None])
        t = int(rng.integers(1, 3))
        line = ((yy % py) < t) | ((xx % px) < t)
        img = np.where(line[..., None],
                       img * (1.0 - np.float32(rng.uniform(0.3, 0.7))), img)
        return np.clip(img, 0.02, 1.0).astype(np.float32)

    def _pick_tex(self, rng, bh, bw, color):
        """v5 surfaces draw mostly multi-color textures, some v2 ones; v6
        adds pictorial posters to the mix (box-set statistics)."""
        if self.style == "v6":
            r = rng.random()
            if r < 0.40:
                return self._texture_poster(rng, bh, bw)
            if r < 0.75:
                return self._texture_v5(rng, bh, bw)
            return self._texture_v2(rng, bh, bw, color)
        if rng.random() < 0.7:
            return self._texture_v5(rng, bh, bw)
        return self._texture_v2(rng, bh, bw, color)

    @staticmethod
    def _ground_depth(rng, h, w, lo, hi):
        """Perspective ground plane: horizon at a random row, depth falls
        as 1/(y - y_h) below it (flat floor under a level camera), scaled
        so the bottom edge sits at a random near depth. Returns (depth
        field [h,w] valid below the horizon, horizon row)."""
        y_h = rng.uniform(0.2, 0.6) * h
        d_near = rng.uniform(0.4, 1.0)
        d_far = rng.uniform(1.8, float(hi))
        yy = np.arange(h, dtype=np.float32)[:, None]
        t = np.maximum(yy - y_h, 1e-3)
        # 1/t profile through (bottom -> d_near), clipped at d_far
        d = d_near * (h - y_h) / t
        d = np.clip(d, lo, d_far).astype(np.float32)
        return np.broadcast_to(d, (h, w)).copy(), int(round(y_h))

    def _draw_cuboid(self, rng, img, depth, yy, xx, h, w, lo, hi):
        """Front face (fronto-ish slant) + receding top face sharing the
        front-top edge; optionally a receding side face. Depths clipped to
        the discriminable band."""
        bw_ = int(rng.integers(w // 8, w // 2))
        bh_ = int(rng.integers(h // 8, h // 2))
        x0 = int(rng.integers(0, max(w - bw_, 1)))
        y0 = int(rng.integers(0, max(h - bh_, 1)))
        d_f = self._log_uniform_depth(rng, lo, hi * 0.8)
        # front face: mild slant (real cartons are a few degrees off)
        gx, gy = rng.uniform(-0.12, 0.12, 2)
        u = (xx[y0:y0 + bh_, x0:x0 + bw_] - x0).astype(np.float32) / max(bw_, 1)
        v = (yy[y0:y0 + bh_, x0:x0 + bw_] - y0).astype(np.float32) / max(bh_, 1)
        dfront = np.clip(d_f * (1 + gx * u + gy * v), lo, hi)
        img[y0:y0 + bh_, x0:x0 + bw_] = self._pick_tex(
            rng, bh_, bw_, rng.uniform(0.1, 0.95, 3).astype(np.float32))
        depth[y0:y0 + bh_, x0:x0 + bw_] = dfront
        # top face: thin band above the front-top edge, receding fast
        if y0 > 4 and rng.random() < 0.8:
            th = int(rng.integers(3, max(min(y0, bh_ // 2), 4)))
            yt = y0 - th
            ext = rng.uniform(0.15, 0.7)   # how far back the box reaches
            vt = (y0 - yy[yt:y0, x0:x0 + bw_]).astype(np.float32) / max(th, 1)
            dtop = np.clip(d_f * (1 + ext * vt), lo, hi)
            tex = self._pick_tex(rng, th, bw_,
                                 rng.uniform(0.1, 0.95, 3).astype(np.float32))
            img[yt:y0, x0:x0 + bw_] = tex * rng.uniform(0.75, 1.0)
            depth[yt:y0, x0:x0 + bw_] = dtop

    def _draw_pole(self, rng, img, depth, h, w, lo, hi):
        """Full-height vertical pole with cylindrical depth curvature."""
        pw = int(rng.integers(max(w // 24, 4), w // 6))
        x0 = int(rng.integers(0, max(w - pw, 1)))
        d0 = self._log_uniform_depth(rng, lo, 2.0)
        u = (np.arange(pw, dtype=np.float32) / max(pw - 1, 1)) * 2 - 1
        bulge = 1.0 - 0.06 * (1.0 - u * u)       # nearer at the centerline
        dcol = np.clip(d0 * bulge, lo, hi).astype(np.float32)
        img[:, x0:x0 + pw] = self._pick_tex(
            rng, h, pw, rng.uniform(0.1, 0.9, 3).astype(np.float32))
        depth[:, x0:x0 + pw] = dcol[None, :]

    def _item_v5(self, rng, h, w):
        (occ_lo, occ_hi), (bg_lo, bg_hi) = self.DEPTH_RANGES["v5"]
        yy, xx = np.mgrid[0:h, 0:w]
        # background wall (fronto or mildly slanted, multi-color texture)
        d_bg = self._log_uniform_depth(rng, max(bg_lo, 1.2), bg_hi)
        depth = self._depth_field_v4(rng, d_bg, yy, xx, h, w, bg_lo, bg_hi)
        img = self._pick_tex(rng, h, w, rng.uniform(0.2, 0.8, 3).astype(np.float32))
        # ground plane over the lower frame (85% of scenes)
        if rng.random() < 0.85:
            gd, y_h = self._ground_depth(rng, h, w, occ_lo, bg_hi)
            gtex = self._pick_tex(rng, h, w,
                                  rng.uniform(0.2, 0.8, 3).astype(np.float32))
            band = yy >= y_h
            img[band] = gtex[band]
            depth[band] = gd[band]
        # cuboids (box-set look) and classic v4 occluders, interleaved
        for _ in range(int(rng.integers(4, 12))):
            if rng.random() < 0.55:
                self._draw_cuboid(rng, img, depth, yy, xx, h, w, occ_lo, occ_hi)
            else:
                color = rng.uniform(0.1, 0.95, 3).astype(np.float32)
                d = self._log_uniform_depth(rng, occ_lo, occ_hi)
                dfield = self._depth_field_v4(rng, d, yy, xx, h, w,
                                              occ_lo, occ_hi)
                cy, cx = rng.integers(0, h), rng.integers(0, w)
                ry = rng.integers(h // 24 + 2, h // 3)
                rx = rng.integers(w // 24 + 2, w // 3)
                mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
                if not mask.any():
                    continue
                y0, y1 = yy[mask].min(), yy[mask].max() + 1
                x0, x1 = xx[mask].min(), xx[mask].max() + 1
                tex = self._pick_tex(rng, y1 - y0, x1 - x0, color)
                sub = mask[y0:y1, x0:x1]
                img[y0:y1, x0:x1][sub] = tex[sub]
                depth[mask] = dfield[mask]
        # poles last: they occlude everything (casual-set look, 35%)
        for _ in range(int(rng.integers(0, 3)) if rng.random() < 0.35 else 0):
            self._draw_pole(rng, img, depth, h, w, occ_lo, occ_hi)
        return img, depth.astype(np.float32)

    def _item_v6(self, rng, h, w):
        """Box-stack composition (the real box set, scene for scene): a
        poster-collage pinboard wall, a gridded tablecloth ground, and a
        stack of near-range cuboids (0.4–2 m) whose faces carry pictorial
        poster textures."""
        (occ_lo, occ_hi), (bg_lo, bg_hi) = self.DEPTH_RANGES["v6"]
        yy, xx = np.mgrid[0:h, 0:w]
        # collage wall: base texture + pinned poster rectangles
        d_bg = self._log_uniform_depth(rng, max(bg_lo, 1.5), bg_hi)
        depth = self._depth_field_v4(rng, d_bg, yy, xx, h, w, bg_lo, bg_hi)
        img = self._pick_tex(rng, h, w,
                             rng.uniform(0.2, 0.8, 3).astype(np.float32))
        for _ in range(int(rng.integers(5, 12))):
            ph = int(rng.integers(h // 10, h // 3))
            pw_ = int(rng.integers(w // 10, w // 3))
            y0 = int(rng.integers(0, max(h - ph, 1)))
            x0 = int(rng.integers(0, max(w - pw_, 1)))
            img[y0:y0 + ph, x0:x0 + pw_] = self._texture_poster(rng, ph, pw_)
        # gridded tabletop over the lower frame
        if rng.random() < 0.9:
            gd, y_h = self._ground_depth(rng, h, w, occ_lo, bg_hi)
            gtex = self._texture_grid(rng, h, w)
            band = yy >= y_h
            img[band] = gtex[band]
            depth[band] = gd[band]
        # the stack: cuboids confined to the measured box-set depth band
        for _ in range(int(rng.integers(3, 8))):
            self._draw_cuboid(rng, img, depth, yy, xx, h, w, occ_lo,
                              min(occ_hi, 2.5))
        return img, depth.astype(np.float32)

    def _item_v2(self, rng, h, w):
        (occ_lo, occ_hi), (bg_lo, bg_hi) = self.DEPTH_RANGES[self.style]
        v4 = self.style in ("v4", "v5")   # v5's continuity items are v4-style
        bg = rng.uniform(0.2, 0.8, 3).astype(np.float32)
        img = self._texture_v2(rng, h, w, bg)
        yy, xx = np.mgrid[0:h, 0:w]
        d_bg = self._log_uniform_depth(rng, bg_lo, bg_hi)
        if v4:
            depth = self._depth_field_v4(rng, d_bg, yy, xx, h, w, bg_lo, bg_hi)
        else:
            depth = np.full((h, w), d_bg, np.float32)
        for _ in range(rng.integers(8, 21)):
            color = rng.uniform(0.1, 0.95, 3).astype(np.float32)
            d = self._log_uniform_depth(rng, occ_lo, occ_hi)
            dfield = (self._depth_field_v4(rng, d, yy, xx, h, w, occ_lo, occ_hi)
                      if v4 else None)
            if rng.random() > 0.45:      # ellipse (curved occlusion boundary)
                cy, cx = rng.integers(0, h), rng.integers(0, w)
                ry = rng.integers(h // 24 + 2, h // 3)
                rx = rng.integers(w // 24 + 2, w // 3)
                mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
                if not mask.any():
                    continue
                y0, y1 = yy[mask].min(), yy[mask].max() + 1
                x0, x1 = xx[mask].min(), xx[mask].max() + 1
                tex = self._texture_v2(rng, y1 - y0, x1 - x0, color)
                sub = mask[y0:y1, x0:x1]
                img[y0:y1, x0:x1][sub] = tex[sub]
                depth[mask] = dfield[mask] if v4 else d
            else:                        # rectangle
                x0, y0 = rng.integers(0, w - 8), rng.integers(0, h - 8)
                bw = min(int(rng.integers(8, w // 2)), w - x0)
                bh = min(int(rng.integers(8, h // 2)), h - y0)
                img[y0:y0 + bh, x0:x0 + bw] = self._texture_v2(rng, bh, bw, color)
                depth[y0:y0 + bh, x0:x0 + bw] = (
                    dfield[y0:y0 + bh, x0:x0 + bw] if v4 else d)
        return img, depth

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        h, w = self.resize
        if self.style == "v6":
            r = rng.random()
            if r < 0.50:
                img, depth = self._item_v6(rng, h, w)
            elif r < 0.80:
                img, depth = self._item_v5(rng, h, w)
            else:
                img, depth = self._item_v2(rng, h, w)
        elif self.style == "v5":
            if rng.random() < 0.65:
                img, depth = self._item_v5(rng, h, w)
            else:
                img, depth = self._item_v2(rng, h, w)
        elif self.style in ("v2", "v3", "v4"):
            img, depth = self._item_v2(rng, h, w)
        else:
            bg = rng.uniform(0.25, 0.75, 3).astype(np.float32)
            img = self._texture(rng, h, w, bg)
            depth = np.full((h, w), rng.uniform(2.0, 9.0), np.float32)
            for _ in range(rng.integers(4, 9)):
                x0, y0 = rng.integers(0, w - 8), rng.integers(0, h - 8)
                bw, bh = rng.integers(8, w // 2), rng.integers(8, h // 2)
                bh = min(bh, h - y0)
                bw = min(bw, w - x0)
                color = rng.uniform(0.1, 0.9, 3).astype(np.float32)
                d = rng.uniform(0.3, 8.0)
                img[y0:y0 + bh, x0:x0 + bw] = self._texture(rng, bh, bw, color)
                depth[y0:y0 + bh, x0:x0 + bw] = d
        if self.train:
            img = photometric_augment(img, rng).astype(np.float32)
        img = img + rng.standard_normal(img.shape, dtype=np.float32) * np.float32(0.015)
        img = np.clip(img, 0, 1)
        return [_chw(img), depth[None]]
