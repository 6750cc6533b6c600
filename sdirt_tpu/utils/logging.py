"""Logging / seeding / profiling utilities.

Parity source: /root/reference/deeplens/utils.py:136-172 (set_seed,
set_logger) plus jax.profiler trace hooks and a rays/sec counter the
reference lacked (SURVEY §5 tracing row).
"""

from __future__ import annotations

import contextlib
import logging
import os
import random
import time

import numpy as np


def set_seed(seed: int = 0):
    random.seed(seed)
    np.random.seed(seed)


def set_logger(result_dir: str | None = None):
    """Console + file logging on the root logger (reference utils.py:148-164)."""
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter("%(asctime)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    root.addHandler(sh)
    if result_dir is not None:
        os.makedirs(result_dir, exist_ok=True)
        fh = logging.FileHandler(f"{result_dir}/train.log")
        fh.setFormatter(fmt)
        root.addHandler(fh)


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace scope (viewable in TensorBoard/XProf)."""
    import jax

    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield


class RaysPerSecond:
    """Accumulating throughput counter for the trace-and-splat north star."""

    def __init__(self):
        self.rays = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_rays: int):
        t0 = time.perf_counter()
        yield
        self.seconds += time.perf_counter() - t0
        self.rays += n_rays

    @property
    def rays_per_sec(self) -> float:
        return self.rays / self.seconds if self.seconds else 0.0


def print_memory(tag: str = ""):
    """Device memory statistics (the reference printed CUDA stats,
    deeplens/utils.py:166-172)."""
    import jax

    for dev in jax.local_devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            used = stats.get("bytes_in_use", 0) / 2**30
            peak = stats.get("peak_bytes_in_use", 0) / 2**30
            lim = stats.get("bytes_limit", 0) / 2**30
            print(f"{tag} {dev}: {used:.2f} GiB in use "
                  f"(peak {peak:.2f} / limit {lim:.2f})")


def host_rss_gb() -> float:
    """Resident set size of this process in GiB. Used by the training loops'
    leak watchdog: the TPU tunnel runtime on this rig retains host staging
    buffers from per-step `device_put` uploads (~8 MB/step at the production
    DfDP shape), which accumulates to an OOM kill over a multi-hour run."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 2**20   # kB -> GiB
    except OSError:
        pass
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def batch_LPIPS(img, img_clean):
    """Perceptual distance (reference batch_LPIPS, deeplens/utils.py:40-52).

    Uses the real `lpips` package (VGG backbone) when installed; otherwise
    falls back to the weight-free pure-JAX proxy (MS-SSIM + GMSD,
    sdirt_tpu/dfdp/perceptual.py) — 0 for identical images and monotone
    with degradation, but NOT on the LPIPS absolute scale."""
    try:
        import lpips  # noqa: F401  (not installed in this image)
        import torch

        loss_fn = lpips.LPIPS(net="vgg", spatial=True)
        dist = loss_fn.forward(torch.as_tensor(np.asarray(img)),
                               torch.as_tensor(np.asarray(img_clean)))
        return dist.mean().item()
    except ImportError:
        from ..dfdp.perceptual import batch_perceptual

        logging.getLogger(__name__).info(
            "lpips package unavailable; using the MS-SSIM+GMSD proxy "
            "(values are not on the LPIPS scale)")
        return batch_perceptual(img, img_clean)
