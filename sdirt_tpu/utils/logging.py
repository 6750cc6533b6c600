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
