"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run anywhere.

This environment preloads jax via sitecustomize before conftest runs, so
env-var-only switching is too late; jax.config.update works because backends
initialize lazily on first device use."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy tests (>=15s on a 1-core CPU host); "
        "ci.sh skips these by default — run `bash scripts/ci.sh --full` "
        "or `pytest -m slow` for the full tier")


GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
RF50 = "/root/reference/lenses/rf50mm/lens_web.json"
RF35 = "/root/reference/lenses/rf35mm/lens_web.json"


@pytest.fixture(scope="session")
def rf50_lens():
    from sdirt_tpu.optics.lens import Lens

    return Lens(RF50, sensor_res=(512, 768))


@pytest.fixture(scope="session")
def rf35_lens():
    from sdirt_tpu.optics.lens import Lens

    return Lens(RF35, sensor_res=(512, 768))


@pytest.fixture(scope="session")
def golden_rf50():
    import numpy as np

    return dict(np.load(GOLDEN_DIR / "rf50mm.npz", allow_pickle=True))


@pytest.fixture(scope="session")
def golden_rf35():
    import numpy as np

    return dict(np.load(GOLDEN_DIR / "rf35mm.npz", allow_pickle=True))
