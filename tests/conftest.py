"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU (config 1 of BASELINE.json is CPU-runnable) with 8 virtual
devices so multi-chip sharding is exercised without TPU hardware. Must be
set before jax initializes.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable (for the oracle package) regardless of cwd.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# The environment's sitecustomize may register an accelerator plugin and
# override JAX_PLATFORMS programmatically; force CPU for tests regardless.
# Set TEXCOMP_TEST_BACKEND=accel to run the suite on the real accelerator
# (exercises the Pallas paths; device-count-dependent tests self-skip).
if os.environ.get("TEXCOMP_TEST_BACKEND") != "accel":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def oracle():
    """The reference-C++ oracle, or skip if it cannot be built."""
    from oracle import Oracle

    o = Oracle.create()
    if o is None:
        pytest.skip("reference oracle unavailable (no /root/reference or g++)")
    return o


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


def make_test_image(rng, h, w, c, kind="mixed"):
    """Deterministic test images: smooth gradients + hard edges + noise,
    exercising const-color blocks, high-contrast blocks, and alpha extremes."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, c), dtype=np.int32)
    img[..., 0] = (xx * 255 // max(1, w - 1)) if w > 1 else 128
    img[..., 1] = (yy * 255 // max(1, h - 1)) if h > 1 else 128
    img[..., 2] = ((xx + yy) % 2) * 255  # checkerboard: max contrast
    if c == 4:
        # bands of 0 / 255 / gradient alpha to hit all DXT5 schemes
        band = (yy * 5 // max(1, h)) % 5
        img[..., 3] = np.select(
            [band == 0, band == 1, band == 2],
            [0, 255, (xx * 255 // max(1, w - 1)) if w > 1 else 7],
            default=rng.integers(0, 256, size=(h, w)),
        )
    if kind == "mixed":
        noise_region = (yy >= h // 2)
        noise = rng.integers(0, 256, size=(h, w, c))
        img = np.where(noise_region[..., None], noise, img)
    elif kind == "solid":
        img[:] = rng.integers(0, 256, size=(1, 1, c))
    return img.astype(np.uint8)
