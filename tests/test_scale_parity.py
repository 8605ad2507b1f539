"""Oracle byte-parity at production scale (512x512).

Every other oracle-parity test runs at <= 256^2; the production kernels
exist for multi-megapixel inputs where the lane grids run many steps and
the image<->block transposes hit their tiled paths. One 512^2 case per
codec pins byte-exactness there against the C++ reference itself (not
just against the jnp ground-truth codec)."""

import numpy as np
import pytest

from conftest import make_test_image
from texcomp import (CompressedImage, DxtcCompressor, EtcCompressor,
                     Format, PvrtcCompressor)

S = 512


@pytest.mark.parametrize("fmt", [Format.RGB, Format.RGBA])
def test_dxtc_512_oracle_parity(fmt, rng, oracle):
    comps = 3 if fmt == Format.RGB else 4
    img = make_test_image(rng, S, S, comps)
    ref, _, _ = oracle.compress("dxtc", fmt, S, S, 0, img.tobytes())
    c = DxtcCompressor()
    ci = CompressedImage()
    assert c.compress(fmt, S, S, 0, img.tobytes(), ci)
    np.testing.assert_array_equal(ci.get_data(), ref)


@pytest.mark.parametrize("strategy", [2, 3])  # kSmallerError, kHeuristic
def test_etc_512_oracle_parity(strategy, rng, oracle):
    img = make_test_image(rng, S, S, 3)
    ref, _, _ = oracle.compress("etc", Format.RGB, S, S, 0, img.tobytes(),
                                strategy=strategy)
    c = EtcCompressor(strategy)
    ci = CompressedImage()
    assert c.compress(Format.RGB, S, S, 0, img.tobytes(), ci)
    np.testing.assert_array_equal(ci.get_data(), ref)


def test_pvrtc_512_oracle_parity(rng, oracle):
    img = make_test_image(rng, S, S, 4)
    ref, _, _ = oracle.compress("pvrtc", Format.RGBA, S, S, 0, img.tobytes())
    c = PvrtcCompressor()
    ci = CompressedImage()
    assert c.compress(Format.RGBA, S, S, 0, img.tobytes(), ci)
    np.testing.assert_array_equal(ci.get_data(), ref)
