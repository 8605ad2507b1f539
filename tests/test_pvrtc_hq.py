"""PVRTC HQ mode (EXTENSION): valid payloads, never worse, clearly better.

The HQ encoder (codecs/pvrtc_hq.py) must produce standard PVRTC 2BPP
payloads (same container rules as the reference path) whose decoded error
is never above the reference encoder's, per the image-level best-of.
"""

import numpy as np
import pytest

from texcomp import CompressedImage, Format, PvrtcCompressor
from tests.conftest import make_test_image


def _sse(img: np.ndarray, comp: PvrtcCompressor, ci: CompressedImage) -> float:
    buf = bytearray()
    assert comp.decompress_extension(ci, buf)
    dec = np.frombuffer(bytes(buf), np.uint8).reshape(img.shape)
    d = dec.astype(np.float64) - img.astype(np.float64)
    return float((d * d).sum())


def _encode(img: np.ndarray, quality: str) -> tuple[PvrtcCompressor, CompressedImage]:
    h, w = img.shape[:2]
    c = PvrtcCompressor(quality=quality)
    ci = CompressedImage()
    assert c.compress(Format.RGBA, h, w, 0, img.tobytes(), ci)
    return c, ci


@pytest.mark.parametrize("size", [8, 32, 64])
@pytest.mark.parametrize("kind", ["mixed", "solid"])
def test_hq_never_worse(size, kind, rng):
    img = make_test_image(rng, size, size, 4, kind=kind)
    c_ref, ci_ref = _encode(img, "reference")
    c_hq, ci_hq = _encode(img, "high")
    assert c_hq.is_valid_compressed_image(ci_hq)
    assert ci_hq.get_data_size() == ci_ref.get_data_size()
    assert _sse(img, c_hq, ci_hq) <= _sse(img, c_ref, ci_ref)


def test_hq_beats_reference_on_smooth_content(rng):
    """On smooth gradients (photo-like), HQ must be strictly better."""
    size = 64
    yy, xx = np.mgrid[0:size, 0:size]
    img = np.stack([
        (xx * 255 // (size - 1)),
        (yy * 255 // (size - 1)),
        ((xx + yy) * 255 // (2 * size - 2)),
        np.full((size, size), 255),
    ], axis=-1).astype(np.uint8)
    # add mild structure so the reference's extremes heuristic is suboptimal
    img[..., 0] = np.clip(
        img[..., 0].astype(np.int32)
        + (20 * np.sin(xx / 3.0)).astype(np.int32), 0, 255).astype(np.uint8)

    c_ref, ci_ref = _encode(img, "reference")
    c_hq, ci_hq = _encode(img, "high")
    sse_ref = _sse(img, c_ref, ci_ref)
    sse_hq = _sse(img, c_hq, ci_hq)
    assert sse_hq < sse_ref * 0.9  # clearly better, not just a tie


def test_hq_translucent_alpha(rng):
    """Translucent content exercises the 3443/3444 reduction path."""
    img = make_test_image(rng, 32, 32, 4)  # has 0/255/gradient alpha bands
    c_ref, ci_ref = _encode(img, "reference")
    c_hq, ci_hq = _encode(img, "high")
    assert c_hq.is_valid_compressed_image(ci_hq)
    assert _sse(img, c_hq, ci_hq) <= _sse(img, c_ref, ci_ref)


def test_hq_deterministic(rng):
    img = make_test_image(rng, 32, 32, 4)
    _, ci1 = _encode(img, "high")
    _, ci2 = _encode(img, "high")
    np.testing.assert_array_equal(ci1.get_data(), ci2.get_data())


def test_hq_default_is_reference(rng, oracle):
    """quality defaults to 'reference' and stays byte-identical to the C++
    oracle — the HQ extension must not perturb the parity path."""
    img = make_test_image(rng, 32, 32, 4)
    ref, _, _ = oracle.compress("pvrtc", Format.RGBA, 32, 32, 0, img.tobytes())
    _, ci = _encode(img, "reference")
    np.testing.assert_array_equal(ci.get_data(), ref)


def test_hq_quality_arg_validated():
    with pytest.raises(ValueError):
        PvrtcCompressor(quality="ultra")


# -- 4bpp extension ---------------------------------------------------------


def _sse4(img, comp, ci):
    from texcomp import Pvrtc4bppCompressor  # noqa: F401

    buf = bytearray()
    assert comp.decompress(ci, buf)
    dec = np.frombuffer(bytes(buf), np.uint8).reshape(img.shape)
    d = dec.astype(np.float64) - img.astype(np.float64)
    return float((d * d).sum())


@pytest.mark.parametrize("size", [8, 32])
def test_hq4_never_worse(size, rng):
    from texcomp import Pvrtc4bppCompressor

    img = make_test_image(rng, size, size, 4)
    results = {}
    for q in ("reference", "high"):
        c = Pvrtc4bppCompressor(quality=q)
        ci = CompressedImage()
        assert c.compress(Format.RGBA, size, size, 0, img.tobytes(), ci)
        assert c.is_valid_compressed_image(ci)
        results[q] = _sse4(img, c, ci)
    assert results["high"] <= results["reference"]


def test_hq4_beats_default_on_smooth_content():
    from texcomp import Pvrtc4bppCompressor

    size = 64
    yy, xx = np.mgrid[0:size, 0:size]
    img = np.stack([
        (xx * 255 // (size - 1)),
        (yy * 255 // (size - 1)),
        np.clip(((xx + yy) * 255 // (2 * size - 2))
                + (20 * np.sin(xx / 3.0)).astype(np.int64), 0, 255),
        np.full((size, size), 255),
    ], axis=-1).astype(np.uint8)
    sse = {}
    for q in ("reference", "high"):
        c = Pvrtc4bppCompressor(quality=q)
        ci = CompressedImage()
        assert c.compress(Format.RGBA, size, size, 0, img.tobytes(), ci)
        sse[q] = _sse4(img, c, ci)
    assert sse["high"] < sse["reference"] * 0.9
