"""High-quality DXT mode (EXTENSION): must never lose to the reference
encoder and should clearly beat it on natural content."""

import numpy as np
import pytest

from texcomp import CompressedImage, DxtcCompressor, Format
from texcomp.codecs import dxt as dxt_ref
from texcomp.codecs import dxt_hq
from tests.conftest import make_test_image


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255**2 / max(mse, 1e-9))


def _natural_image(rng, h, w, c):
    """Smooth chroma-varying content where luminance-only metrics fail."""
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    img = np.zeros((h, w, c))
    img[..., 0] = 128 + 90 * np.sin(xx / 9) + 20 * np.cos(yy / 5)
    img[..., 1] = 128 + 90 * np.sin(yy / 7 + 1)
    img[..., 2] = 128 + 90 * np.sin((xx - yy) / 11 + 2)
    img += rng.normal(0, 6, (h, w, c))
    if c == 4:
        img[..., 3] = np.clip(128 + 120 * np.sin(xx / 13), 0, 255)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_hq_blocks_never_worse_than_reference(rng):
    import jax.numpy as jnp

    rgb = rng.integers(0, 256, (500, 16, 3)).astype(np.int32)
    rgb[5:10] = rgb[5:6, 0:1]  # solid blocks: const-color path should win

    hq = np.asarray(dxt_hq.encode_dxt1_hq_blocks(jnp.asarray(rgb)))
    ref = np.asarray(dxt_ref.encode_dxt1_blocks(jnp.asarray(rgb)))

    dec_hq = np.asarray(dxt_ref.decode_dxt1_blocks(jnp.asarray(hq)))
    dec_ref = np.asarray(dxt_ref.decode_dxt1_blocks(jnp.asarray(ref)))
    err_hq = np.sum((dec_hq - rgb) ** 2, axis=(1, 2))
    err_ref = np.sum((dec_ref - rgb) ** 2, axis=(1, 2))
    assert np.all(err_hq <= err_ref), (
        f"hq worse on {np.sum(err_hq > err_ref)} blocks"
    )
    # strictly better somewhere on random content
    assert np.sum(err_hq < err_ref) > 100


@pytest.mark.parametrize("fmt", [Format.RGB, Format.RGBA])
def test_hq_api_beats_reference_psnr(fmt, rng):
    c = 3 if fmt == Format.RGB else 4
    h = w = 64
    img = _natural_image(rng, h, w, c)

    def roundtrip(quality):
        comp = DxtcCompressor(quality=quality)
        ci = CompressedImage()
        assert comp.compress(fmt, h, w, 0, img.tobytes(), ci)
        buf = bytearray()
        assert comp.decompress(ci, buf)
        return np.frombuffer(bytes(buf), np.uint8).reshape(h, w, c)

    p_ref = _psnr(roundtrip("reference")[..., :3], img[..., :3])
    p_hq = _psnr(roundtrip("high")[..., :3], img[..., :3])
    assert p_hq > p_ref + 1.0, (p_ref, p_hq)


@pytest.mark.parametrize(
    "fmt", [Format.RGB, Format.BGR, Format.RGBA, Format.BGRA])
def test_hq_never_worse_all_formats(fmt, rng):
    """Per-block HQ error <= reference error for ALL four formats,
    including the red/blue-swapped ones (dxtc_compressor.cc:288,295,333)."""
    c = 3 if fmt in (Format.RGB, Format.BGR) else 4
    h = w = 48
    img = _natural_image(rng, h, w, c)

    def roundtrip(quality):
        comp = DxtcCompressor(quality=quality)
        ci = CompressedImage()
        assert comp.compress(fmt, h, w, 0, img.tobytes(), ci)
        buf = bytearray()
        assert comp.decompress(ci, buf)
        return np.frombuffer(bytes(buf), np.uint8).reshape(h, w, c)

    def block_errors(dec):
        d = (dec.astype(int) - img.astype(int)) ** 2
        return d.reshape(h // 4, 4, w // 4, 4, c).sum(axis=(1, 3, 4))

    err_ref = block_errors(roundtrip("reference"))
    err_hq = block_errors(roundtrip("high"))
    assert np.all(err_hq <= err_ref), (
        f"hq worse on {np.sum(err_hq > err_ref)} blocks for {fmt.name}")
    assert np.sum(err_hq < err_ref) > 10  # strictly better somewhere


def test_hq_payloads_are_standard_dxt(rng):
    """HQ output must decode under the ordinary decoder and validate."""
    h = w = 32
    img = make_test_image(rng, h, w, 4)
    comp = DxtcCompressor(quality="high")
    ci = CompressedImage()
    assert comp.compress(Format.RGBA, h, w, 0, img.tobytes(), ci)
    assert DxtcCompressor().is_valid_compressed_image(ci)
    buf = bytearray()
    assert DxtcCompressor().decompress(ci, buf)
    # HQ alpha decodes at least as well as the reference scheme
    ref = CompressedImage()
    assert DxtcCompressor().compress(Format.RGBA, h, w, 0, img.tobytes(), ref)
    rbuf = bytearray()
    assert DxtcCompressor().decompress(ref, rbuf)
    hq_dec = np.frombuffer(bytes(buf), np.uint8).reshape(h, w, 4)
    ref_dec = np.frombuffer(bytes(rbuf), np.uint8).reshape(h, w, 4)
    hq_aerr = np.sum((hq_dec[..., 3].astype(int) - img[..., 3]) ** 2)
    ref_aerr = np.sum((ref_dec[..., 3].astype(int) - img[..., 3]) ** 2)
    assert hq_aerr <= ref_aerr


def test_quality_arg_validation():
    with pytest.raises(ValueError):
        DxtcCompressor(quality="ultra")


def test_hq_alpha_never_worse(rng):
    """HQ DXT5 alpha endpoints never lose to the reference scheme."""
    import jax.numpy as jnp

    rgba = rng.integers(0, 256, (400, 16, 4)).astype(np.int32)
    rgba[50:100, :, 3] = (np.arange(16)[None, :] * 15
                          + rng.integers(0, 40, (50, 1))).clip(0, 255)
    rgba[100:110, :, 3] = 0
    rgba[110:120, :, 3] = 255
    outside = np.zeros(400, bool)

    ref = np.asarray(dxt_ref.encode_dxt5_blocks(jnp.asarray(rgba),
                                                jnp.asarray(outside)))
    hq = np.asarray(dxt_hq.encode_dxt5_hq_blocks(jnp.asarray(rgba),
                                                 jnp.asarray(outside)))
    dref = np.asarray(dxt_ref.decode_dxt5_blocks(jnp.asarray(ref)))[:, :, 3]
    dhq = np.asarray(dxt_ref.decode_dxt5_blocks(jnp.asarray(hq)))[:, :, 3]
    a = rgba[:, :, 3]
    eref = np.sum((dref - a) ** 2, axis=1)
    ehq = np.sum((dhq - a) ** 2, axis=1)
    assert np.all(ehq <= eref)
    assert np.sum(ehq < eref) > 100
