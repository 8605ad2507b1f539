"""DXT1/DXT5 codec tests: bit-level decode, round-trip invariants, and
byte-exact parity against the reference C++ oracle."""

import numpy as np
import pytest

from texcomp import CompressedImage, DxtcCompressor, Format
from texcomp.codecs import dxt
from tests.conftest import make_test_image

SIZES = [(4, 4), (16, 16), (37, 53), (8, 256), (1, 1), (2, 7), (5, 4), (3, 3)]
FORMATS = [Format.RGB, Format.BGR, Format.RGBA, Format.BGRA]


def _components(fmt):
    return 3 if fmt in (Format.RGB, Format.BGR) else 4


def test_decode_dxt1_handbuilt_block():
    """Decode a hand-built block per the layout at dxtc_compressor.cc:36-67
    and the 4-color rule at :167-192."""
    # color0 = (31, 63, 31) = white-ish 0xFFFF, color1 = 0x0000 black
    c0 = 0xFFFF
    c1 = 0x0000
    # bits rows: pixel (0,0) code 0, (0,1) code 1, (0,2) code 2, (0,3) code 3
    block = np.array(
        [[c0 & 0xFF, c0 >> 8, c1 & 0xFF, c1 >> 8, 0b11100100, 0, 0x55, 0xAA]],
        dtype=np.uint8,
    )
    out = np.asarray(dxt.decode_dxt1_blocks(block))[0].reshape(4, 4, 3)
    np.testing.assert_array_equal(out[0, 0], [255, 255, 255])
    np.testing.assert_array_equal(out[0, 1], [0, 0, 0])
    np.testing.assert_array_equal(out[0, 2], [170, 170, 170])  # 2/3 white
    np.testing.assert_array_equal(out[0, 3], [85, 85, 85])  # 1/3 white
    np.testing.assert_array_equal(out[1, 0], [255, 255, 255])  # row bits 0
    # row 2: 0x55 = code 1 everywhere -> black
    np.testing.assert_array_equal(out[2, 2], [0, 0, 0])
    # row 3: 0xAA = code 2 everywhere
    np.testing.assert_array_equal(out[3, 0], [170, 170, 170])


def test_decode_dxt1_3color_mode():
    """c0 <= c1 selects 3-color + black mode (dxtc_compressor.cc:183-191)."""
    c0 = 0x0000
    c1 = 0xFFFF
    block = np.array(
        [[c0 & 0xFF, c0 >> 8, c1 & 0xFF, c1 >> 8, 0b11100100, 0, 0, 0]],
        dtype=np.uint8,
    )
    out = np.asarray(dxt.decode_dxt1_blocks(block))[0].reshape(4, 4, 3)
    np.testing.assert_array_equal(out[0, 2], [127, 127, 127])  # 1/2 mix
    np.testing.assert_array_equal(out[0, 3], [0, 0, 0])  # explicit black


def test_decode_dxt5_alpha_ramps():
    """Alpha decode schemes (dxtc_compressor.cc:195-217)."""
    # a0 > a1: 6-interpolant scheme
    data = np.zeros((1, 16), dtype=np.uint8)
    data[0, 0] = 248  # alpha0
    data[0, 1] = 8  # alpha1
    # alpha codes: pixel 0 -> 0, pixel 1 -> 1, pixel 2 -> 2 ... pixel 7 -> 7
    codes = np.arange(16) % 8
    shifts = np.arange(8) * 3
    half0 = int(np.sum(codes[:8] << shifts))
    half1 = int(np.sum(codes[8:] << shifts))
    data[0, 2:5] = [(half0 >> s) & 0xFF for s in (0, 8, 16)]
    data[0, 5:8] = [(half1 >> s) & 0xFF for s in (0, 8, 16)]
    out = np.asarray(dxt.decode_dxt5_blocks(data))[0, :, 3]
    exp = [248, 8]
    for s0, s1 in [(6, 1), (5, 2), (4, 3), (3, 4), (2, 5), (1, 6)]:
        exp.append((s0 * 248 + s1 * 8) // 7)
    np.testing.assert_array_equal(out[:8], exp)

    # a0 <= a1: explicit 0/255 scheme
    data[0, 0] = 8
    data[0, 1] = 248
    out = np.asarray(dxt.decode_dxt5_blocks(data))[0, :, 3]
    exp = [8, 248]
    for s0, s1 in [(4, 1), (3, 2), (2, 3), (1, 4)]:
        exp.append((s0 * 8 + s1 * 248) // 5)
    exp += [0, 255]
    np.testing.assert_array_equal(out[:8], exp)


@pytest.mark.parametrize("fmt", FORMATS)
def test_compressed_size_and_validity(fmt, rng):
    c = DxtcCompressor()
    bs = 8 if _components(fmt) == 3 else 16
    assert c.compute_compressed_data_size(fmt, 16, 16) == 16 * bs
    assert c.compute_compressed_data_size(fmt, 1, 1) == bs
    assert c.compute_compressed_data_size(fmt, 0, 5) == 0

    img = make_test_image(rng, 20, 24, _components(fmt))
    ci = CompressedImage()
    assert c.compress(fmt, 20, 24, 0, img.tobytes(), ci)
    assert c.is_valid_compressed_image(ci)
    assert ci.get_data_size() == c.compute_compressed_data_size(fmt, 20, 24)
    md = ci.get_metadata()
    assert (md.compressed_height, md.compressed_width) == (20, 24)
    assert md.compressor_name == "dxtc"


def test_compress_rejects_bad_args(rng):
    c = DxtcCompressor()
    ci = CompressedImage()
    assert not c.compress(Format.RGB, 0, 4, 0, b"", ci)
    assert not c.compress(Format.RGB, 4, 0, 0, b"", ci)
    assert not c.compress(Format.RGB, 4, 4, 0, None, ci)
    assert not c.compress(Format.RGB, 4, 4, 0, b"x" * 48, None)


def test_external_storage(rng):
    """External-storage instances must match the exact size
    (compressor4x4_helper.cc:36-40)."""
    c = DxtcCompressor()
    img = make_test_image(rng, 8, 8, 3)
    good = np.zeros(4 * 8, dtype=np.uint8)
    ci = CompressedImage(external_data=good)
    assert c.compress(Format.RGB, 8, 8, 0, img.tobytes(), ci)
    assert not ci.owns_data()
    assert good.any()  # wrote into the external buffer

    bad = np.zeros(17, dtype=np.uint8)
    ci2 = CompressedImage(external_data=bad)
    assert not c.compress(Format.RGB, 8, 8, 0, img.tobytes(), ci2)


def test_row_padding_input(rng, oracle):
    """padding_bytes_per_row strides the input rows (pixel4x4.h:47-48)."""
    h, w, pad = 12, 12, 5
    img = make_test_image(rng, h, w, 3)
    buf = np.zeros(h * (w * 3 + pad), dtype=np.uint8)
    rows = buf.reshape(h, w * 3 + pad)
    rows[:, : w * 3] = img.reshape(h, -1)
    c = DxtcCompressor()
    ci = CompressedImage()
    assert c.compress(Format.RGB, h, w, pad, buf.tobytes(), ci)
    ref, _, _ = oracle.compress("dxtc", Format.RGB, h, w, pad, buf.tobytes())
    np.testing.assert_array_equal(ci.get_data(), ref)


@pytest.mark.parametrize("size", SIZES)
@pytest.mark.parametrize("fmt", FORMATS)
def test_encode_decode_oracle_parity(size, fmt, rng, oracle):
    """North star: byte-identical encode and decode vs the C++ reference."""
    h, w = size
    comps = _components(fmt)
    img = make_test_image(rng, h, w, comps)
    ref, ch, cw = oracle.compress("dxtc", fmt, h, w, 0, img.tobytes())

    c = DxtcCompressor()
    ci = CompressedImage()
    assert c.compress(fmt, h, w, 0, img.tobytes(), ci)
    np.testing.assert_array_equal(ci.get_data(), ref, err_msg="encode bytes")

    refdec = oracle.decompress("dxtc", fmt, h, w, ch, cw, 0, ref, comps)
    buf = bytearray()
    assert c.decompress(ci, buf)
    assert bytes(buf) == refdec.tobytes()


def test_roundtrip_quality(rng):
    """Compress->decompress PSNR sanity on a natural-ish gradient image."""
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 4 % 256, yy * 4 % 256, (xx + yy) * 2 % 256], axis=-1
    ).astype(np.uint8)
    c = DxtcCompressor()
    ci = CompressedImage()
    assert c.compress(Format.RGB, h, w, 0, img.tobytes(), ci)
    buf = bytearray()
    assert c.decompress(ci, buf)
    dec = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, 3)
    mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 25, psnr


def test_decompress_with_row_padding_layout(rng):
    """Decompress honors padding_bytes_per_row in the output: rows at the
    padded stride, zero-filled gaps, no trailing pad after the last row.
    (The reference's padded-output path overflows its own buffer —
    compressor4x4_helper.h:225-226 vs :238-239 — so this is our
    well-defined replacement; padding=0 output is byte-identical.)"""
    h, w, pad = 12, 8, 5
    img = make_test_image(rng, h, w, 3)
    buf_in = np.zeros(h * (w * 3 + pad), dtype=np.uint8)
    buf_in.reshape(h, w * 3 + pad)[:, : w * 3] = img.reshape(h, -1)

    c = DxtcCompressor()
    ci = CompressedImage()
    assert c.compress(Format.RGB, h, w, pad, buf_in.tobytes(), ci)
    assert ci.get_metadata().padding_bytes_per_row == pad

    out = bytearray()
    assert c.decompress(ci, out)
    bpr = w * 3 + pad
    assert len(out) == (h - 1) * bpr + w * 3

    # Compare with the unpadded decode of the same payload.
    ci0 = CompressedImage()
    assert c.compress(Format.RGB, h, w, 0, img.tobytes(), ci0)
    out0 = bytearray()
    assert c.decompress(ci0, out0)
    rows0 = np.frombuffer(bytes(out0), np.uint8).reshape(h, w * 3)
    arr = np.frombuffer(bytes(out), np.uint8)
    for r in range(h):
        np.testing.assert_array_equal(
            arr[r * bpr : r * bpr + w * 3], rows0[r], err_msg=f"row {r}"
        )
        if r < h - 1:
            assert not arr[r * bpr + w * 3 : (r + 1) * bpr].any()


def test_compressed_image_duplicate(rng):
    """Duplicate deep-copies data AND metadata (compressed_image.h:112-122):
    mutating the source afterwards must not affect the copy."""
    from texcomp import CompressedImage, DxtcCompressor, Format

    img = make_test_image(rng, 8, 8, 3)
    src = CompressedImage()
    assert DxtcCompressor().compress(Format.RGB, 8, 8, 0, img.tobytes(), src)

    dup = CompressedImage()
    dup.duplicate(src)
    assert dup.owns_data()
    np.testing.assert_array_equal(dup.get_data(), src.get_data())
    assert dup.get_metadata() == src.get_metadata()

    src.get_mutable_data()[:] = 0
    src.get_metadata().compressor_name = "mutated"
    assert dup.get_metadata().compressor_name == "dxtc"
    assert np.asarray(dup.get_data()).any()

    # self-duplicate of an owned image is a no-op
    dup.duplicate(dup)
    assert dup.get_metadata().compressor_name == "dxtc"

    # external-storage instances reject set_metadata misuse
    import pytest as _pytest

    with _pytest.raises(ValueError):
        src.set_metadata(src.get_metadata())
