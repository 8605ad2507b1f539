"""DXTC compressed-domain ops: pad, downsample, solid, subimage,
compress-and-pad — semantics + oracle parity."""

import numpy as np
import pytest

from texcomp import CompressedImage, DxtcCompressor, Format
from tests.conftest import make_test_image

FORMATS = [Format.RGB, Format.RGBA]


def _components(fmt):
    return 3 if fmt in (Format.RGB, Format.BGR) else 4


def _compress(fmt, h, w, img):
    c = DxtcCompressor()
    ci = CompressedImage()
    assert c.compress(fmt, h, w, 0, img.tobytes(), ci)
    return c, ci


@pytest.mark.parametrize("fmt", FORMATS)
def test_pad_oracle_parity(fmt, rng, oracle):
    h, w = 12, 8
    img = make_test_image(rng, h, w, _components(fmt))
    c, ci = _compress(fmt, h, w, img)

    for ph, pw in [(20, 20), (12, 24), (24, 8), (12, 8), (8, 4)]:
        padded = CompressedImage()
        assert c.pad(ci, ph, pw, padded)
        ref = oracle.pad("dxtc", fmt, h, w, h, w, 0, ci.get_data(), ph, pw)
        assert ref is not None
        np.testing.assert_array_equal(padded.get_data(), ref[0],
                                      err_msg=f"pad {ph}x{pw}")
        md = padded.get_metadata()
        assert (md.compressed_height, md.compressed_width) == (ref[1], ref[2])


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize(
    "size",
    [(16, 16), (8, 24), (4, 4), (2, 2), (1, 4), (4, 1), (2, 4), (12, 12),
     (3, 3), (6, 8)],
)
def test_downsample_oracle_parity(size, fmt, rng, oracle):
    h, w = size
    img = make_test_image(rng, h, w, _components(fmt))
    c, ci = _compress(fmt, h, w, img)

    down = CompressedImage()
    got = c.downsample(ci, down)
    ref = oracle.downsample("dxtc", fmt, h, w,
                            ci.get_metadata().compressed_height,
                            ci.get_metadata().compressed_width,
                            0, ci.get_data())
    if ref is None:
        assert not got, f"reference rejects downsample of {h}x{w}"
        return
    assert got
    np.testing.assert_array_equal(down.get_data(), ref[0])
    md = down.get_metadata()
    assert md.uncompressed_height == (h + 1) // 2
    assert md.uncompressed_width == (w + 1) // 2


def test_downsample_odd_blocks_rejected(rng):
    """Odd block counts > 1 are rejected (compressor4x4_helper.h:281-284)."""
    img = make_test_image(rng, 12, 8, 3)
    c, ci = _compress(Format.RGB, 12, 8, img)
    down = CompressedImage()
    assert not c.downsample(ci, down)  # 3 block rows


def test_mipmap_chain(rng, oracle):
    """Full mipmap chain 64 -> 1 stays byte-exact at every level."""
    h = w = 64
    img = make_test_image(rng, h, w, 4)
    c, ci = _compress(Format.RGBA, h, w, img)
    cur = ci
    ch, cw = h, w
    while ch > 1 or cw > 1:
        down = CompressedImage()
        assert c.downsample(cur, down), (ch, cw)
        md = cur.get_metadata()
        ref = oracle.downsample("dxtc", Format.RGBA,
                                md.uncompressed_height, md.uncompressed_width,
                                md.compressed_height, md.compressed_width,
                                0, cur.get_data())
        np.testing.assert_array_equal(down.get_data(), ref[0],
                                      err_msg=f"level {ch}x{cw}")
        cur = down
        ch, cw = (ch + 1) // 2, (cw + 1) // 2


@pytest.mark.parametrize("fmt", FORMATS)
def test_create_solid_image_oracle_parity(fmt, rng, oracle):
    c = DxtcCompressor()
    for color in [(0, 0, 0, 0), (255, 255, 255, 255), (13, 77, 200, 128),
                  (128, 128, 128, 3)]:
        col = np.array(color[: _components(fmt)], dtype=np.uint8)
        ci = CompressedImage()
        assert c.create_solid_image(fmt, 20, 12, col, ci)
        ref = oracle.create_solid("dxtc", fmt, 20, 12, col)
        np.testing.assert_array_equal(ci.get_data(), ref[0], err_msg=str(color))


@pytest.mark.parametrize("fmt", FORMATS)
def test_copy_subimage_oracle_parity(fmt, rng, oracle):
    h, w = 24, 32
    img = make_test_image(rng, h, w, _components(fmt))
    c, ci = _compress(fmt, h, w, img)

    sub = CompressedImage()
    assert c.copy_subimage(ci, 4, 8, 16, 12, sub)
    ref = oracle.copy_subimage("dxtc", fmt, h, w, h, w, 0, ci.get_data(),
                               4, 8, 16, 12)
    np.testing.assert_array_equal(sub.get_data(), ref[0])

    # Non-multiple-of-4 rejected (compressor4x4_helper.h:555-561).
    assert not c.copy_subimage(ci, 2, 0, 8, 8, CompressedImage())
    assert not c.copy_subimage(ci, 0, 0, 6, 8, CompressedImage())
    # Out of bounds rejected.
    assert not c.copy_subimage(ci, 16, 28, 12, 8, CompressedImage())


@pytest.mark.parametrize("fmt", FORMATS)
def test_compress_and_pad_oracle_parity(fmt, rng, oracle):
    h, w = 10, 14
    img = make_test_image(rng, h, w, _components(fmt))
    c = DxtcCompressor()
    for ph, pw in [(16, 16), (10, 32), (4, 4)]:
        ci = CompressedImage()
        assert c.compress_and_pad(fmt, h, w, ph, pw, 0, img.tobytes(), ci)
        ref, rch, rcw = oracle.compress_and_pad("dxtc", fmt, h, w, ph, pw, 0,
                                                img.tobytes())
        np.testing.assert_array_equal(ci.get_data(), ref,
                                      err_msg=f"pad {ph}x{pw}")
        md = ci.get_metadata()
        assert (md.compressed_height, md.compressed_width) == (rch, rcw)


def test_downsample_padded_payload_oracle_parity(rng, oracle):
    """Downsampling a payload whose compressed grid is larger than the
    uncompressed extent (is_valid_compressed_image accepts these; they
    arise from hand-built metadata / loaded archives): the reference
    reads blocks at the UNCOMPRESSED-grid stride regardless of the
    payload's larger grid (compressor4x4_helper.h:296-311) — it neither
    rejects nor crashes."""
    h = w = 16
    img = make_test_image(rng, h, w, 3)
    c, ci = _compress(Format.RGB, h, w, img)
    padded = CompressedImage()
    assert c.pad(ci, 32, 32, padded)
    # Rewrite the metadata to claim a smaller uncompressed extent over the
    # same 8x8-block payload — the mismatched case the validator allows.
    md = padded.get_metadata()
    md.uncompressed_height = h
    md.uncompressed_width = w
    assert c.is_valid_compressed_image(padded)

    down = CompressedImage()
    got = c.downsample(padded, down)
    ref = oracle.downsample("dxtc", Format.RGB, h, w,
                            md.compressed_height, md.compressed_width,
                            0, padded.get_data())
    assert got and ref is not None
    np.testing.assert_array_equal(down.get_data(), ref[0])

    # The chain API likewise accepts such payloads.
    chain = c.downsample_chain(padded)
    assert len(chain) >= 1
    np.testing.assert_array_equal(chain[0].get_data(), ref[0])
