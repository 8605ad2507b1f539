"""ETC1 codec tests: bit-level decode, strategies, ops, transcoder — with
oracle parity."""

import numpy as np
import pytest

from texcomp import (
    CompressedImage,
    CompressionStrategy,
    DxtcCompressor,
    EtcCompressor,
    Format,
    transcode_dxt1_to_etc1,
)
from texcomp.codecs import etc as etc_codec
from tests.conftest import make_test_image

STRATEGIES = list(CompressionStrategy)
SIZES = [(4, 4), (16, 16), (37, 53), (8, 64), (1, 1), (2, 7)]


def _block_bytes_from_words(hi, lo):
    return np.array(
        [(hi >> 24) & 0xFF, (hi >> 16) & 0xFF, (hi >> 8) & 0xFF, hi & 0xFF,
         (lo >> 24) & 0xFF, (lo >> 16) & 0xFF, (lo >> 8) & 0xFF, lo & 0xFF],
        dtype=np.uint8,
    )


def test_decode_individual_mode_handbuilt():
    """Hand-built block per the layout at etc_compressor.cc:41-69: the
    EtcCompressorTest.DecoderBits ghost test (etc_compressor.cc:223-224)."""
    # diff=0, flip=0; color1 = 444 (0xF, 0x0, 0x8); color2 = (0x1, 0x2, 0x3)
    hi = 0
    hi |= 0xF << 28 | 0x0 << 20 | 0x8 << 12  # base color 1 r/g/b
    hi |= 0x1 << 24 | 0x2 << 16 | 0x3 << 8  # base color 2 r/g/b
    hi |= 0b011 << 5  # codeword 1 = 3
    hi |= 0b001 << 2  # codeword 2 = 1
    lo = 0  # all pixel indices 0
    out = np.asarray(
        etc_codec.decode_etc1_blocks(_block_bytes_from_words(hi, lo)[None])
    )[0].reshape(4, 4, 3)
    # Pixel (0,0): first subblock (x<2), base (0xFF,0x00,0x88), modifier
    # codebook[3][0]=13.
    np.testing.assert_array_equal(out[0, 0], [255, 13, 0x88 + 13])
    # Pixel (0,3): second subblock, base (0x11,0x22,0x33), codeword 1 -> +5.
    np.testing.assert_array_equal(out[0, 3], [0x11 + 5, 0x22 + 5, 0x33 + 5])


def test_decode_differential_mode_handbuilt():
    # diff=1, flip=1; base 555 = (16, 8, 4); delta = (-1, 3, -4)
    hi = 2 | 1
    hi |= 16 << 27 | 8 << 19 | 4 << 11
    hi |= (7 & 0x7) << 24 | (3 & 0x7) << 16 | (4 & 0x7) << 8  # -1, 3, -4
    # codewords 0; pixel (3,0) index = 2 -> ETC position p = 0*4+3 = 3
    lo = (1 << (3 + 16))
    out = np.asarray(
        etc_codec.decode_etc1_blocks(_block_bytes_from_words(hi, lo)[None])
    )[0].reshape(4, 4, 3)
    base1 = [(16 << 3) | (16 >> 2), (8 << 3) | (8 >> 2), (4 << 3) | (4 >> 2)]
    # flip=1: pixel (0,0) in top subblock, modifier codebook[0][0] = 2.
    np.testing.assert_array_equal(out[0, 0], [b + 2 for b in base1])
    # pixel (3,0): bottom subblock, base2 = extend5(15, 11, 0), index 2 -> -2.
    base2 = [(15 << 3) | (15 >> 2), (11 << 3) | (11 >> 2), 0]
    np.testing.assert_array_equal(out[3, 0], [max(0, b - 2) for b in base2])


def test_set_compression_strategy_runtime_switch(rng, oracle):
    """The reference's only runtime knob (etc_compressor.h:71-76): one
    instance re-targeted mid-stream must match the oracle per strategy."""
    img = make_test_image(rng, 16, 16, 3)
    c = EtcCompressor()
    assert c.get_compression_strategy() == CompressionStrategy.SMALLER_ERROR
    for strategy in CompressionStrategy:
        c.set_compression_strategy(strategy)
        assert c.get_compression_strategy() == strategy
        ci = CompressedImage()
        assert c.compress(Format.RGB, 16, 16, 0, img.tobytes(), ci)
        ref, _, _ = oracle.compress("etc", 0, 16, 16, 0, img.tobytes(),
                                    strategy=int(strategy))
        np.testing.assert_array_equal(ci.get_data(), ref,
                                      err_msg=strategy.name)


def test_etc_supports_rgb_only():
    c = EtcCompressor()
    assert c.supports_format(Format.RGB)
    assert not c.supports_format(Format.RGBA)
    assert not c.supports_format(Format.BGR)
    assert c.compute_compressed_data_size(Format.RGBA, 16, 16) == 0
    assert not c.compress(Format.RGBA, 8, 8, 0, b"\0" * 256, CompressedImage())


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize("size", SIZES)
def test_encode_decode_oracle_parity(size, strategy, rng, oracle):
    h, w = size
    img = make_test_image(rng, h, w, 3)
    ref, ch, cw = oracle.compress("etc", Format.RGB, h, w, 0, img.tobytes(),
                                  strategy=int(strategy))
    c = EtcCompressor(strategy)
    ci = CompressedImage()
    assert c.compress(Format.RGB, h, w, 0, img.tobytes(), ci)
    np.testing.assert_array_equal(ci.get_data(), ref, err_msg="encode bytes")

    refdec = oracle.decompress("etc", Format.RGB, h, w, ch, cw, 0, ref, 3)
    buf = bytearray()
    assert c.decompress(ci, buf)
    assert bytes(buf) == refdec.tobytes()


@pytest.mark.parametrize("strategy",
                         [CompressionStrategy.SMALLER_ERROR,
                          CompressionStrategy.HEURISTIC])
def test_etc_ops_oracle_parity(strategy, rng, oracle):
    h, w = 16, 24
    img = make_test_image(rng, h, w, 3)
    c = EtcCompressor(strategy)
    ci = CompressedImage()
    assert c.compress(Format.RGB, h, w, 0, img.tobytes(), ci)

    # Pad
    padded = CompressedImage()
    assert c.pad(ci, 24, 32, padded)
    ref = oracle.pad("etc", Format.RGB, h, w, h, w, 0, ci.get_data(), 24, 32,
                     strategy=int(strategy))
    np.testing.assert_array_equal(padded.get_data(), ref[0], err_msg="pad")

    # Downsample
    down = CompressedImage()
    assert c.downsample(ci, down)
    ref = oracle.downsample("etc", Format.RGB, h, w, h, w, 0, ci.get_data(),
                            strategy=int(strategy))
    np.testing.assert_array_equal(down.get_data(), ref[0], err_msg="downsample")

    # Subimage
    sub = CompressedImage()
    assert c.copy_subimage(ci, 4, 8, 8, 12, sub)
    ref = oracle.copy_subimage("etc", Format.RGB, h, w, h, w, 0, ci.get_data(),
                               4, 8, 8, 12, strategy=int(strategy))
    np.testing.assert_array_equal(sub.get_data(), ref[0], err_msg="subimage")

    # CompressAndPad
    cap = CompressedImage()
    assert c.compress_and_pad(Format.RGB, h, w, 32, 32, 0, img.tobytes(), cap)
    ref, _, _ = oracle.compress_and_pad("etc", Format.RGB, h, w, 32, 32, 0,
                                        img.tobytes(), strategy=int(strategy))
    np.testing.assert_array_equal(cap.get_data(), ref, err_msg="compress+pad")


def test_etc_create_solid_oracle_parity(oracle):
    c = EtcCompressor()
    for color in [(0, 0, 0), (255, 255, 255), (13, 77, 200), (1, 2, 3)]:
        ci = CompressedImage()
        assert c.create_solid_image(Format.RGB, 12, 8,
                                    np.array(color, dtype=np.uint8), ci)
        ref = oracle.create_solid("etc", Format.RGB, 12, 8,
                                  np.array(color, dtype=np.uint8))
        np.testing.assert_array_equal(ci.get_data(), ref[0], err_msg=str(color))


def test_transcode_dxt1_to_etc1_oracle_parity(rng, oracle):
    h, w = 20, 16
    img = make_test_image(rng, h, w, 3)
    dc = DxtcCompressor()
    ci = CompressedImage()
    assert dc.compress(Format.RGB, h, w, 0, img.tobytes(), ci)

    ref = oracle.transcode_dxt1_to_etc1(ci.get_data().copy())
    transcode_dxt1_to_etc1(ci)
    np.testing.assert_array_equal(ci.get_data(), ref)

    # The transcoded payload decodes as valid ETC1.
    md = ci.get_metadata()
    pixels = np.asarray(
        etc_codec.decode_etc1_blocks(ci.get_data().reshape(-1, 8))
    )
    assert pixels.shape == ((md.compressed_height // 4) *
                            (md.compressed_width // 4), 16, 3)


def test_etc_roundtrip_quality(rng):
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 4 % 256, yy * 4 % 256, (xx + yy) * 2 % 256],
                   axis=-1).astype(np.uint8)
    c = EtcCompressor()
    ci = CompressedImage()
    assert c.compress(Format.RGB, h, w, 0, img.tobytes(), ci)
    buf = bytearray()
    assert c.decompress(ci, buf)
    dec = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, 3)
    psnr = 10 * np.log10(
        255**2 / np.mean((dec.astype(float) - img.astype(float)) ** 2)
    )
    assert psnr > 25, psnr


def test_etc_hq_never_worse_and_better(rng):
    """quality='high' (EXTENSION): never worse than the reference encoder,
    strictly better on a meaningful fraction of blocks."""
    import jax.numpy as jnp

    rgb = rng.integers(0, 256, (600, 16, 3)).astype(np.int32)
    rgb[100:120] = (np.arange(16)[None, :, None] * 3
                    + rng.integers(0, 64, (20, 1, 3))).astype(np.int32)
    ref = np.asarray(etc_codec.encode_etc1_blocks(jnp.asarray(rgb), 2))
    hq = np.asarray(etc_codec.encode_etc1_hq_blocks(jnp.asarray(rgb)))
    dref = np.asarray(etc_codec.decode_etc1_blocks(jnp.asarray(ref)))
    dhq = np.asarray(etc_codec.decode_etc1_blocks(jnp.asarray(hq)))
    eref = np.sum((dref - rgb) ** 2, axis=(1, 2))
    ehq = np.sum((dhq - rgb) ** 2, axis=(1, 2))
    assert np.all(ehq <= eref)
    assert np.sum(ehq < eref) > 50

    # API plumbing: HQ payloads decode under the plain decoder.
    img = make_test_image(rng, 16, 16, 3)
    c = EtcCompressor(quality="high")
    ci = CompressedImage()
    assert c.compress(Format.RGB, 16, 16, 0, img.tobytes(), ci)
    assert EtcCompressor().is_valid_compressed_image(ci)
    buf = bytearray()
    assert EtcCompressor().decompress(ci, buf)

    with pytest.raises(ValueError):
        EtcCompressor(quality="ultra")


def test_transcode_hq_never_worse(rng):
    """transcode quality='high' (EXTENSION): decoded error vs the DXT1
    pixels is never worse than the reference heuristic transcode, and the
    reference path is untouched by the knob."""
    import jax.numpy as jnp

    from texcomp.api.transcode import (
        transcode_dxt1_to_etc1_blocks,
        transcode_dxt1_to_etc1_blocks_hq,
    )
    from texcomp.codecs import dxt as dxt_codec

    h, w = 36, 28
    img = make_test_image(rng, h, w, 3)
    dc = DxtcCompressor()
    ci = CompressedImage()
    assert dc.compress(Format.RGB, h, w, 0, img.tobytes(), ci)
    blocks = jnp.asarray(ci.get_data().reshape(-1, 8))

    pixels = np.asarray(dxt_codec.decode_dxt1_blocks(blocks))
    ref = np.asarray(transcode_dxt1_to_etc1_blocks(blocks))
    hq = np.asarray(transcode_dxt1_to_etc1_blocks_hq(blocks))
    dref = np.asarray(etc_codec.decode_etc1_blocks(jnp.asarray(ref)))
    dhq = np.asarray(etc_codec.decode_etc1_blocks(jnp.asarray(hq)))
    eref = np.sum((dref - pixels) ** 2, axis=(1, 2))
    ehq = np.sum((dhq - pixels) ** 2, axis=(1, 2))
    assert np.all(ehq <= eref)
    assert np.sum(ehq < eref) > 0

    # In-place API: quality='high' rewrites the payload with the HQ blocks.
    transcode_dxt1_to_etc1(ci, quality="high")
    np.testing.assert_array_equal(ci.get_data().reshape(-1, 8), hq)

    with pytest.raises(ValueError):
        transcode_dxt1_to_etc1(ci, quality="ultra")


def test_etc_hq_image_entry_matches_blocks_route(rng):
    """encode_etc1_hq_image (packed-word block extraction) is
    byte-identical to encode_etc1_hq_blocks(image_to_blocks(im))."""
    import jax.numpy as jnp

    from texcomp.blocks import image_to_blocks

    img = make_test_image(rng, 64, 48, 3)
    want = np.asarray(etc_codec.encode_etc1_hq_blocks(
        image_to_blocks(jnp.asarray(img))))
    got = np.asarray(etc_codec.encode_etc1_hq_image(jnp.asarray(img)))
    np.testing.assert_array_equal(want, got)
