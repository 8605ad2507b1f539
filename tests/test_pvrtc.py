"""PVRTC 2BPP tests: oracle parity, validation rules, decode extension."""

import numpy as np
import pytest

from texcomp import CompressedImage, Format, PvrtcCompressor
from texcomp.codecs import pvrtc as pvrtc_codec
from tests.conftest import make_test_image


def test_zorder_permutation():
    """FromZOrder (pvrtc_compressor.cc:80-86): x from odd bits, y from even."""
    perm = pvrtc_codec.zorder_block_permutation(2, 4)  # nbx=2, nby=4
    # i=0 -> (x=0,y=0) -> 0; i=1 -> (x=0,y=1) -> block 2; i=2 -> (x=1,y=0) -> 1
    assert perm[0] == 0
    assert perm[1] == 2  # y=1, x=0 -> 1*2+0
    assert perm[2] == 1  # y=0, x=1
    assert perm[3] == 3
    assert sorted(perm.tolist()) == list(range(8))


def test_bit_depth_reduction():
    """ApplyBitDepthReduction (pvrtc_compressor.cc:93-106)."""
    f = pvrtc_codec._apply_bit_depth_reduction
    assert int(np.asarray(f(np.int32(0xFF), 5))) == 0xFF
    assert int(np.asarray(f(np.int32(0b10110111), 5))) == 0b10110101
    assert int(np.asarray(f(np.int32(0b11100000), 3))) == 0b11111111
    assert int(np.asarray(f(np.int32(0b10100000), 3))) == 0b10110110


@pytest.mark.parametrize("size", [8, 16, 32, 128])
@pytest.mark.parametrize("kind", ["noise", "opaque", "alpha"])
def test_encode_oracle_parity(size, kind, rng, oracle):
    h = w = size
    if kind == "noise":
        img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    elif kind == "opaque":
        img = make_test_image(rng, h, w, 4)
        img[..., 3] = 255
    else:
        img = make_test_image(rng, h, w, 4)
    ref, _, _ = oracle.compress("pvrtc", Format.RGBA, h, w, 0, img.tobytes())

    c = PvrtcCompressor()
    ci = CompressedImage()
    assert c.compress(Format.RGBA, h, w, 0, img.tobytes(), ci)
    np.testing.assert_array_equal(ci.get_data(), ref)
    assert c.is_valid_compressed_image(ci)
    md = ci.get_metadata()
    assert md.compressed_height == h and md.compressed_width == w


def test_compress_validation(rng):
    """Square power-of-two, no padding (pvrtc_compressor.cc:640-650)."""
    c = PvrtcCompressor()
    img = rng.integers(0, 256, (16, 32, 4), dtype=np.uint8)
    assert not c.compress(Format.RGBA, 16, 32, 0, img.tobytes(), CompressedImage())
    img = rng.integers(0, 256, (24, 24, 4), dtype=np.uint8)
    assert not c.compress(Format.RGBA, 24, 24, 0, img.tobytes(), CompressedImage())
    img = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    assert not c.compress(Format.RGBA, 16, 16, 4, img.tobytes(), CompressedImage())
    assert not c.compress(Format.RGBA, 0, 0, 0, b"", CompressedImage())


def test_unsupported_ops_return_false(rng):
    """All non-compress operations return false (pvrtc_compressor.cc:669-705)."""
    c = PvrtcCompressor()
    img = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    ci = CompressedImage()
    assert c.compress(Format.RGBA, 16, 16, 0, img.tobytes(), ci)
    assert not c.decompress(ci, bytearray())
    assert not c.downsample(ci, CompressedImage())
    assert not c.pad(ci, 32, 32, CompressedImage())
    assert not c.compress_and_pad(Format.RGBA, 16, 16, 32, 32, 0,
                                  img.tobytes(), CompressedImage())
    assert not c.create_solid_image(Format.RGBA, 16, 16,
                                    np.zeros(4, np.uint8), CompressedImage())
    assert not c.copy_subimage(ci, 0, 0, 8, 8, CompressedImage())


def test_compressed_size():
    c = PvrtcCompressor()
    assert c.compute_compressed_data_size(Format.RGBA, 64, 64) == 64 * 64 // 4
    assert c.supports_format(Format.RGBA)
    assert not c.supports_format(Format.RGB)


def test_decode_extension_quality(rng):
    """The decode extension reconstructs a smooth opaque image reasonably
    (the reference offers no decode; this is our extension).

    PVRTC's bilinear upscale wraps around the image edges
    (pvrtc_compressor.cc:196-237), so quality is only meaningful on a
    tiling pattern — a non-tiling gradient legitimately reconstructs badly
    at the borders."""
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(np.sin(xx * 2 * np.pi / w) * 100 + 128),
         (np.sin(yy * 2 * np.pi / h) * 100 + 128),
         (np.sin((xx + yy) * 2 * np.pi / w) * 50 + 128),
         np.full((h, w), 255)], -1
    ).astype(np.uint8)
    c = PvrtcCompressor()
    ci = CompressedImage()
    assert c.compress(Format.RGBA, h, w, 0, img.tobytes(), ci)
    buf = bytearray()
    assert c.decompress_extension(ci, buf)
    dec = np.frombuffer(bytes(buf), np.uint8).reshape(h, w, 4)
    mse = np.mean((dec[..., :3].astype(float) - img[..., :3].astype(float)) ** 2)
    psnr = 10 * np.log10(255**2 / mse)
    # 2bpp PVRTC stores 2 modulation bits for only half the pixels
    # (checkerboard) — ~20-24 dB is the format's ceiling on this content.
    assert psnr > 20, psnr
    assert np.all(dec[..., 3] == 255)


def test_decode_extension_modulation_roundtrip(rng):
    """Stored checkerboard modulation bits survive encode->decode exactly
    (the sharpest faithfulness check available without a reference decoder)."""
    import jax.numpy as jnp

    h = w = 32
    img = make_test_image(rng, h, w, 4)
    im = jnp.asarray(img.astype(np.int32))
    a, b = pvrtc_codec._morph(im)
    a_up = pvrtc_codec._interpolate_upscaled(a, h, w)
    b_up = pvrtc_codec._interpolate_upscaled(b, h, w)
    mod_true = np.asarray(pvrtc_codec._modulate(im, a_up, b_up))
    modes = np.asarray(pvrtc_codec._block_modulation_modes(
        jnp.asarray(mod_true)))

    data = np.asarray(pvrtc_codec.encode_pvrtc_2bpp_device(jnp.asarray(img)))
    d = data.astype(np.uint32)
    mw = d[:, 0] | (d[:, 1] << 8) | (d[:, 2] << 16) | (d[:, 3] << 24)
    perm = pvrtc_codec.zorder_block_permutation(w // 8, h // 4)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    mw = mw[inv].reshape(h // 4, w // 8)

    pos2 = pvrtc_codec._BITPOS_2BPP
    checker = pvrtc_codec._CHECKER
    read = ((mw[:, :, None, None] >> pos2) & 3).transpose(0, 2, 1, 3)
    read = np.asarray(read).reshape(h, w)
    stored = np.tile(checker, (h // 4, w // 8))
    flag = np.tile(((pos2 == 0) | (pos2 == 20)) & checker,
                   (h // 4, w // 8))
    is_2bpp = np.repeat(np.repeat(modes != 0, 4, axis=0), 8, axis=1)
    relevant = stored & ~flag & is_2bpp
    np.testing.assert_array_equal(read[relevant], mod_true[relevant])


@pytest.mark.parametrize("size", [8, 32, 64, 256])
def test_fast_pipeline_parity(size, rng):
    """The gather-free TPU pipeline (ops/pvrtc_fast) produces the same bytes
    as the reference-parity codec pipeline. Size 256 (2048 blocks) takes
    the MXU-tiled Z-order path (_zorder_tiles); the smaller sizes take the
    gather fallback."""
    import jax.numpy as jnp

    from texcomp.ops import pvrtc_fast

    for kind in ("noise", "mixed"):
        if kind == "noise":
            img = rng.integers(0, 256, (size, size, 4), dtype=np.uint8)
        else:
            img = make_test_image(rng, size, size, 4)
        ref = np.asarray(pvrtc_codec.encode_pvrtc_2bpp_device(jnp.asarray(img)))
        out = np.asarray(pvrtc_fast.encode_pvrtc_2bpp_fast(jnp.asarray(img)))
        np.testing.assert_array_equal(out, ref, err_msg=f"{size} {kind}")


@pytest.mark.parametrize("nbx,nby", [(4, 8), (32, 64), (64, 128), (32, 32),
                                     (64, 64), (256, 512)])
def test_zorder_words_matches_gather(nbx, nby, rng):
    """The MXU-tiled Z-order (ops/pvrtc_fast._zorder_words) equals the
    plain permutation gather for 2bpp (nby = 2*nbx) and 4bpp (square)
    grids, covering both the tiled path (>= 1024 blocks) and the
    small-grid fallback."""
    import jax.numpy as jnp

    from texcomp.codecs.pvrtc import zorder_block_permutation
    from texcomp.ops.pvrtc_fast import _zorder_words

    n = nbx * nby
    words = rng.integers(0, 2**32, (2, n), dtype=np.uint32)
    got = np.asarray(_zorder_words(jnp.asarray(words), nbx, nby))
    perm = np.asarray(zorder_block_permutation(nbx, nby))
    np.testing.assert_array_equal(got, words[:, perm])


@pytest.mark.parametrize("size,batch", [(8, 5), (16, 4), (64, 3), (256, 2),
                                        (256, 12), (512, 6)])
def test_batched_pipeline_parity(size, batch, rng):
    """The lane-folded fleet encoder (ops/pvrtc_fast
    encode_pvrtc_2bpp_batched) is byte-identical per image to the
    single-image fast pipeline for every Z-order regime: gather fallback
    (8^2, 16^2), small-grid one-hot matmul (64^2), and the MXU-tiled path
    (256^2). (256, 12) and (512, 6) exercise true (gr>1, gc>1) mosaic
    grids in the folded pack. Content mixes noise with structured
    gradients so the morph, wrap-roll variants, and per-lane
    global-pixel-(0,0) fallback all see distinct per-image data."""
    import jax.numpy as jnp

    from texcomp.ops import pvrtc_fast

    imgs = np.stack(
        [rng.integers(0, 256, (size, size, 4), dtype=np.uint8)
         if i % 2 == 0 else make_test_image(rng, size, size, 4)
         for i in range(batch)])
    out = np.asarray(
        pvrtc_fast.encode_pvrtc_2bpp_batched(jnp.asarray(imgs)))
    # The packed-u32-words entry (the fleet upload form) is identical.
    out_w = np.asarray(pvrtc_fast.encode_pvrtc_2bpp_batched_words(
        jnp.asarray(imgs.view(np.uint32).reshape(imgs.shape[:3]))))
    np.testing.assert_array_equal(out_w, out)
    for i in range(batch):
        ref = np.asarray(
            pvrtc_fast.encode_pvrtc_2bpp_fast(jnp.asarray(imgs[i])))
        np.testing.assert_array_equal(out[i], ref, err_msg=f"image {i}")


class TestPvrtc4bpp:
    """4bpp extension: round-trip quality and format invariants."""

    def test_sizes_and_validation(self, rng):
        from texcomp import Pvrtc4bppCompressor

        c = Pvrtc4bppCompressor()
        assert c.compute_compressed_data_size(Format.RGBA, 64, 64) == 2048
        img = rng.integers(0, 256, (16, 32, 4), dtype=np.uint8)
        assert not c.compress(Format.RGBA, 16, 32, 0, img.tobytes(),
                              CompressedImage())
        img = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
        ci = CompressedImage()
        assert c.compress(Format.RGBA, 16, 16, 0, img.tobytes(), ci)
        assert c.is_valid_compressed_image(ci)
        assert ci.get_data_size() == 16 * 16 // 2

    def test_roundtrip_and_beats_2bpp(self, rng):
        """4bpp (2 mod bits for EVERY pixel + 4x4 palette granularity) must
        reconstruct better than 2bpp on the same content."""
        from texcomp import Pvrtc4bppCompressor

        h = w = 64
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(np.sin(xx * 2 * np.pi / w) * 100 + 128),
             (np.sin(yy * 2 * np.pi / h) * 100 + 128),
             (np.sin((xx + yy) * 2 * np.pi / w) * 50 + 128),
             np.full((h, w), 255)], -1
        ).astype(np.uint8)

        c4 = Pvrtc4bppCompressor()
        ci4 = CompressedImage()
        assert c4.compress(Format.RGBA, h, w, 0, img.tobytes(), ci4)
        buf4 = bytearray()
        assert c4.decompress(ci4, buf4)
        dec4 = np.frombuffer(bytes(buf4), np.uint8).reshape(h, w, 4)
        mse4 = np.mean((dec4[..., :3].astype(float) - img[..., :3]) ** 2)
        psnr4 = 10 * np.log10(255**2 / mse4)

        c2 = PvrtcCompressor()
        ci2 = CompressedImage()
        assert c2.compress(Format.RGBA, h, w, 0, img.tobytes(), ci2)
        buf2 = bytearray()
        assert c2.decompress_extension(ci2, buf2)
        dec2 = np.frombuffer(bytes(buf2), np.uint8).reshape(h, w, 4)
        mse2 = np.mean((dec2[..., :3].astype(float) - img[..., :3]) ** 2)
        psnr2 = 10 * np.log10(255**2 / mse2)

        assert psnr4 > psnr2, (psnr4, psnr2)
        assert psnr4 > 28, psnr4
        assert np.all(dec4[..., 3] == 255)

    def test_solid_roundtrip_exact_alpha(self, rng):
        from texcomp import Pvrtc4bppCompressor

        img = np.full((16, 16, 4), 200, dtype=np.uint8)
        img[..., 3] = 255
        c = Pvrtc4bppCompressor()
        ci = CompressedImage()
        assert c.compress(Format.RGBA, 16, 16, 0, img.tobytes(), ci)
        buf = bytearray()
        assert c.decompress(ci, buf)
        dec = np.frombuffer(bytes(buf), np.uint8).reshape(16, 16, 4)
        assert np.all(dec[..., 3] == 255)
        assert np.abs(dec[..., :3].astype(int) - 200).max() <= 8
