"""Fused device mipmap chain (ops/mipmap.py + DxtcCompressor.downsample_chain):
every level must byte-equal repeated Compressor.downsample calls (which are
oracle-verified in tests/test_dxt_ops.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from texcomp import CompressedImage, DxtcCompressor, Format
from texcomp.ops.mipmap import dxtc_mipmap_chain, num_chain_levels
from tests.conftest import make_test_image


def _compress(img, fmt):
    ci = CompressedImage()
    h, w = img.shape[:2]
    assert DxtcCompressor().compress(fmt, h, w, 0, img.tobytes(), ci)
    return ci


def _repeated_chain(ci, n):
    out = []
    comp = DxtcCompressor()
    cur = ci
    for _ in range(n):
        nxt = CompressedImage()
        assert comp.downsample(cur, nxt)
        out.append(nxt)
        cur = nxt
    return out


def test_num_chain_levels():
    assert num_chain_levels(1024, 1024) == 8  # down to a 4x4 level
    assert num_chain_levels(64, 32) == 3      # stops when w reaches 4
    assert num_chain_levels(8, 8) == 1
    assert num_chain_levels(4, 4) == 0
    assert num_chain_levels(12, 12) == 0      # odd block count


@pytest.mark.parametrize("fmt", [Format.RGB, Format.RGBA])
def test_fused_chain_matches_repeated_downsample(fmt, rng):
    c = 3 if fmt == Format.RGB else 4
    img = make_test_image(rng, 64, 64, c)
    ci = _compress(img, fmt)
    n = num_chain_levels(64, 64)  # 4: 32, 16, 8, 4
    assert n == 4
    bs = 8 if fmt == Format.RGB else 16
    data = jnp.asarray(np.asarray(ci.get_data()).reshape(-1, bs))
    fused = dxtc_mipmap_chain(data, height=64, width=64,
                              is_dxt1=(fmt == Format.RGB), levels=n,
                              interpret=True)
    expect = _repeated_chain(ci, n)
    for lvl, (got, want) in enumerate(zip(fused, expect)):
        np.testing.assert_array_equal(
            np.asarray(got).reshape(-1), np.asarray(want.get_data()),
            err_msg=f"level {lvl + 1}")


@pytest.mark.parametrize("fmt", [Format.RGB, Format.RGBA])
def test_downsample_chain_api(fmt, rng):
    """API chain equals repeated downsample all the way to 1x1 (the CPU
    backend exercises the per-level path; on TPU the fused prefix is
    covered by the kernel-parity test above)."""
    c = 3 if fmt == Format.RGB else 4
    img = make_test_image(rng, 32, 16, c)
    ci = _compress(img, fmt)
    chain = DxtcCompressor().downsample_chain(ci)
    sizes = [(m.get_metadata().uncompressed_height,
              m.get_metadata().uncompressed_width) for m in chain]
    assert sizes == [(16, 8), (8, 4), (4, 2), (2, 1), (1, 1)]
    expect = _repeated_chain(ci, len(chain))
    for lvl, (got, want) in enumerate(zip(chain, expect)):
        np.testing.assert_array_equal(
            np.asarray(got.get_data()), np.asarray(want.get_data()),
            err_msg=f"level {lvl + 1}")


def test_downsample_chain_levels_arg(rng):
    img = make_test_image(rng, 32, 32, 3)
    ci = _compress(img, Format.RGB)
    chain = DxtcCompressor().downsample_chain(ci, levels=2)
    assert len(chain) == 2
    assert chain[0].get_metadata().uncompressed_height == 16
    assert chain[1].get_metadata().uncompressed_height == 8


def test_downsample_chain_invalid():
    assert DxtcCompressor().downsample_chain(CompressedImage()) == []


@pytest.mark.parametrize("strategy", [0, 2, 3])
def test_etc1_fused_chain_matches_repeated_downsample(strategy, rng):
    from texcomp import CompressionStrategy, EtcCompressor
    from texcomp.ops.mipmap import mipmap_chain

    img = make_test_image(rng, 32, 32, 3)
    comp = EtcCompressor(CompressionStrategy(strategy))
    ci = CompressedImage()
    assert comp.compress(Format.RGB, 32, 32, 0, img.tobytes(), ci)
    n = num_chain_levels(32, 32)  # 3: 16, 8, 4
    data = jnp.asarray(np.asarray(ci.get_data()).reshape(-1, 8))
    fused = mipmap_chain(data, height=32, width=32, codec="etc1",
                         levels=n, strategy=strategy, interpret=True)

    expect = []
    cur = ci
    for _ in range(n):
        nxt = CompressedImage()
        assert comp.downsample(cur, nxt)
        expect.append(nxt)
        cur = nxt
    for lvl, (got, want) in enumerate(zip(fused, expect)):
        np.testing.assert_array_equal(
            np.asarray(got).reshape(-1), np.asarray(want.get_data()),
            err_msg=f"strategy {strategy} level {lvl + 1}")


def test_etc1_downsample_chain_api(rng):
    from texcomp import EtcCompressor

    img = make_test_image(rng, 32, 16, 3)
    comp = EtcCompressor()
    ci = CompressedImage()
    assert comp.compress(Format.RGB, 32, 16, 0, img.tobytes(), ci)
    chain = comp.downsample_chain(ci)
    sizes = [(m.get_metadata().uncompressed_height,
              m.get_metadata().uncompressed_width) for m in chain]
    assert sizes == [(16, 8), (8, 4), (4, 2), (2, 1), (1, 1)]
    cur = ci
    for lvl, got in enumerate(chain):
        nxt = CompressedImage()
        assert comp.downsample(cur, nxt)
        np.testing.assert_array_equal(
            np.asarray(got.get_data()), np.asarray(nxt.get_data()),
            err_msg=f"level {lvl + 1}")
        cur = nxt


@pytest.mark.parametrize("codec", ["dxt1", "dxt5", "etc1"])
def test_fused_downsample_kernel_byte_exact(codec, rng):
    """The fused decode->average->encode kernels (one per mip level) must
    byte-match the unfused decode-image -> truncating-average -> encode
    pipeline they replace."""
    from texcomp.ops import dxt_pallas as dp
    from texcomp.ops import etc_pallas as ep

    h = w = 64
    c = 3 if codec in ("dxt1", "etc1") else 4
    img = jnp.asarray(make_test_image(rng, h, w, c).reshape(h, w, c))
    if codec == "dxt1":
        data = dp.dxt1_encode_image(img, interpret=True)
        dec = dp.dxt1_decode_image(data, height=h, width=w,
                                   interpret=True)[:, :, :3]
    elif codec == "dxt5":
        data = dp.dxt5_encode_image(img, interpret=True)
        dec = dp.dxt5_decode_image(data, height=h, width=w, interpret=True)
    else:
        data = ep.etc1_encode_image(img, interpret=True)
        dec = ep.etc1_decode_image(data, height=h, width=w,
                                   interpret=True)[:, :, :3]
    avg = ((np.asarray(dec).astype(np.int32)
            .reshape(h // 2, 2, w // 2, 2, dec.shape[-1]).sum(axis=(1, 3)))
           >> 2).astype(np.uint8)
    if codec == "dxt1":
        want = np.asarray(dp.dxt1_encode_image(jnp.asarray(avg),
                                               interpret=True))
        wdst = dp.dxtc_downsample_encode_words(
            dp.blocks_to_words(data, 2), nby=h // 4, nbx=w // 4,
            is_dxt1=True, interpret=True)
    elif codec == "dxt5":
        want = np.asarray(dp.dxt5_encode_image(jnp.asarray(avg),
                                               interpret=True))
        wdst = dp.dxtc_downsample_encode_words(
            dp.blocks_to_words(data, 4), nby=h // 4, nbx=w // 4,
            is_dxt1=False, interpret=True)
    else:
        want = np.asarray(ep.etc1_encode_image(jnp.asarray(avg),
                                               interpret=True))
        wdst = ep.etc1_downsample_encode_words(
            dp.blocks_to_words(data, 2), nby=h // 4, nbx=w // 4,
            interpret=True)
    got = np.asarray(dp.words_to_blocks(wdst))
    np.testing.assert_array_equal(got, want)
