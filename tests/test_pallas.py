"""Pallas TPU kernel parity vs the (oracle-verified) jnp codec kernels.

Runs the kernels in interpreter mode on CPU; on real TPU the same
comparisons are exercised by bench/verify scripts and the compressor API.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from texcomp.codecs import dxt
from texcomp.ops import dxt_pallas as dp


def _random_blocks(rng, n, c):
    rgb = rng.integers(0, 256, (n, 16, c)).astype(np.int32)
    # constant blocks, near-constant, and extreme alpha
    rgb[5:10] = rgb[5:6, 0:1]
    rgb[10] = 7
    if c == 4:
        rgb[11:14, :, 3] = 0
        rgb[14:17, :, 3] = 255
    return rgb


def _to_words(rgb):
    """(N, 16, C) -> (16, N) packed uint32."""
    w = (rgb[:, :, 0].astype(np.uint32)
         | (rgb[:, :, 1].astype(np.uint32) << 8)
         | (rgb[:, :, 2].astype(np.uint32) << 16))
    if rgb.shape[2] == 4:
        w |= rgb[:, :, 3].astype(np.uint32) << 24
    return jnp.asarray(w.T.copy())


@pytest.mark.parametrize("swap", [False, True])
def test_dxt1_kernel_parity(rng, swap):
    rgb = _random_blocks(rng, 700, 3)
    ref = np.asarray(dxt.encode_dxt1_blocks(jnp.asarray(rgb),
                                            swap_red_and_blue=swap))
    out = np.asarray(
        dp.encode_dxt1_packed(_to_words(rgb), swap=swap, interpret=True)
    ).T
    np.testing.assert_array_equal(out, ref)


def test_dxt1_kernel_always4_parity(rng):
    rgb = _random_blocks(rng, 300, 3)
    ref = np.asarray(dxt.encode_dxt1_blocks(jnp.asarray(rgb),
                                            always_4_color=True))
    out = np.asarray(
        dp.encode_dxt1_packed(_to_words(rgb), always4=True, interpret=True)
    ).T
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("swap", [False, True])
def test_dxt5_kernel_parity(rng, swap):
    rgba = _random_blocks(rng, 700, 4)
    outside = np.zeros(700, dtype=bool)
    outside[33:45] = True
    ref = np.asarray(
        dxt.encode_dxt5_blocks(jnp.asarray(rgba), jnp.asarray(outside),
                               swap_red_and_blue=swap)
    )
    words = np.asarray(_to_words(rgba))
    w17 = np.concatenate([words, outside.astype(np.uint32)[None, :]], axis=0)
    out = np.asarray(
        dp.encode_dxt5_packed(jnp.asarray(w17), swap=swap, interpret=True)
    ).T
    np.testing.assert_array_equal(out, ref)


def test_block_transpose_and_pack(rng):
    """pack_*_image produce scan-order (y*4+x) words in row-major block
    order, matching extract_blocks."""
    h, w = 12, 16
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    words = np.asarray(dp.pack_rgb_image(jnp.asarray(img)))
    blocks = (img.astype(np.uint32)
              .reshape(h // 4, 4, w // 4, 4, 3)
              .transpose(0, 2, 1, 3, 4)
              .reshape(-1, 16, 3))
    expect = (blocks[:, :, 0] | (blocks[:, :, 1] << 8)
              | (blocks[:, :, 2] << 16)).T
    np.testing.assert_array_equal(words, expect)

    img4 = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    words4 = np.asarray(dp.pack_rgba_image(jnp.asarray(img4)))
    blocks4 = (img4.astype(np.uint32)
               .reshape(h // 4, 4, w // 4, 4, 4)
               .transpose(0, 2, 1, 3, 4)
               .reshape(-1, 16, 4))
    expect4 = (blocks4[:, :, 0] | (blocks4[:, :, 1] << 8)
               | (blocks4[:, :, 2] << 16) | (blocks4[:, :, 3] << 24)).T
    np.testing.assert_array_equal(words4, expect4)
    # BGRA pack swaps r/b
    words4s = np.asarray(dp.pack_rgba_image(jnp.asarray(img4), swap=True))
    expect4s = (blocks4[:, :, 2] | (blocks4[:, :, 1] << 8)
                | (blocks4[:, :, 0] << 16) | (blocks4[:, :, 3] << 24)).T
    np.testing.assert_array_equal(words4s, expect4s)


def test_padded_image_pipeline_interpret(rng):
    """dxtc_encode_padded_image == generic extract+encode on ragged sizes."""
    from texcomp.blocks import extract_blocks, full_outside_mask

    h, w = 10, 14
    gh, gw = 16, 24  # compress-and-pad grid
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    outside = full_outside_mask(h, w, gh, gw)
    blocks = extract_blocks(jnp.asarray(img), height=h, width=w,
                            grid_height=gh, grid_width=gw)
    ref = np.asarray(dxt.encode_dxt5_blocks(blocks, jnp.asarray(outside)))

    # interpret-mode variant of the fused pipeline
    padded = np.pad(img, ((0, gh - h), (0, gw - w), (0, 0)), mode="edge")
    words = np.asarray(dp.pack_rgba_image(jnp.asarray(padded)))
    w17 = np.concatenate([words, outside.astype(np.uint32)[None, :]], axis=0)
    out = np.asarray(
        dp.encode_dxt5_packed(jnp.asarray(w17), interpret=True)
    ).T
    np.testing.assert_array_equal(out, ref)


# ---------------------------------------------------------------------------
# Decode + ETC kernels (interpret mode).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("swap", [False, True])
def test_dxt1_decode_kernel_parity(rng, swap):
    data = rng.integers(0, 256, (400, 8), dtype=np.uint8)
    ref = np.asarray(dxt.decode_dxt1_blocks(jnp.asarray(data)))
    if swap:
        ref = ref[:, :, ::-1]
    words = dp.blocks_to_words(jnp.asarray(data), 2)
    px = np.asarray(dp.decode_dxt1_packed(words, swap=swap, interpret=True))
    mine = np.stack([px & 255, (px >> 8) & 255, (px >> 16) & 255],
                    -1).transpose(1, 0, 2)
    np.testing.assert_array_equal(mine, ref)


@pytest.mark.parametrize("swap", [False, True])
def test_dxt5_decode_kernel_parity(rng, swap):
    data = rng.integers(0, 256, (400, 16), dtype=np.uint8)
    ref = np.asarray(dxt.decode_dxt5_blocks(jnp.asarray(data)))
    if swap:
        ref = np.concatenate([ref[:, :, 2::-1], ref[:, :, 3:]], axis=-1)
    words = dp.blocks_to_words(jnp.asarray(data), 4)
    px = np.asarray(dp.decode_dxt5_packed(words, swap=swap, interpret=True))
    mine = np.stack([px & 255, (px >> 8) & 255, (px >> 16) & 255,
                     (px >> 24) & 255], -1).transpose(1, 0, 2)
    np.testing.assert_array_equal(mine, ref)


@pytest.mark.parametrize("strategy", [0, 1, 2, 3])
def test_etc1_encode_kernel_parity(rng, strategy):
    from texcomp.codecs import etc
    from texcomp.ops import etc_pallas as ep

    rgb = _random_blocks(rng, 500, 3)
    # smooth blocks exercise differential mode
    rgb[20:40] = (np.arange(16)[None, :, None] * 3
                  + rng.integers(0, 64, (20, 1, 3))).astype(np.int32)
    ref = np.asarray(etc.encode_etc1_blocks(jnp.asarray(rgb), strategy))
    out = np.asarray(
        ep.encode_etc1_packed(_to_words(rgb), strategy, interpret=True)
    ).T
    np.testing.assert_array_equal(out, ref)


def test_etc1_decode_kernel_parity(rng):
    from texcomp.codecs import etc
    from texcomp.ops import etc_pallas as ep

    data = rng.integers(0, 256, (500, 8), dtype=np.uint8)
    ref = np.asarray(etc.decode_etc1_blocks(jnp.asarray(data)))
    words = dp.blocks_to_words(jnp.asarray(data), 2)
    px = np.asarray(ep.decode_etc1_packed(words, interpret=True))
    mine = np.stack([px & 255, (px >> 8) & 255, (px >> 16) & 255],
                    -1).transpose(1, 0, 2)
    np.testing.assert_array_equal(mine, ref)


def test_transcode_kernel_parity(rng):
    from texcomp.api.transcode import transcode_dxt1_to_etc1_blocks
    from texcomp.ops import etc_pallas as ep

    data = rng.integers(0, 256, (300, 8), dtype=np.uint8)
    ref = np.asarray(transcode_dxt1_to_etc1_blocks(jnp.asarray(data)))
    words = dp.blocks_to_words(jnp.asarray(data), 2)
    out = np.asarray(ep.etc1_words_to_blocks(
        ep.transcode_dxt1_to_etc1_packed(words, interpret=True)))
    np.testing.assert_array_equal(out, ref)


def test_pvrtc_morph_kernel_parity(rng):
    """Pallas morph (interpret mode) == the XLA packed-word morph, which the
    full-pipeline tests hold byte-identical to the C++ reference."""
    from texcomp.ops import pvrtc_fast as pf

    n = 600
    px = rng.integers(0, 2**32, (32, n), dtype=np.uint32)
    # Ties: duplicated pixels within a block exercise first-occurrence picks.
    px[:, 50:80] = px[:1, 50:80]
    px[16:, 100:130] = px[:16, 100:130]
    # All-zero axes: all-black blocks (lightness/r/g/b all zero) and
    # zero-alpha blocks hit the global-pixel-(0,0) fallback.
    px[:, 200:210] = 0
    px[:, 210:220] &= 0x00FFFFFF
    px[:, 220:230] = 0xFF000000
    p00 = np.asarray(rng.integers(0, 2**32, (1, 1), dtype=np.uint32))
    p00wi = jnp.asarray(p00.astype(np.int32))
    words = jnp.asarray(px)
    ref = np.asarray(pf._morph_words(words, p00wi))
    out = np.asarray(pf.morph_packed(words, p00wi, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pvrtc_morph_batched_kernel_parity(rng):
    """morph_packed_batched (per-lane (1, N) p00 row) == _morph_words with
    the same row — the fleet-mosaic path only takes this kernel on TPU
    above 2^20 lanes, so interpret-mode parity here pins its plumbing
    (round-4 advisor finding)."""
    from texcomp.ops import pvrtc_fast as pf

    n = 600
    px = rng.integers(0, 2**32, (32, n), dtype=np.uint32)
    px[:, 50:80] = px[:1, 50:80]
    px[:, 200:210] = 0           # all-zero axes -> per-lane p00 fallback
    px[:, 210:220] &= 0x00FFFFFF
    px[:, 220:230] = 0xFF000000
    p00 = rng.integers(0, 2**32, (1, n), dtype=np.uint32).astype(np.int32)
    words = jnp.asarray(px)
    p00wi = jnp.asarray(p00)
    ref = np.asarray(pf._morph_words(words, p00wi))
    out = np.asarray(pf.morph_packed_batched(words, p00wi, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pvrtc_stage_kernels_parity(rng):
    """Pallas upscale+modulate and modes+pack kernels (interpret mode) ==
    the XLA bodies, which the full-pipeline tests hold byte-identical to
    the C++ reference."""
    from texcomp.ops import pvrtc_fast as pf

    nby, nbx = 8, 64
    n = nby * nbx
    px = rng.integers(0, 2**32, (32, n), dtype=np.uint32)
    px[:, 40:60] = px[:1, 40:60]  # flat blocks -> mode 0 paths
    words = jnp.asarray(px)
    p00wi = jnp.asarray(np.array([[7]], np.int32))
    ab = pf._morph_words(words, p00wi)
    va9 = pf._make_var_words(ab[0:1], nby, nbx)
    vb9 = pf._make_var_words(ab[1:2], nby, nbx)
    ref_mod = np.asarray(pf._upscale_modulate_body(words, va9, vb9))
    out_mod = np.asarray(pf.upscale_modulate_packed(
        words, jnp.concatenate([va9, vb9], axis=0), interpret=True))
    np.testing.assert_array_equal(out_mod, ref_mod)

    mod = jnp.asarray(ref_mod)
    nh_edge, nv_edge = pf._mode_edges(mod, nby, nbx)
    ref_w = np.asarray(pf._modes_pack_colors_body(mod, nh_edge, nv_edge, ab))
    out_w = np.asarray(pf.modes_pack_colors_packed(
        mod, nh_edge, nv_edge, ab, interpret=True))
    np.testing.assert_array_equal(out_w, ref_w)


def test_unblock_transpose_roundtrip(rng):
    h, w = 16, 32
    img = rng.integers(0, 2**32, (h, w), dtype=np.uint32)
    words = dp._block_transpose_u32(jnp.asarray(img))
    back = np.asarray(dp._unblock_transpose_u32(words, h, w))
    np.testing.assert_array_equal(back, img)


def test_multi_tile_grid_parity(rng):
    """Every earlier parity test fits in ONE lane-grid step (n <= 2048 =
    dxt_pallas.LANE_TILE); the production sizes the kernels exist for
    (>= 8192**2 blocks) run many. Exercise >1 grid step + the padded tail
    so the BlockSpec index maps and lane padding are covered."""
    from texcomp.codecs import dxt, etc
    from texcomp.ops import etc_pallas as ep
    from texcomp.ops import pvrtc_fast as pf

    n = dp.LANE_TILE + 600  # 2 grid steps, ragged tail

    rgb = _random_blocks(rng, n, 3)
    ref = np.asarray(dxt.encode_dxt1_blocks(jnp.asarray(rgb)))
    out = np.asarray(
        dp.encode_dxt1_packed(_to_words(rgb), interpret=True)
    ).T
    np.testing.assert_array_equal(out, ref)

    ref_e = np.asarray(etc.encode_etc1_blocks(jnp.asarray(rgb), 0))
    out_e = np.asarray(
        ep.encode_etc1_packed(_to_words(rgb), 0, interpret=True)
    ).T
    np.testing.assert_array_equal(out_e, ref_e)

    px = rng.integers(0, 2**32, (32, n), dtype=np.uint32)
    px[:, 2100:2120] = 0  # all-zero-axis fallback in the second tile
    p00wi = jnp.asarray(np.array([[11]], np.int32))
    words = jnp.asarray(px)
    ref_m = np.asarray(pf._morph_words(words, p00wi))
    out_m = np.asarray(pf.morph_packed(words, p00wi, interpret=True))
    np.testing.assert_array_equal(out_m, ref_m)


def test_etc1_hq_kernel_parity(rng):
    """The HQ best-of-K search kernel (candidates + in-kernel refits +
    ±1 probes, etc_pallas.etc1_hq_search) is byte-identical to the XLA
    HQ path (codecs.etc scan_best/_refit_bases/_neighborhood_qs chain)
    — including solid blocks (const/clamp paths) and quantization-edge
    blocks."""
    from texcomp.codecs import etc

    rgb = _random_blocks(rng, 300, 3)
    ref = np.asarray(etc.encode_etc1_hq_blocks(jnp.asarray(rgb)))
    ker = np.asarray(etc._encode_etc1_hq_blocks_pallas(jnp.asarray(rgb),
                                                       interpret=True))
    np.testing.assert_array_equal(ref, ker)


def test_cluster_topk4_kernel_matches_jnp(rng):
    """The HQ cluster-fit top-4 kernel (interpret mode) produces the same
    quantized endpoint candidates as the jnp integer-exact score + iterated
    argmax route — same scores, same tie-breaks, same payloads."""
    from texcomp import ops as _ops
    from texcomp.codecs import dxt_hq
    from texcomp.ops import dxt_pallas as dp

    rgb = rng.integers(0, 256, (700, 16, 3)).astype(np.int32)
    # Ties on purpose: constant blocks and 2-value blocks.
    rgb[:40] = rgb[:40, :1, :]
    rgb[40:80, 8:] = rgb[40:80, :8]
    rgb_f = jnp.asarray(rgb).astype(jnp.float32)

    want = dxt_hq._cluster_fit_candidates(rgb_f)  # CPU jnp route

    orig_topk4, orig_up = dp.cluster_topk4, _ops.use_pallas
    try:
        _ops.use_pallas = lambda: True
        dp.cluster_topk4 = lambda p72, selt, qtab: orig_topk4(
            p72, selt, qtab, interpret=True)
        got = dxt_hq._cluster_fit_candidates(rgb_f)
    finally:
        _ops.use_pallas = orig_up
        dp.cluster_topk4 = orig_topk4

    for (wc0, wc1), (gc0, gc1) in zip(want, got):
        np.testing.assert_array_equal(np.asarray(wc0), np.asarray(gc0))
        np.testing.assert_array_equal(np.asarray(wc1), np.asarray(gc1))
