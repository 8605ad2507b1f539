"""PVRTC v1 4-bits-per-pixel RGBA encode/decode (EXTENSION).

The reference implements only the 2BPP variant (pvrtc_compressor.h:16-17);
BASELINE config 4 calls for 4bpp. Same low-frequency-signal-modulation
design (Fenney, "Texture Compression using Low-Frequency Signal
Modulation"): two low-res palette images A/B bilinearly upscaled with
wrap-around, plus per-pixel 2-bit modulation — but with 4x4 blocks, all 16
modulation values stored (no checkerboard), and /16 bilinear weights.

The encoder reuses the reference's 2BPP algorithm shape: GetExtremesFast
5-axis extremes per block (with the same tie-break and reduction rules),
ApplyColorChannelReduction bit-depth preview, early-exit BestModulation,
and the same 16+15+1-bit color word; 64-bit block records in Z-order
(square grids only, so plain Morton order is exact).

Implemented with the gather-free dense patterns of ops/pvrtc_fast on
(16, NB) block planes (the same layout as the DXT kernels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from texcomp.codecs.pvrtc import zorder_block_permutation
from texcomp.ops.pvrtc_fast import (
    _encode_colors,
    _first_max,
    _first_min,
    _modulate_planes,
    _reduce_a,
)

_U32 = jnp.uint32

BLOCK = 4  # 4x4 blocks, 2 bits/pixel modulation + 64-bit record = 4 bpp


def _morph4(planes, p00w):
    """Per-4x4-block extremes -> reduced A/B, mirroring GetExtremesFast
    (pvrtc_compressor.cc:255-329) incl. the all-zero-axis quirk.

    p00w: (1, 1) uint32 — the PACKED global pixel (0, 0) (extracting it
    from the (H, W, 4) uint8 image would force XLA to materialize that
    tensor lane-padded 4->128; see pvrtc_fast._encode_rowmajor_words)."""
    from texcomp.ops.pvrtc_fast import _unpack4

    r, g, b, a = planes
    # >> 8 == // 256 on the nonneg sum (no idiv; see CLAUDE.md playbook).
    lightness = (77 * r + 150 * g + 28 * b) >> 8
    axes = [lightness, r, g, b, a]
    pixel00 = _unpack4(p00w)

    best_diff = None
    best_lo = None
    best_hi = None
    for f in axes:
        lo = _first_min(f, planes)
        hi = _first_max(f, planes, pixel00)
        diff = sum(jnp.abs(h - l) for l, h in zip(lo, hi))
        if best_diff is None:
            best_diff, best_lo, best_hi = diff, lo, hi
        else:
            upd = diff > best_diff
            best_lo = [jnp.where(upd, n, o) for o, n in zip(best_lo, lo)]
            best_hi = [jnp.where(upd, n, o) for o, n in zip(best_hi, hi)]
            best_diff = jnp.where(upd, diff, best_diff)

    swap = sum(best_hi) < sum(best_lo)
    lo = [jnp.where(swap, h, l) for l, h in zip(best_lo, best_hi)]
    hi = [jnp.where(swap, l, h) for l, h in zip(best_lo, best_hi)]
    return _reduce_a(lo, is_b=False), _reduce_a(hi, is_b=True)


def _upscale4(low_ch, nby: int, nbx: int, halo_top=None, halo_bot=None):
    """Bilinear wrap upscale for 4x4 blocks: (1, NB) -> (16, NB).

    For in-block (py, px): left block = bx-1 iff px < 2, top = by-1 iff
    py < 2; weights xw = (px+2) & 3, yw = (py+2) & 3, /16.

    halo_top/halo_bot: (nbx,) rows replacing the y-wrap when the block
    rows are sharded across devices (the previous shard's last row / the
    next shard's first row); None = single-device jnp.roll wrap."""
    low = low_ch.reshape(nby, nbx)
    var = {}
    for dy in (-1, 0, 1):
        if dy == 0:
            ry = low
        elif halo_top is None:
            ry = jnp.roll(low, dy, axis=0)
        elif dy == 1:
            ry = jnp.concatenate([halo_top.reshape(1, nbx), low[:-1]], 0)
        else:
            ry = jnp.concatenate([low[1:], halo_bot.reshape(1, nbx)], 0)
        for dx in (-1, 0, 1):
            v = jnp.roll(ry, dx, axis=1) if dx else ry
            var[(dy, dx)] = v.reshape(1, -1)

    s = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    py = s >> 2
    px = s & 3
    left_prev = px < 2
    top_prev = py < 2
    xw = (px + 2) & 3
    yw = (py + 2) & 3

    def corner2(dy_pair, dx_pair):
        # Nested selects (quadrant masks partition) — see
        # ops/pvrtc_fast._upscale_planes.
        dy_t, dy_b = dy_pair
        dx_l, dx_r = dx_pair
        top = jnp.where(left_prev, var[(dy_t, dx_l)], var[(dy_t, dx_r)])
        bot = jnp.where(left_prev, var[(dy_b, dx_l)], var[(dy_b, dx_r)])
        return jnp.where(top_prev, top, bot)

    c00 = corner2((1, 0), (1, 0))
    c01 = corner2((1, 0), (0, -1))
    c10 = corner2((0, -1), (1, 0))
    c11 = corner2((0, -1), (0, -1))

    wa = (BLOCK - yw) * (BLOCK - xw)
    wb = (BLOCK - yw) * xw
    wc = yw * (BLOCK - xw)
    wd = yw * xw
    # >> 4 == // 16 on the nonneg weighted sum (no idiv; CLAUDE.md).
    return (wa * c00 + wb * c01 + wc * c10 + wd * c11) >> 4


# Early-exit best-of-4 modulation: layout-agnostic, shared with the 2bpp
# pipeline (identical BestModulation semantics on (16, NB) planes here).
_modulate4 = _modulate_planes


def _encode_rowmajor_words4(image: jax.Array, pixel00=None,
                            axis_name: str | None = None) -> jax.Array:
    """Shared 4bpp encode body: (h, W, 4) uint8 -> (2, NB) uint32
    (modulation word, color word) in row-major block order.

    With ``axis_name`` the image's block rows are a shard of a taller
    atlas over that mesh axis: the upscale's y-wrap becomes one-row halo
    exchanges over ICI (jax.lax.ppermute), exactly like the 2bpp path
    (4bpp has no mode decision, so no modulation halo). pixel00: packed
    (1, 1) uint32 GLOBAL image pixel (0, 0), or None to take it from this
    shard (single-image case)."""
    from texcomp.ops.dxt_pallas import _block_transpose_u32
    from texcomp.ops.pvrtc_fast import _pack4, _unpack4

    h, w = image.shape[0], image.shape[1]
    nby, nbx = h // BLOCK, w // BLOCK
    barrier = jax.lax.optimization_barrier

    # Barrier-crossing tensors stay packed uint32 (see pvrtc_fast:
    # barriers materialize, and unpacked planes are 4x the HBM traffic).
    words16 = barrier(_block_transpose_u32(
        jax.lax.bitcast_convert_type(image, jnp.uint32)))
    if pixel00 is None:
        pixel00 = words16[0:1, 0:1]
    a, b = _morph4(_unpack4(words16), pixel00)
    a = barrier(a)
    b = barrier(b)

    none2 = (None, None)
    if axis_name is None:
        a_halo = b_halo = none2
    else:
        n = jax.lax.axis_size(axis_name)
        fwd = [(i, (i + 1) % n) for i in range(n)]  # receive from prev
        bwd = [(i, (i - 1) % n) for i in range(n)]  # receive from next
        aw = _pack4(a).reshape(nby, nbx)
        bw = _pack4(b).reshape(nby, nbx)
        tops = jax.lax.ppermute(jnp.stack([aw[-1], bw[-1]]), axis_name, fwd)
        bots = jax.lax.ppermute(jnp.stack([aw[0], bw[0]]), axis_name, bwd)
        a_halo = (_unpack4(tops[0:1]), _unpack4(bots[0:1]))
        b_halo = (_unpack4(tops[1:2]), _unpack4(bots[1:2]))

    def up(ch4, halo):
        if halo is none2:
            return [_upscale4(c, nby, nbx) for c in ch4]
        ht4, hb4 = halo
        return [_upscale4(c, nby, nbx, halo_top=ht, halo_bot=hb)
                for c, ht, hb in zip(ch4, ht4, hb4)]

    ab_up = barrier((
        _pack4(up(a, a_halo)),
        _pack4(up(b, b_halo)),
    ))
    mod = barrier(_modulate4(
        _unpack4(words16), _unpack4(ab_up[0]), _unpack4(ab_up[1])))

    s = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    mod_words = jnp.bitwise_or.reduce(
        mod.astype(_U32) << (2 * s).astype(_U32), axis=0
    )  # (NB,)
    # mode flag bit 0 of the color word: 0 = standard weights. _encode_colors
    # sets bit 0 = 1 unless modes == 0, so pass modes = 0.
    modes0 = jnp.zeros((1, mod_words.shape[0]), dtype=jnp.int32)
    color_words = _encode_colors(a, b, modes0)[0]
    return jnp.stack([mod_words, color_words])


@jax.jit
def encode_pvrtc_4bpp_device(image: jax.Array) -> jax.Array:
    """(H, W, 4) uint8 (square power-of-two, >= 4) -> (NB, 8) uint8 Z-order
    4bpp records: 32-bit modulation word (2 bits/pixel, pixel (y, x) at bit
    2*(y*4+x)) then the 32-bit color word, both little-endian."""
    # MXU-tiled Z-order + LE bitcast (see ops/pvrtc_fast._zorder_words):
    # element gathers cost ~10 ns each on TPU and would dominate.
    from texcomp.ops.pvrtc_fast import _zorder_payload

    nb = image.shape[0] // BLOCK
    words = _encode_rowmajor_words4(image)
    return _zorder_payload(words, nb, nb)


def _decode_color(word, is_b: bool):
    from texcomp.codecs.pvrtc import _decode_color as dc

    return dc(word, is_b)


@partial(jax.jit, static_argnames=("height", "width"))
def decode_pvrtc_4bpp_device(data: jax.Array, *, height: int,
                             width: int) -> jax.Array:
    """(NB, 8) uint8 4bpp records -> (H, W, 4) uint8."""
    from texcomp.ops.dxt_pallas import _unblock_transpose_u32

    h, w = height, width
    nb = h // BLOCK
    d = data.astype(_U32)
    mod_words = d[:, 0] | (d[:, 1] << 8) | (d[:, 2] << 16) | (d[:, 3] << 24)
    color_words = d[:, 4] | (d[:, 5] << 8) | (d[:, 6] << 16) | (d[:, 7] << 24)

    perm = zorder_block_permutation(nb, nb)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    inv = jnp.asarray(inv)
    mod_words = mod_words[inv][None, :]  # (1, NB)
    color_words = color_words[inv][None, :]

    # _decode_color returns (..., 4); split into channel lists of (1, NB).
    a4 = _decode_color(color_words[0], is_b=False)  # (NB, 4)
    b4 = _decode_color(color_words[0], is_b=True)
    a = [a4[:, c][None, :] for c in range(4)]
    b = [b4[:, c][None, :] for c in range(4)]
    a_up = [_upscale4(c, nb, nb) for c in a]
    b_up = [_upscale4(c, nb, nb) for c in b]

    s = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    mod = ((jnp.broadcast_to(mod_words, (16, mod_words.shape[1]))
            >> (2 * s).astype(_U32)) & _U32(3)).astype(jnp.int32)

    out = []
    for au, bu in zip(a_up, b_up):
        ch = au
        ch = jnp.where(mod == 1, (5 * au + 3 * bu) >> 3, ch)
        ch = jnp.where(mod == 2, (3 * au + 5 * bu) >> 3, ch)
        ch = jnp.where(mod == 3, bu, ch)
        out.append(jnp.clip(ch, 0, 255))
    px = (out[0].astype(_U32) | (out[1].astype(_U32) << 8)
          | (out[2].astype(_U32) << 16) | (out[3].astype(_U32) << 24))
    img = _unblock_transpose_u32(px, h, w)
    return jax.lax.bitcast_convert_type(img, jnp.uint8)
