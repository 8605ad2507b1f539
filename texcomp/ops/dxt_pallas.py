"""Pallas TPU kernels for DXT1/DXT5 encode.

Data layout (the key to speed-of-light on TPU):

  * Pixels are packed one-per-uint32 (r | g<<8 | b<<16 [| a<<24]) so the
    image -> block-batch rearrangement is a 32-bit transpose that XLA runs
    at memory bandwidth (~0.2 ms for 4096^2). The 8-bit variant of the same
    transpose is ~100x slower on the VPU — never move bytes, move words.
  * Blocks land as a (16, N) uint32 tensor: pixels on sublanes (block scan
    order y*4+x), blocks on lanes. Every per-block reduction is a sublane
    reduction; every color op is a full-width VPU op; channels are
    unpacked in-VMEM with shifts.
  * The constant-color LUT (dxtc_const_color_table.cc) is applied as a
    one-hot matmul on the (otherwise idle) MXU — exact, since bf16
    represents integers <= 255 exactly and accumulation is f32.

Bit-exact with texcomp.codecs.dxt (which is bit-exact with the C++
reference); tested in tests/test_pallas.py, including interpret mode on CPU.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from texcomp.core.constants import DXTC_CONST_COLOR_TABLE

LANE_TILE = 2048  # blocks per grid step

_U32 = jnp.uint32


def _ext5(v):
    return (v << 3) | (v >> 2)


def _ext6(v):
    return (v << 2) | (v >> 4)


def _q8(v, bits):
    max_val = (1 << bits) - 1
    i = v * max_val + 128
    return (i + (i >> 8)) >> 8


def _q565(r, g, b):
    return _q8(r, 5), _q8(g, 6), _q8(b, 5)


def _pack16(r5, g6, b5):
    return (r5 << 11) | (g6 << 5) | b5


def _lum(r, g, b):
    return 4 * r + 8 * g + b


def _diff_lum_err(c0, c1):
    d = _lum(jnp.abs(c0[0] - c1[0]), jnp.abs(c0[1] - c1[1]),
             jnp.abs(c0[2] - c1[2]))
    return d * d


@lru_cache(maxsize=None)
def _div_magic(d: int, xmax: int):
    """Exact (m, k) with x // d == (x * m) >> k for all 0 <= x <= xmax,
    x * m < 2^31. Mosaic/XLA do not strength-reduce integer division by
    a constant (CLAUDE.md playbook), and an idiv inside a hot kernel is
    ~10x the cost of the whole surrounding stage — verified brute-force
    here instead."""
    x = np.arange(xmax + 1, dtype=np.int64)
    want = x // d
    for k in range(8, 31):
        m = -(-(1 << k) // d)  # ceil
        if xmax * m < 2**31 and ((x * m) >> k == want).all():
            return m, k
    raise AssertionError(f"no int32 magic for /{d} over [0, {xmax}]")


def _combine(s0, s1, v0, v1):
    # Non-negative 8-bit operands everywhere on this path: trunc == floor,
    # and the numerator is bounded by 255 * (s0 + s1).
    num = s0 * v0 + s1 * v1
    d = s0 + s1
    if d & (d - 1) == 0:
        return num >> d.bit_length() - 1
    m, k = _div_magic(d, 255 * d)
    return (num * m) >> k


def _first_extreme(lum, extreme, channels):
    """Channel values of the first pixel (sublane axis = scan order) whose
    luminance equals ``extreme``. lum: (16, T); extreme: (1, T)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, lum.shape, 0)
    first = jnp.min(jnp.where(lum == extreme, idx, 16), axis=0, keepdims=True)
    hit = idx == first
    return [jnp.sum(jnp.where(hit, ch, 0), axis=0, keepdims=True)
            for ch in channels]


def _lut_columns(lut_t_ref, vals):
    """All 8 LUT columns for a (1, T) channel-value vector via one-hot
    matmul: (8, 256) @ (256, T) -> (8, T) int32, exact."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (256, vals.shape[1]), 0)
    onehot = (iota == vals).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        lut_t_ref[:], onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.int32)  # (8, T)


def _best_const_colors_kernel(lut_t_ref, target, always4: bool):
    """GetBestDxtcConstColors (dxtc_const_color_table.cc:322-392) on
    (1, T) lanes. target: 3-tuple of (1, T). Returns (which, c0_16, c1_16)."""
    tr, tg, tb = target
    sr, sg, sb = _q565(tr, tg, tb)
    single16 = _pack16(sr, sg, sb)
    min_err = _diff_lum_err(target, (_ext5(sr), _ext6(sg), _ext5(sb)))
    which = jnp.zeros_like(tr)
    c0 = single16
    c1 = single16

    lr = _lut_columns(lut_t_ref, tr)  # (8, T)
    lg = _lut_columns(lut_t_ref, tg)
    lb = _lut_columns(lut_t_ref, tb)
    row = lambda t, i: t[i][None, :]  # (1, T)

    if not always4:
        h0 = (row(lr, 2), row(lg, 6), row(lb, 2))
        h1 = (row(lr, 3), row(lg, 7), row(lb, 3))
        mid = (_combine(1, 1, _ext5(h0[0]), _ext5(h1[0])),
               _combine(1, 1, _ext6(h0[1]), _ext6(h1[1])),
               _combine(1, 1, _ext5(h0[2]), _ext5(h1[2])))
        err = _diff_lum_err(target, mid)
        upd = err < min_err
        h0_16 = _pack16(*h0)
        h1_16 = _pack16(*h1)
        which = jnp.where(upd, 2, which)
        c0 = jnp.where(upd, jnp.minimum(h0_16, h1_16), c0)
        c1 = jnp.where(upd, jnp.maximum(h0_16, h1_16), c1)
        min_err = jnp.where(upd, err, min_err)

    t0 = (row(lr, 0), row(lg, 4), row(lb, 0))
    t1 = (row(lr, 1), row(lg, 5), row(lb, 1))
    third = (_combine(2, 1, _ext5(t0[0]), _ext5(t1[0])),
             _combine(2, 1, _ext6(t0[1]), _ext6(t1[1])),
             _combine(2, 1, _ext5(t0[2]), _ext5(t1[2])))
    err = _diff_lum_err(target, third)
    upd = err < min_err
    t0_16 = _pack16(*t0)
    t1_16 = _pack16(*t1)
    gt = t0_16 > t1_16
    which = jnp.where(upd, jnp.where(gt, 2, 3), which)
    c0 = jnp.where(upd, jnp.where(gt, t0_16, t1_16), c0)
    c1 = jnp.where(upd, jnp.where(gt, t1_16, t0_16), c1)
    return which, c0, c1


def _dxt1_general(r, g, b):
    """The always-on half of the DXT1 encode on (16, T) planes: min/max
    luminance endpoints + 4-palette nearest indices. Returns
    (is_const, blo, c0, c1, rows) — c0/c1/rows valid where ~is_const."""
    lum = _lum(r, g, b)
    lo_l = jnp.min(lum, axis=0, keepdims=True)
    hi_l = jnp.max(lum, axis=0, keepdims=True)
    blo = _first_extreme(lum, lo_l, (r, g, b))
    bhi = _first_extreme(lum, hi_l, (r, g, b))

    qlo = _q565(*blo)
    qhi = _q565(*bhi)
    lo16 = _pack16(*qlo)
    hi16 = _pack16(*qhi)
    is_const = lo16 == hi16

    # Order endpoints, 4-palette nearest by squared luminance.
    do_swap = lo16 < hi16
    b0 = [jnp.where(do_swap, h, l) for l, h in zip(blo, bhi)]
    b1 = [jnp.where(do_swap, l, h) for l, h in zip(blo, bhi)]
    g_c0 = jnp.maximum(lo16, hi16)
    g_c1 = jnp.minimum(lo16, hi16)
    t2 = [_combine(2, 1, a, c) for a, c in zip(b0, b1)]
    t3 = [_combine(1, 2, a, c) for a, c in zip(b0, b1)]
    pal_lum = [_lum(*c) for c in (b0, b1, t2, t3)]  # (1, T) x 4

    d = pal_lum[0] - lum
    best = d * d
    which = jnp.zeros_like(lum)
    for i in (1, 2, 3):
        d = pal_lum[i] - lum
        d = d * d
        better = d < best
        which = jnp.where(better, i, which)
        best = jnp.where(better, d, best)

    rows = []
    for y in range(4):
        rows.append(which[4 * y][None, :]
                    | (which[4 * y + 1][None, :] << 2)
                    | (which[4 * y + 2][None, :] << 4)
                    | (which[4 * y + 3][None, :] << 6))
    return is_const, blo, g_c0, g_c1, rows


def _dxt1_const_merge(lut_t_ref, is_const, blo, c0, c1, rows,
                      always4: bool, swap: bool):
    """The constant-color half (GetBestDxtcConstColors), merged over the
    general result where is_const. Only called when some lane needs it —
    the caller predicates on jnp.any(is_const) (pl.when), which skips
    ~45% of the kernel for photographic/noise content where quantized
    endpoint collisions are rare."""
    # Double-swap back for BGR (see codecs/dxt.py).
    tgt = (blo[2], blo[1], blo[0]) if swap else tuple(blo)
    c_which, c_c0, c_c1 = _best_const_colors_kernel(lut_t_ref, tgt, always4)
    c_row = c_which * 0x55
    c0 = jnp.where(is_const, c_c0, c0)
    c1 = jnp.where(is_const, c_c1, c1)
    rows = [jnp.where(is_const, c_row, row) for row in rows]
    return c0, c1, rows


def _unpack_channels(words, n: int):
    """(S, T) uint32 packed pixels -> n int32 channel planes."""
    w = words.astype(jnp.int32)
    out = [w & 255, (w >> 8) & 255, (w >> 16) & 255]
    if n == 4:
        out.append((w >> 24) & 255)
    return out


def _dxt1_kernel(lut_t_ref, px_ref, out_ref, *, always4, swap):
    # Emits the block as TWO little-endian uint32 words (color pair,
    # index rows) instead of 8 uint8 sublane rows: downstream
    # (words -> per-block bytes) layout moves then run at 32 bit, where
    # the equivalent 8-bit relayouts are ~100x slower (CLAUDE.md).
    r, g, b = _unpack_channels(px_ref[:], 3)
    is_const, blo, c0, c1, rows = _dxt1_general(r, g, b)
    out_ref[:] = _dxt1_words_out(c0, c1, rows)

    # The const-color LUT path runs only when some block in this tile has
    # colliding quantized endpoints (bit-exact: the merge overwrites the
    # general words exactly where is_const).
    @pl.when(jnp.any(is_const))
    def _const_path():
        mc0, mc1, mrows = _dxt1_const_merge(
            lut_t_ref, is_const, blo, c0, c1, rows, always4, swap)
        out_ref[:] = _dxt1_words_out(mc0, mc1, mrows)


def _alpha_codes(a):
    """DXT5 alpha: base alphas + per-pixel 3-bit codes on (16, T) planes.

    Implements ComputeBaseAlphas + ComputeAlphaBits
    (dxtc_compressor.cc:374-479). has_one_pixel handling is the caller's.
    """
    num_t = jnp.sum((a == 0).astype(jnp.int32), axis=0, keepdims=True)
    num_o = jnp.sum((a == 255).astype(jnp.int32), axis=0, keepdims=True)
    mid = (a > 0) & (a < 255)
    low = jnp.min(jnp.where(mid, a, 255), axis=0, keepdims=True)
    high = jnp.max(jnp.where(mid, a, 0), axis=0, keepdims=True)
    degenerate = low > high
    low = jnp.where(degenerate, 0, low)
    high = jnp.where(degenerate, 255, high)

    explicit = (num_t > 1) | (num_o > 1)
    low_adj = jnp.where(num_t > 0, 0, low)
    high_adj = jnp.where(num_o > 0, 255, high)
    a0 = jnp.where(explicit, low, high_adj)
    a1 = jnp.where(explicit, high, low_adj)

    use_explicit = a0 <= a1
    ramp = [a0, a1]
    for s0, s1 in ((4, 1), (3, 2), (2, 3), (1, 4)):
        e = _combine(s0, s1, a0, a1)
        i = _combine(s0 + 2, s1, a0, a1)
        ramp.append(jnp.where(use_explicit, e, i))
    ramp.append(jnp.where(use_explicit, jnp.zeros_like(a0),
                          _combine(2, 5, a0, a1)))
    ramp.append(jnp.where(use_explicit, jnp.full_like(a0, 255),
                          _combine(1, 6, a0, a1)))

    d = a - ramp[0]
    best = d * d
    code = jnp.zeros_like(a)
    for i in range(1, 8):
        d = a - ramp[i]
        d = d * d
        better = d < best
        code = jnp.where(better, i, code)
        best = jnp.where(better, d, best)
    return a0, a1, code


def _dxt5_kernel(lut_t_ref, px_ref, out_ref, *, swap):
    # px_ref: (17, T) uint32; sublane 16 carries the has_one_pixel flag.
    words = px_ref[:]
    r, g, b, a17 = _unpack_channels(words, 4)
    a = a17[:16]
    outside = words[16][None, :] != 0

    a0, a1, code = _alpha_codes(a)
    a00 = a[0][None, :]
    a0 = jnp.where(outside, a00, a0)
    a1 = jnp.where(outside, a00, a1)
    code = jnp.where(outside, 0, code)

    half0 = jnp.zeros_like(a0)
    half1 = jnp.zeros_like(a0)
    for i in range(8):
        half0 = half0 | (code[i][None, :] << (3 * i))
        half1 = half1 | (code[8 + i][None, :] << (3 * i))

    is_const, blo, c0, c1, rows = _dxt1_general(r[:16], g[:16], b[:16])

    def emit(c0, c1, rows):
        # FOUR little-endian uint32 words (alpha pair + low codes, high
        # codes, color pair, index rows); see _dxt1_kernel on why words.
        w0 = (a0 | (a1 << 8) | ((half0 & 0xFFFF) << 16)).astype(_U32)
        w1 = ((half0 >> 16) | (half1 << 8)).astype(_U32)
        return jnp.concatenate([w0, w1, _dxt1_words_out(c0, c1, rows)],
                               axis=0)

    out_ref[:] = emit(c0, c1, rows)

    @pl.when(jnp.any(is_const))
    def _const_path():
        mc0, mc1, mrows = _dxt1_const_merge(
            lut_t_ref, is_const, blo, c0, c1, rows, always4=True, swap=swap)
        out_ref[:] = emit(mc0, mc1, mrows)


def _lut_t_bf16() -> jax.Array:
    return jnp.asarray(DXTC_CONST_COLOR_TABLE.T.astype(np.float32),
                       dtype=jnp.bfloat16)  # (8, 256)


def _pad_lanes(x, tile):
    n = x.shape[1]
    pad = (-n) % tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


def _tile_for(n: int) -> int:
    return min(LANE_TILE, max(128, 1 << (n - 1).bit_length()))


@partial(jax.jit, static_argnames=("always4", "swap", "interpret"))
def encode_dxt1_words(words: jax.Array, always4: bool = False,
                      swap: bool = False,
                      interpret: bool = False) -> jax.Array:
    """(16, N) uint32 packed pixels (r|g<<8|b<<16) -> (2, N) uint32 DXT1
    block words (little-endian: word 0 = c0|c1<<16, word 1 = index rows)."""
    n = words.shape[1]
    tile = _tile_for(n)
    words = _pad_lanes(words, tile)
    np_ = words.shape[1]
    out = pl.pallas_call(
        partial(_dxt1_kernel, always4=always4, swap=swap),
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, np_), _U32),
        interpret=interpret,
    )(_lut_t_bf16(), words)
    return out[:, :n]


def _byte_rows(block_words: jax.Array) -> jax.Array:
    """(W, N) uint32 LE block words -> (4W, N) uint8 byte sublane rows
    (row k = byte k of the block). Pure shifts — NOT a relayout."""
    rows = [((block_words[k // 4][None] >> (8 * (k % 4))) & 255)
            for k in range(4 * block_words.shape[0])]
    return jnp.concatenate(rows, axis=0).astype(jnp.uint8)


def encode_dxt1_packed(words: jax.Array, always4: bool = False,
                       swap: bool = False,
                       interpret: bool = False) -> jax.Array:
    """(16, N) uint32 packed pixels (r|g<<8|b<<16) -> (8, N) uint8 DXT1
    block bytes (byte-row view of encode_dxt1_words)."""
    return _byte_rows(encode_dxt1_words(words, always4=always4, swap=swap,
                                        interpret=interpret))


@partial(jax.jit, static_argnames=("swap", "interpret"))
def encode_dxt5_words(words17: jax.Array, swap: bool = False,
                      interpret: bool = False) -> jax.Array:
    """(17, N) uint32 packed RGBA pixels + has_one_pixel flag row ->
    (4, N) uint32 DXT5 block words (little-endian)."""
    n = words17.shape[1]
    tile = _tile_for(n)
    words17 = _pad_lanes(words17, tile)
    np_ = words17.shape[1]
    out = pl.pallas_call(
        partial(_dxt5_kernel, swap=swap),
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((17, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, np_), _U32),
        interpret=interpret,
    )(_lut_t_bf16(), words17)
    return out[:, :n]


@partial(jax.jit, static_argnames=("swap", "interpret"))
def encode_dxt5_packed(words17: jax.Array, swap: bool = False,
                       interpret: bool = False) -> jax.Array:
    """(17, N) uint32 packed RGBA pixels + has_one_pixel flag row ->
    (16, N) uint8 DXT5 block bytes (byte-row view of encode_dxt5_words)."""
    return _byte_rows(encode_dxt5_words(words17, swap=swap,
                                        interpret=interpret))


# ---------------------------------------------------------------------------
# Image-level wrappers (u32 packing + 32-bit block transpose, fused in jit).
# ---------------------------------------------------------------------------


def _block_transpose_u32(words: jax.Array) -> jax.Array:
    """(H, W) uint32 -> (16, H/4*W/4): pixel (y, x) of block b on sublane
    y*4+x, block on lane (row-major).

    Done in two stages — a major-dims transpose (minor dim untouched) then
    a minor-pair swap — which XLA lowers ~10x faster than the equivalent
    single 4D transpose (measured 1.2 ms vs 11.7 ms end-to-end on v5e for
    4096^2)."""
    h, w = words.shape
    t = words.reshape(h // 4, 4, w).transpose(1, 0, 2)  # (y, by, W)
    t = t.reshape(4, h // 4, w // 4, 4).transpose(0, 3, 1, 2)  # (y, x, by, bx)
    return t.reshape(16, -1)


def pack_rgb_image(image: jax.Array, swap: bool = False) -> jax.Array:
    """(H, W, 3) uint8 -> (16, N) uint32 packed pixel planes. ``swap``
    reverses r/b for BGR input (so packed channel 0 is red)."""
    c0, c1, c2 = (2, 1, 0) if swap else (0, 1, 2)
    px = (image[:, :, c0].astype(jnp.uint32)
          | (image[:, :, c1].astype(jnp.uint32) << 8)
          | (image[:, :, c2].astype(jnp.uint32) << 16))
    return _block_transpose_u32(px)


def pack_rgba_image(image: jax.Array, swap: bool = False) -> jax.Array:
    """(H, W, 4) uint8 -> (16, N) uint32; bitcast (free) for RGBA,
    explicit byte pack for BGRA."""
    if swap:
        px = (image[:, :, 2].astype(jnp.uint32)
              | (image[:, :, 1].astype(jnp.uint32) << 8)
              | (image[:, :, 0].astype(jnp.uint32) << 16)
              | (image[:, :, 3].astype(jnp.uint32) << 24))
    else:
        px = jax.lax.bitcast_convert_type(image, jnp.uint32)  # (H, W)
    return _block_transpose_u32(px)


@partial(jax.jit, static_argnames=("grid_height", "grid_width", "swap",
                                   "is_dxt1"))
def dxtc_encode_padded_image(image: jax.Array, outside: jax.Array,
                             grid_height: int, grid_width: int,
                             swap: bool, is_dxt1: bool) -> jax.Array:
    """Full compress pipeline for the API path: edge-pad the valid image to
    the block grid (Pixel4x4 replication, pixel4x4.cc:23-59), pack, encode.

    image: (h, w, C) uint8 (valid extent); outside: (N,) bool has_one_pixel
    flags. Returns (N, block_size) uint8.
    """
    h, w = image.shape[0], image.shape[1]
    image = jnp.pad(
        image, ((0, grid_height - h), (0, grid_width - w), (0, 0)),
        mode="edge",
    )
    if is_dxt1:
        words = pack_rgb_image(image, swap)
        return words_to_blocks(encode_dxt1_words(words, swap=swap))
    words = pack_rgba_image(image, swap)
    flag = outside.astype(jnp.uint32)[None, :]
    return words_to_blocks(encode_dxt5_words(
        jnp.concatenate([words, flag], axis=0), swap=swap))


# ---------------------------------------------------------------------------
# Decode kernels.
# ---------------------------------------------------------------------------


def _unblock_transpose_u32(words: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of _block_transpose_u32: (16, N) uint32 -> (H, W) uint32,
    again as two fast stages."""
    t = words.reshape(4, 4, h // 4, w // 4).transpose(0, 2, 3, 1)  # (y,by,bx,x)
    t = t.reshape(4, h // 4, w)
    return t.transpose(1, 0, 2).reshape(h, w)


def _decode_palette(c0_16, c1_16, always4: bool, swap: bool):
    """DecodeColors (dxtc_compressor.cc:167-192): 4 palette entries per
    channel from packed 565 endpoints, each (1, T). Returns list of 3
    channels, each a 4-list."""
    def unpack(c):
        return _ext5(c >> 11), _ext6((c >> 5) & 63), _ext5(c & 31)

    p0 = unpack(c0_16)
    p1 = unpack(c1_16)
    if swap:
        p0 = (p0[2], p0[1], p0[0])
        p1 = (p1[2], p1[1], p1[0])
    equal = c0_16 == c1_16
    if always4:
        four = jnp.ones_like(equal)
    else:
        four = c0_16 > c1_16

    pal = []
    for ch0, ch1 in zip(p0, p1):
        p2 = jnp.where(equal, ch1,
                       jnp.where(four, _combine(2, 1, ch0, ch1),
                                 _combine(1, 1, ch0, ch1)))
        p3 = jnp.where(equal, ch1,
                       jnp.where(four, _combine(1, 2, ch0, ch1),
                                 jnp.zeros_like(ch0)))
        pal.append([ch0, ch1, p2, p3])
    return pal


def _select4(code, vals):
    out = jnp.broadcast_to(vals[0], code.shape)
    out = jnp.where(code == 1, vals[1], out)
    out = jnp.where(code == 2, vals[2], out)
    return jnp.where(code == 3, vals[3], out)


def _dxt1_color_codes(bits_word, shape):
    """Per-pixel 2-bit codes from the 32-bit index word; pixel (y, x) at
    bits (8y + 2x) (dxtc_compressor.cc:230-236). shape = (16, T)."""
    p = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    sh = 8 * (p >> 2) + 2 * (p & 3)  # shifts: iota div is a real idiv
    return ((jnp.broadcast_to(bits_word, shape).astype(jnp.int32) >> sh) & 3)


def _dxt1_decode_channels(w0, w1, always4, swap):
    """(1, T) LE block words -> (r, g, b) decoded (16, T) channel planes."""
    c0_16 = w0 & 0xFFFF
    c1_16 = (w0 >> 16) & 0xFFFF
    pal = _decode_palette(c0_16, c1_16, always4, swap)
    code = _dxt1_color_codes(w1, (16, w0.shape[1]))
    return (_select4(code, pal[0]), _select4(code, pal[1]),
            _select4(code, pal[2]))


def _dxt1_decode_kernel(w_ref, out_ref, *, always4, swap):
    w = w_ref[:].astype(jnp.int32)  # (2, T): LE words of the 8-byte block
    r, g, b = _dxt1_decode_channels(w[0][None, :], w[1][None, :],
                                    always4, swap)
    px = (r.astype(_U32) | (g.astype(_U32) << 8) | (b.astype(_U32) << 16))
    out_ref[:] = px


def _dxt5_decode_channels(w0, w1, w2, w3, swap):
    """(1, T) LE block words -> (r, g, b, alpha) decoded (16, T) planes."""
    t = w0.shape[1]
    a0 = w0 & 255
    a1 = (w0 >> 8) & 255
    half0 = ((w0 >> 16) & 0xFFFF) | ((w1 & 255) << 16)
    half1 = (w1 >> 8) & 0xFFFFFF

    # Alpha ramp (DecodeAlphaValues, dxtc_compressor.cc:195-217).
    interp_mode = a0 > a1
    ramp = [a0, a1]
    for s0, s1 in ((6, 1), (5, 2), (4, 3), (3, 4)):
        i = _combine(s0, s1, a0, a1)
        e = _combine(s0 - 2, s1, a0, a1)
        ramp.append(jnp.where(interp_mode, i, e))
    ramp.append(jnp.where(interp_mode, _combine(2, 5, a0, a1),
                          jnp.zeros_like(a0)))
    ramp.append(jnp.where(interp_mode, _combine(1, 6, a0, a1),
                          jnp.full_like(a0, 255)))

    p = jax.lax.broadcasted_iota(jnp.int32, (16, t), 0)
    sh = 3 * (p & 7)
    half = jnp.where(p < 8, jnp.broadcast_to(half0, (16, t)),
                     jnp.broadcast_to(half1, (16, t)))
    acode = (half >> sh) & 7
    alpha = jnp.broadcast_to(ramp[0], (16, t))
    for i in range(1, 8):
        alpha = jnp.where(acode == i, ramp[i], alpha)

    c0_16 = w2 & 0xFFFF
    c1_16 = (w2 >> 16) & 0xFFFF
    pal = _decode_palette(c0_16, c1_16, always4=True, swap=swap)
    code = _dxt1_color_codes(w3, (16, t))
    return (_select4(code, pal[0]), _select4(code, pal[1]),
            _select4(code, pal[2]), alpha)


def _dxt5_decode_kernel(w_ref, out_ref, *, swap):
    w = w_ref[:].astype(jnp.int32)  # (4, T) LE words
    r, g, b, alpha = _dxt5_decode_channels(
        w[0][None, :], w[1][None, :], w[2][None, :], w[3][None, :], swap)
    px = (r.astype(_U32) | (g.astype(_U32) << 8) | (b.astype(_U32) << 16)
          | (alpha.astype(_U32) << 24))
    out_ref[:] = px


@partial(jax.jit, static_argnames=("always4", "swap", "interpret"))
def decode_dxt1_packed(words: jax.Array, always4: bool = False,
                       swap: bool = False,
                       interpret: bool = False) -> jax.Array:
    """(2, N) uint32 little-endian block words -> (16, N) uint32 packed
    pixels (r|g<<8|b<<16)."""
    n = words.shape[1]
    tile = _tile_for(n)
    words = _pad_lanes(words, tile)
    np_ = words.shape[1]
    out = pl.pallas_call(
        partial(_dxt1_decode_kernel, always4=always4, swap=swap),
        grid=(np_ // tile,),
        in_specs=[pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, np_), jnp.uint32),
        interpret=interpret,
    )(words)
    return out[:, :n]


@partial(jax.jit, static_argnames=("swap", "interpret"))
def decode_dxt5_packed(words: jax.Array, swap: bool = False,
                       interpret: bool = False) -> jax.Array:
    """(4, N) uint32 little-endian block words -> (16, N) uint32 packed
    RGBA pixels."""
    n = words.shape[1]
    tile = _tile_for(n)
    words = _pad_lanes(words, tile)
    np_ = words.shape[1]
    out = pl.pallas_call(
        partial(_dxt5_decode_kernel, swap=swap),
        grid=(np_ // tile,),
        in_specs=[pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, np_), jnp.uint32),
        interpret=interpret,
    )(words)
    return out[:, :n]


def blocks_to_words(data: jax.Array, words_per_block: int) -> jax.Array:
    """(N, 4*wpb) uint8 block bytes -> (wpb, N) uint32 LE words."""
    n = data.shape[0]
    w = jax.lax.bitcast_convert_type(
        data.reshape(n, words_per_block, 4), jnp.uint32
    )  # (N, wpb)
    return w.T


@partial(jax.jit, static_argnames=("height", "width", "swap", "interpret"))
def dxt1_decode_image(data: jax.Array, *, height: int, width: int,
                      swap: bool = False,
                      interpret: bool = False) -> jax.Array:
    """(N, 8) uint8 DXT1 blocks -> (H, W, 4) uint8 RGBX image (4th channel
    zero; byte order BGR for swap=True), H, W the full block-grid extent."""
    px = decode_dxt1_packed(blocks_to_words(data, 2), swap=swap,
                            interpret=interpret)
    img = _unblock_transpose_u32(px, height, width)
    return jax.lax.bitcast_convert_type(img, jnp.uint8)


@partial(jax.jit, static_argnames=("height", "width", "swap", "interpret"))
def dxt5_decode_image(data: jax.Array, *, height: int, width: int,
                      swap: bool = False,
                      interpret: bool = False) -> jax.Array:
    """(N, 16) uint8 DXT5 blocks -> (H, W, 4) uint8 RGBA (or BGRA) image."""
    px = decode_dxt5_packed(blocks_to_words(data, 4), swap=swap,
                            interpret=interpret)
    img = _unblock_transpose_u32(px, height, width)
    return jax.lax.bitcast_convert_type(img, jnp.uint8)


@partial(jax.jit, static_argnames=("interpret",))
def dxt1_encode_image(image: jax.Array, interpret: bool = False) -> jax.Array:
    """(H, W, 3) uint8 (H, W multiples of 4) -> (N, 8) uint8 DXT1 blocks."""
    words = pack_rgb_image(image)
    return words_to_blocks(encode_dxt1_words(words, interpret=interpret))


@partial(jax.jit, static_argnames=("interpret",))
def dxt5_encode_image(image: jax.Array, interpret: bool = False) -> jax.Array:
    """(H, W, 4) uint8 -> (N, 16) uint8 DXT5 blocks (all blocks inside)."""
    words = pack_rgba_image(image)
    flag = jnp.zeros((1, words.shape[1]), dtype=jnp.uint32)
    return words_to_blocks(encode_dxt5_words(
        jnp.concatenate([words, flag], axis=0), interpret=interpret))


# ---------------------------------------------------------------------------
# Fused downsample+encode: one kernel per mip level (decode 2x2 source
# blocks -> truncating 2x2 average -> encode the destination block, all in
# VMEM). Replaces the chain's separate decode kernel + XLA average + encode
# kernel per level — and, because levels chain through LE uint32 block
# words, the blocks->image and image->blocks transposes between levels
# vanish entirely (they existed only to produce the intermediate image).
# Bit-identical to decode_*_image -> sum//4 -> *_encode_image (tested).
# ---------------------------------------------------------------------------


def _p4_matrix(perm=None):
    """(16, 64) bf16 average-and-regroup matrix, built from iotas (Mosaic
    forbids captured array constants). Row p (destination pixel p = 4i+j)
    holds 0.25 at the four source rows 16*g + s of the stacked group
    planes, where g = 2*(i//2) + (j//2) is the source block of the 2x2
    group and s ranges over the 2x2 source pixels of quarter
    (qy, qx) = (i%2, j%2). The f32-accumulated matmul then yields the
    EXACT sum/4 (operands are <=255 ints, exact in bf16), and the int32
    cast truncates — identical to ComputeAveragePixel2x2's nonneg
    sum // 4 (color_util.h:335-380).

    ``perm`` (an optional 16-entry static row permutation) emits the
    destination planes directly in a permuted pixel order — e.g. ETC1's
    _PERM_F subblock grouping — for free inside the same matmul."""
    row = jax.lax.broadcasted_iota(jnp.int32, (16, 64), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (16, 64), 1)
    if perm is not None:
        mapped = jnp.zeros_like(row)
        for k in range(16):
            mapped = jnp.where(row == k, int(perm[k]), mapped)
        row = mapped
    i, j = row >> 2, row & 3
    g = 2 * (i >> 1) + (j >> 1)
    qy, qx = i & 1, j & 1
    d = (col & 15) - (8 * qy + 2 * qx)
    hit = ((col >> 4) == g) & ((d == 0) | (d == 1) | (d == 4) | (d == 5))
    return jnp.where(hit, 0.25, 0.0).astype(jnp.bfloat16)


def _avg_regroup(group_chans, perm=None):
    """[group][channel] (16, T) decoded planes of the 2x2 source-block
    group -> [channel] (16, T) truncating-averaged destination planes,
    via one MXU matmul per channel. ``perm`` permutes the output rows
    (see _p4_matrix)."""
    p4 = _p4_matrix(perm)
    nch = len(group_chans[0])
    out = []
    for ch in range(nch):
        stacked = jnp.concatenate(
            [group_chans[g][ch] for g in range(4)], axis=0)  # (64, T)
        s = jax.lax.dot_general(
            p4, stacked.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out.append(s.astype(jnp.int32))
    return out


def _dxt1_words_out(c0, c1, rows):
    w0 = (c0 | (c1 << 16)).astype(_U32)
    w1 = (rows[0] | (rows[1] << 8) | (rows[2] << 16)
          | (rows[3] << 24)).astype(_U32)
    return jnp.concatenate([w0, w1], axis=0)


def _dxt1_down_kernel(lut_t_ref, w_ref, out_ref):
    w = w_ref[:].astype(jnp.int32)  # (8, T): words of the 4 source blocks
    chans = [_dxt1_decode_channels(w[2 * g][None, :], w[2 * g + 1][None, :],
                                   always4=False, swap=False)
             for g in range(4)]
    r, g, b = _avg_regroup(chans)
    is_const, blo, c0, c1, rows = _dxt1_general(r, g, b)
    out_ref[:] = _dxt1_words_out(c0, c1, rows)

    @pl.when(jnp.any(is_const))
    def _const_path():
        mc0, mc1, mrows = _dxt1_const_merge(
            lut_t_ref, is_const, blo, c0, c1, rows, always4=False, swap=False)
        out_ref[:] = _dxt1_words_out(mc0, mc1, mrows)


def _dxt5_down_kernel(lut_t_ref, w_ref, out_ref):
    w = w_ref[:].astype(jnp.int32)  # (16, T): words of the 4 source blocks
    chans = [_dxt5_decode_channels(w[4 * g][None, :], w[4 * g + 1][None, :],
                                   w[4 * g + 2][None, :], w[4 * g + 3][None, :],
                                   swap=False)
             for g in range(4)]
    r, g, b, a = _avg_regroup(chans)

    a0, a1, code = _alpha_codes(a)
    half0 = jnp.zeros_like(a0)
    half1 = jnp.zeros_like(a0)
    for i in range(8):
        half0 = half0 | (code[i][None, :] << (3 * i))
        half1 = half1 | (code[8 + i][None, :] << (3 * i))

    is_const, blo, c0, c1, rows = _dxt1_general(r, g, b)

    def emit(c0, c1, rows):
        w0 = (a0 | (a1 << 8) | ((half0 & 0xFFFF) << 16)).astype(_U32)
        w1 = ((half0 >> 16) | (half1 << 8)).astype(_U32)
        return jnp.concatenate([w0, w1, _dxt1_words_out(c0, c1, rows)],
                               axis=0)

    out_ref[:] = emit(c0, c1, rows)

    @pl.when(jnp.any(is_const))
    def _const_path():
        mc0, mc1, mrows = _dxt1_const_merge(
            lut_t_ref, is_const, blo, c0, c1, rows, always4=True, swap=False)
        out_ref[:] = emit(mc0, mc1, mrows)


@partial(jax.jit, static_argnames=("nby", "nbx", "is_dxt1", "interpret"))
def dxtc_downsample_encode_words(words: jax.Array, *, nby: int, nbx: int,
                                 is_dxt1: bool,
                                 interpret: bool = False) -> jax.Array:
    """(wpb, N_src) uint32 LE block words on an (nby, nbx) source block
    grid (both even) -> (wpb, N_src/4) words of the 2x downsampled level.

    The source words are pre-permuted so destination block d's four
    source blocks sit at sublanes [g*wpb, (g+1)*wpb) of lane d — a pure
    32-bit major-dims transpose — then one kernel performs the whole
    decode -> truncating average -> encode level."""
    wpb = 2 if is_dxt1 else 4
    grouped = (words.reshape(wpb, nby // 2, 2, nbx // 2, 2)
               .transpose(2, 4, 0, 1, 3).reshape(4 * wpb, -1))
    n = grouped.shape[1]
    tile = _tile_for(n)
    grouped = _pad_lanes(grouped, tile)
    np_ = grouped.shape[1]
    kernel = _dxt1_down_kernel if is_dxt1 else _dxt5_down_kernel
    out = pl.pallas_call(
        kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * wpb, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpb, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wpb, np_), jnp.uint32),
        interpret=interpret,
    )(_lut_t_bf16(), grouped)
    return out[:, :n]


def words_to_blocks(words: jax.Array) -> jax.Array:
    """(wpb, N) uint32 LE words -> (N, 4*wpb) uint8 block bytes (the
    inverse of blocks_to_words; the transpose is 32-bit, the bitcast
    free)."""
    w = words.T  # (N, wpb)
    return jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(w.shape[0], -1)


# ---------------------------------------------------------------------------
# HQ cluster-fit top-4 selection kernel.
#
# The XLA scoring of the 969 contiguous partitions materializes several
# barrier-pinned (N, 969) f32 HBM planes (~11 ms of the 16.7 ms HQ encode
# at 1024^2, tools/profile_hq_stages.py "cur +score"); here every score
# tile lives in VMEM. Per grid tile the 969 partitions are walked in 8
# static chunks of 128 (partition order preserved = tie-break order):
#   uc_c = sel_chunk @ P_c           exact-int via hi/lo-byte bf16 dots
#   A    = sum_c uc_c^2              int32 (<= 4.5e8, exact)
#   B    = sum_c pt_c * uc_c         int32 (<= 1.5e8, exact)
#   score = (quu*A + qut*B) + qtt*ptt + bias     f32, fixed op tree
# then a strict-> insertion network keeps the global top-4 (value + the
# pick payload u0,u1,u2,alpha,beta,delta) in registers. The byte-exact
# jnp twin is codecs.dxt_hq._cluster_fit_chunk: identical integer
# A/B/ptt, identical f32 tree (pinned there with optimization_barrier
# against XLA's fma contraction; Mosaic lowers mul and add literally).
# ---------------------------------------------------------------------------

_CF_NEG = -3.4e38  # below any real partition score; pad-row bias


def cf_score(a_i, b_i, ptt_i, quu_h, quu_l, qut_h, qut_l, qtt_h, qtt_l,
             bias=None):
    """Contraction-immune cluster-fit score, shared op tree for the
    Pallas kernel and the jnp twin (codecs.dxt_hq). a_i/b_i/ptt_i are
    exact int32; constants arrive bf16 hi/lo-split. Every product
    multiplies two <= 8-bit-mantissa values (exactly representable in
    f32), so fma contraction cannot change a bit on any backend; the
    add tree is fixed by this expression."""
    def split(v):
        vf = v.astype(jnp.float32)
        vh = vf.astype(jnp.bfloat16).astype(jnp.float32)
        vl = (vf - vh).astype(jnp.bfloat16).astype(jnp.float32)
        return vh, vl

    def term(qh, ql, v):
        vh, vl = split(v)
        return (qh * vh + qh * vl) + ql * vh

    s = ((term(quu_h, quu_l, a_i) + term(qut_h, qut_l, b_i))
         + term(qtt_h, qtt_l, ptt_i))
    return s if bias is None else s + bias


def _cf_topk_kernel(p72_ref, selt_ref, qtab_ref, out_ref, *, n_chunks):
    p = p72_ref[:].astype(jnp.float32)  # (72, T): 3 x 24-row P planes
    pc = [p[0:24], p[24:48], p[48:72]]
    # hi/lo byte split: P values are integer-valued <= 4080; bf16 holds
    # integers <= 256 exactly, so each dot is exact and the f32 recombine
    # (<= 12240 < 2^24) too.
    hi = [jnp.floor(c * (1.0 / 256.0)) for c in pc]
    lo = [c - 256.0 * h for c, h in zip(pc, hi)]
    hi = [h.astype(jnp.bfloat16) for h in hi]
    lo = [l.astype(jnp.bfloat16) for l in lo]
    pti = [pc[c][16:17].astype(jnp.int32) for c in range(3)]  # (1, T)
    ptt = pti[0] * pti[0] + pti[1] * pti[1] + pti[2] * pti[2]  # int32 exact
    pttf = ptt.astype(jnp.float32)

    t = p.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, t), 0)
    # Top-4 slots: value + payload (u0, u1, u2, alpha, beta, delta).
    slots = [[jnp.full((1, t), _CF_NEG, jnp.float32)] +
             [jnp.zeros((1, t), jnp.float32) for _ in range(6)]
             for _ in range(4)]

    for chunk in range(n_chunks):
        sel = selt_ref[pl.ds(128 * chunk, 128), :].astype(jnp.bfloat16)
        qc = qtab_ref[pl.ds(128 * chunk, 128), :]  # (128, 8) f32
        ucf = []
        for c in range(3):
            dh = jax.lax.dot_general(
                sel, hi[c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dl = jax.lax.dot_general(
                sel, lo[c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ucf.append(dh * 256.0 + dl)  # (128, T) exact ints
        uci = [u.astype(jnp.int32) for u in ucf]
        a_i = uci[0] * uci[0] + uci[1] * uci[1] + uci[2] * uci[2]
        b_i = pti[0] * uci[0] + pti[1] * uci[1] + pti[2] * uci[2]
        # Contraction-immune score (see cf_score): each hi+lo factor
        # carries ~2^-16 relative accuracy, so the ranking perturbation
        # vs the exact score is ~3e-5 — and the exact downstream
        # re-scoring keeps the encode never-worse regardless.
        score = cf_score(a_i, b_i, ptt, qc[:, 0:1], qc[:, 1:2],
                         qc[:, 2:3], qc[:, 3:4], qc[:, 4:5], qc[:, 5:6],
                         bias=qc[:, 6:7])

        for _ in range(4):
            m = jnp.max(score, axis=0, keepdims=True)  # (1, T)
            r = jnp.min(jnp.where(score == m, rows, 128), axis=0,
                        keepdims=True)  # first row achieving the max
            pick = rows == r  # (128, T) one-hot rows
            pickf = pick.astype(jnp.float32)
            payload = [m]
            for c in range(3):
                payload.append(jnp.sum(jnp.where(pick, ucf[c], 0.0),
                                       axis=0, keepdims=True))
            for col in (8, 9, 10):  # alpha, beta, delta
                payload.append(jnp.sum(pickf * qc[:, col:col + 1],
                                       axis=0, keepdims=True))
            score = jnp.where(pick, _CF_NEG, score)

            # Shift-insert into the sorted slots: strict > displaces, so
            # ties keep the earlier (lower partition index) candidate —
            # global first-occurrence argmax semantics, matching the jnp
            # iterated-argmax picks.
            pos = None
            for s in range(4):
                ge = (payload[0] <= slots[s][0]).astype(jnp.int32)
                pos = ge if pos is None else pos + ge
            new_slots = []
            for s in range(4):
                take = pos == s
                shift = pos < s
                new_slots.append([
                    jnp.where(take, payload[f],
                              jnp.where(shift, slots[s - 1][f], slots[s][f]))
                    for f in range(7)])
            slots = new_slots

    out_ref[:] = jnp.concatenate(
        [slots[s][f] for s in range(4) for f in range(1, 7)], axis=0)


@partial(jax.jit, static_argnames=("interpret",))
def cluster_topk4(p72: jax.Array, selt: jax.Array, qtab: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Top-4 cluster-fit partitions per block, with pick payloads.

    p72: (72, N) f32 — rows [24c + r] = channel c's descending-projection
    prefix sum P[r] (r in 0..16; rows 17-23 zero). selt: (P4, 24) f32 —
    row p = partition p's prefix-selection vector (cols 17-23 zero); P4 a
    multiple of 128, pad rows all-zero. qtab: (P4, 16) f32 — columns
    [quu_h, quu_l, qut_h, qut_l, qtt_h, qtt_l, bias, 0, alpha, beta,
    delta, 0...] (constants bf16 hi/lo-split, dxt_hq._split_bf16); bias
    0 for real rows, _CF_NEG for pads. Returns (24, N) f32: rows
    [6k..6k+6) = pick k's (u0, u1, u2, alpha, beta, delta), picks in
    descending score order.
    """
    n = p72.shape[1]
    tile = min(512, _tile_for(n))
    p72 = _pad_lanes(p72, tile)
    np_ = p72.shape[1]
    n_chunks = selt.shape[0] // 128
    out = pl.pallas_call(
        partial(_cf_topk_kernel, n_chunks=n_chunks),
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((72, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(selt.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(qtab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((24, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((24, np_), jnp.float32),
        interpret=interpret,
    )(p72, selt, qtab)
    return out[:, :n]
