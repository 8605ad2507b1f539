"""DXT1 (BC1) / DXT5 (BC3) block kernels.

Batched, jit-compiled re-design of the reference's per-block DXT codec
(image_compression/internal/dxtc_compressor.cc). Blocks are processed as
(N, 16, C) int32 tensors; all argmin searches use first-occurrence
tie-breaking, matching the reference's strictly-less update scans
(dxtc_compressor.cc:293-307, :338-345, :467-474).

Byte layouts (little-endian), per dxtc_compressor.cc:36-97:
  DXT1 (8 bytes):  c0_lo c0_hi c1_lo c1_hi bits[0..3]
  DXT5 (16 bytes): alpha0 alpha1 alpha_bits[0..5] + DXT1 block
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from texcomp.core import colors as cc
from texcomp.core.constants import DXTC_CONST_COLOR_TABLE

_LUT_NP = DXTC_CONST_COLOR_TABLE.astype(np.int32)  # (256, 8)


def _lut() -> jax.Array:
    """Device copy of the const-color LUT. Created lazily (inside traces)
    so importing the package never touches a backend."""
    return jnp.asarray(_LUT_NP)


def _pack565(r, g, b):
    return cc.to_uint16_565(r, g, b)


def _extend565(r5, g6, b5):
    return cc.extend565_r(r5), cc.extend565_g(g6), cc.extend565_b(b5)


def _quantize565(r, g, b):
    return cc.quantize8(r, 5), cc.quantize8(g, 6), cc.quantize8(b, 5)


def _combine3(s0, s1, c0, c1):
    """CombineRgbIntFast over channel tuples (color_util.h:315-321)."""
    return tuple(cc.combine_int_fast(s0, s1, a, b) for a, b in zip(c0, c1))


def _diff_luminance_err(c0, c1):
    return cc.compute_difference_luminance_fast(*c0, *c1)


def _best_const_colors(target, always_4_color: bool):
    """Vectorized GetBestDxtcConstColors (dxtc_const_color_table.cc:322-392).

    Args:
      target: tuple of (N,) int32 channels (r, g, b), values 0-255.
    Returns:
      (which_bits (N,), c0_16 (N,), c1_16 (N,)) — the 2-bit palette index to
      replicate and the packed 565 endpoints.
    """
    tr, tg, tb = target

    # Exact-565 candidate.
    sr, sg, sb = _quantize565(tr, tg, tb)
    single_16 = _pack565(sr, sg, sb)
    min_error = _diff_luminance_err(target, _extend565(sr, sg, sb))
    which = jnp.zeros_like(tr)
    c0_16 = single_16
    c1_16 = single_16

    table = _lut()
    lut = lambda ch, col: table[ch, col]  # gather rows by channel value

    if not always_4_color:
        # Halves (1/2-interpolation) candidate; preferred over thirds for
        # hardware consistency (dxtc_const_color_table.cc:345-347).
        h0 = (lut(tr, 2), lut(tg, 6), lut(tb, 2))
        h1 = (lut(tr, 3), lut(tg, 7), lut(tb, 3))
        mid = _combine3(1, 1, _extend565(*h0), _extend565(*h1))
        err = _diff_luminance_err(target, mid)
        upd = err < min_error
        h0_16 = _pack565(*h0)
        h1_16 = _pack565(*h1)
        # Halves mode requires c0 < c1 (3-color decode rule).
        lo = jnp.minimum(h0_16, h1_16)
        hi = jnp.maximum(h0_16, h1_16)
        which = jnp.where(upd, 2, which)
        c0_16 = jnp.where(upd, lo, c0_16)
        c1_16 = jnp.where(upd, hi, c1_16)
        min_error = jnp.where(upd, err, min_error)

    # Thirds (1/3-interpolation) candidate.
    t0 = (lut(tr, 0), lut(tg, 4), lut(tb, 0))
    t1 = (lut(tr, 1), lut(tg, 5), lut(tb, 1))
    third = _combine3(2, 1, _extend565(*t0), _extend565(*t1))
    err = _diff_luminance_err(target, third)
    upd = err < min_error
    t0_16 = _pack565(*t0)
    t1_16 = _pack565(*t1)
    # Thirds mode requires c0 > c1; if not, flip endpoints and use code 3
    # (the 2/3 point) instead of 2 (dxtc_const_color_table.cc:377-389).
    gt = t0_16 > t1_16
    which = jnp.where(upd, jnp.where(gt, 2, 3), which)
    c0_16 = jnp.where(upd, jnp.where(gt, t0_16, t1_16), c0_16)
    c1_16 = jnp.where(upd, jnp.where(gt, t1_16, t0_16), c1_16)

    return which, c0_16, c1_16


def _encode_dxt1_words(rgb: jax.Array, always_4_color: bool,
                       swap_red_and_blue: bool = False):
    """Core DXT1 encode: (N, 16, 3) int32 -> (c0_16, c1_16, bits_bytes).

    Implements EncodeDxt1Block (dxtc_compressor.cc:482-513):
    min/max-luminance base colors -> 565 quantization -> constant-color LUT
    shortcut or 4-palette nearest-index search.

    ``rgb`` must already be channel-swapped for BGR/BGRA formats (the swap
    the reference applies per pixel at dxtc_compressor.cc:288,295,333).
    ``swap_red_and_blue`` still must be passed: ComputeConstantColorBits
    re-applies ToRgbOrBgrInt to the already-swapped base color
    (dxtc_compressor.cc:360), so for swapped formats the constant-color LUT
    search runs on the *unswapped* color. We replicate that double swap.

    Returns c0_16, c1_16 as (N,) int32 and bits as (N, 4) int32 row bytes.
    """
    r = rgb[:, :, 0]
    g = rgb[:, :, 1]
    b = rgb[:, :, 2]

    # ComputeBaseColors (dxtc_compressor.cc:284-311): pixels with min / max
    # luminance, first occurrence in scan order on ties. (The has_one_pixel
    # shortcut skips the scan, but a fully-outside block has 16 identical
    # pixels, so argmin/argmax == pixel 0 — same result.)
    lum = cc.compute_luminance_fast(r, g, b)
    lo_i = jnp.argmin(lum, axis=1)
    hi_i = jnp.argmax(lum, axis=1)
    take = lambda ch, i: jnp.take_along_axis(ch, i[:, None], axis=1)[:, 0]
    base_lo = (take(r, lo_i), take(g, lo_i), take(b, lo_i))
    base_hi = (take(r, hi_i), take(g, hi_i), take(b, hi_i))

    q_lo_16 = _pack565(*_quantize565(*base_lo))
    q_hi_16 = _pack565(*_quantize565(*base_hi))
    is_const = q_lo_16 == q_hi_16

    # --- Constant-color path (dxtc_compressor.cc:353-369) on base_colors[0],
    # double-swapped back to source order for swapped formats (see docstring).
    const_target = (base_lo[2], base_lo[1], base_lo[0]) if swap_red_and_blue else base_lo
    const_which, const_c0, const_c1 = _best_const_colors(const_target, always_4_color)
    const_row = const_which * 0x55  # replicate the 2-bit code to all 4 columns

    # --- General path: order endpoints so c0_16 > c1_16
    # (dxtc_compressor.cc:503-507), then nearest-of-4 by squared luminance
    # distance (ComputeColorBits, :315-349) using the *unquantized* base
    # colors as the palette.
    swap = q_lo_16 < q_hi_16
    sel = lambda lo_c, hi_c: jnp.where(swap, hi_c, lo_c)
    b0 = tuple(sel(lc, hc) for lc, hc in zip(base_lo, base_hi))
    b1 = tuple(sel(hc, lc) for lc, hc in zip(base_lo, base_hi))
    gen_c0 = jnp.maximum(q_lo_16, q_hi_16)
    gen_c1 = jnp.minimum(q_lo_16, q_hi_16)

    t2 = _combine3(2, 1, b0, b1)
    t3 = _combine3(1, 2, b0, b1)
    # Palette luminances: (N, 4)
    pal_lum = jnp.stack(
        [cc.compute_luminance_fast(*c) for c in (b0, b1, t2, t3)], axis=-1
    )
    d = pal_lum[:, None, :] - lum[:, :, None]  # (N, 16, 4)
    which = jnp.argmin(d * d, axis=-1)  # first-occurrence tie-break
    gen_rows = _pack_rows(which)

    c0_16 = jnp.where(is_const, const_c0, gen_c0)
    c1_16 = jnp.where(is_const, const_c1, gen_c1)
    rows = jnp.where(is_const[:, None], const_row[:, None], gen_rows)
    return c0_16, c1_16, rows


def _pack_rows(codes):
    """(N, 16) 2-bit pixel codes -> (N, 4) row bytes: bits for pixel
    (y, x) at bit 2x of byte y (dxtc_compressor.cc:330-347)."""
    shifts = jnp.arange(4, dtype=jnp.int32) * 2
    return jnp.sum(codes.reshape(-1, 4, 4) << shifts[None, None, :], axis=-1)


def _dxt1_bytes(c0_16, c1_16, rows):
    """Assemble (N, 8) uint8 little-endian DXT1 payload."""
    parts = [c0_16 & 0xFF, c0_16 >> 8, c1_16 & 0xFF, c1_16 >> 8]
    parts += [rows[:, i] for i in range(4)]
    return jnp.stack(parts, axis=-1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("always_4_color", "swap_red_and_blue"))
def encode_dxt1_blocks(rgb: jax.Array, always_4_color: bool = False,
                       swap_red_and_blue: bool = False) -> jax.Array:
    """Encode (N, 16, 3) int32 pixel blocks to (N, 8) uint8 DXT1 blocks.

    ``rgb`` must be pre-swapped for BGR input; see _encode_dxt1_words.
    """
    return _dxt1_bytes(*_encode_dxt1_words(rgb, always_4_color, swap_red_and_blue))


def _decode_dxt1_channels(data: jax.Array, always_4_color: bool):
    """(N, >=8) int32 byte view -> palette-decoded (N, 16, 3) int32.

    Implements DecodeColors + DecodeDxt1Block (dxtc_compressor.cc:167-237).
    """
    d = data.astype(jnp.int32)
    c0_16 = d[:, 0] + d[:, 1] * 256
    c1_16 = d[:, 2] + d[:, 3] * 256

    p0 = _extend565(*cc.from_uint16_565(c0_16))
    p1 = _extend565(*cc.from_uint16_565(c1_16))

    equal = c0_16 == c1_16
    if always_4_color:
        four = jnp.ones_like(equal)
    else:
        four = c0_16 > c1_16

    def mix(ch0, ch1):
        # CombineUint8Fast on 0-255 values (color_util.h:290-301).
        p2_4 = cc.combine_int_fast(2, 1, ch0, ch1)
        p3_4 = cc.combine_int_fast(1, 2, ch0, ch1)
        p2_3 = cc.combine_int_fast(1, 1, ch0, ch1)
        p2 = jnp.where(equal, ch1, jnp.where(four, p2_4, p2_3))
        p3 = jnp.where(equal, ch1, jnp.where(four, p3_4, jnp.zeros_like(ch0)))
        return p2, p3

    palette = []  # (N, 4) per channel
    for ch0, ch1 in zip(p0, p1):
        p2, p3 = mix(ch0, ch1)
        palette.append(jnp.stack([ch0, ch1, p2, p3], axis=-1))

    # Pixel (y, x) code = bits (2x, 2x+1) of byte 4+y (dxtc_compressor.cc
    # :230-236).
    rows = d[:, 4:8]  # (N, 4)
    shifts = jnp.arange(4, dtype=jnp.int32) * 2
    codes = (rows[:, :, None] >> shifts[None, None, :]) & 3  # (N, 4y, 4x)
    codes = codes.reshape(-1, 16)

    out = [jnp.take_along_axis(p, codes, axis=1) for p in palette]
    return jnp.stack(out, axis=-1)  # (N, 16, 3)


@partial(jax.jit, static_argnames=("always_4_color",))
def decode_dxt1_blocks(data: jax.Array, always_4_color: bool = False) -> jax.Array:
    """Decode (N, 8) uint8 DXT1 blocks to (N, 16, 3) int32 pixels."""
    return _decode_dxt1_channels(data, always_4_color)


# ---------------------------------------------------------------------------
# DXT5
# ---------------------------------------------------------------------------


def _compute_base_alphas(a: jax.Array, full_outside: jax.Array):
    """Vectorized ComputeBaseAlphas (dxtc_compressor.cc:374-424).

    Args:
      a: (N, 16) int32 alpha values.
      full_outside: (N,) bool has_one_pixel flags.
    Returns:
      (base0, base1) each (N,) int32.
    """
    num_transparent = jnp.sum(a == 0, axis=1)
    num_opaque = jnp.sum(a == 255, axis=1)
    mid = (a > 0) & (a < 255)
    low = jnp.min(jnp.where(mid, a, 255), axis=1)
    high = jnp.max(jnp.where(mid, a, 0), axis=1)
    degenerate = low > high  # all values were 0 or 255
    low = jnp.where(degenerate, 0, low)
    high = jnp.where(degenerate, 255, high)

    explicit = (num_transparent > 1) | (num_opaque > 1)
    low_adj = jnp.where(num_transparent > 0, 0, low)
    high_adj = jnp.where(num_opaque > 0, 255, high)
    base0 = jnp.where(explicit, low, high_adj)
    base1 = jnp.where(explicit, high, low_adj)

    a00 = a[:, 0]
    base0 = jnp.where(full_outside, a00, base0)
    base1 = jnp.where(full_outside, a00, base1)
    return base0, base1


def _alpha_ramp(base0, base1):
    """The 8 test alphas for both DXT5 schemes (dxtc_compressor.cc:436-456).

    Selection rule during *encode*: base0 <= base1 -> explicit-0/255 scheme.
    Returns (N, 8) int32.
    """
    comb = lambda s0, s1: cc.combine_int_fast(s0, s1, base0, base1)
    explicit = jnp.stack(
        [base0, base1, comb(4, 1), comb(3, 2), comb(2, 3), comb(1, 4),
         jnp.zeros_like(base0), jnp.full_like(base0, 255)],
        axis=-1,
    )
    interp = jnp.stack(
        [base0, base1, comb(6, 1), comb(5, 2), comb(4, 3), comb(3, 4),
         comb(2, 5), comb(1, 6)],
        axis=-1,
    )
    use_explicit = (base0 <= base1)[:, None]
    return jnp.where(use_explicit, explicit, interp)


def _pack_alpha_codes(codes: jax.Array):
    """(N, 16) 3-bit codes -> (N, 6) int32 bytes; pixel n at bits [3n, 3n+3)
    of the little-endian 48-bit field (dxtc_compressor.cc:103-158)."""
    shifts = jnp.arange(8, dtype=jnp.int32) * 3
    half0 = jnp.sum(codes[:, :8] << shifts[None, :], axis=1)  # 24 bits
    half1 = jnp.sum(codes[:, 8:] << shifts[None, :], axis=1)
    return jnp.stack(
        [half0 & 0xFF, (half0 >> 8) & 0xFF, (half0 >> 16) & 0xFF,
         half1 & 0xFF, (half1 >> 8) & 0xFF, (half1 >> 16) & 0xFF],
        axis=-1,
    )


def _unpack_alpha_codes(alpha_bytes: jax.Array):
    """(N, 6) int32 bytes -> (N, 16) 3-bit codes."""
    b = alpha_bytes
    half0 = b[:, 0] + (b[:, 1] << 8) + (b[:, 2] << 16)
    half1 = b[:, 3] + (b[:, 4] << 8) + (b[:, 5] << 16)
    shifts = jnp.arange(8, dtype=jnp.int32) * 3
    codes0 = (half0[:, None] >> shifts[None, :]) & 7
    codes1 = (half1[:, None] >> shifts[None, :]) & 7
    return jnp.concatenate([codes0, codes1], axis=1)


@partial(jax.jit, static_argnames=("swap_red_and_blue",))
def encode_dxt5_blocks(rgba: jax.Array, full_outside: jax.Array,
                       swap_red_and_blue: bool = False) -> jax.Array:
    """Encode (N, 16, 4) int32 pixel blocks to (N, 16) uint8 DXT5 blocks.

    Implements EncodeDxt5Block (dxtc_compressor.cc:516-528): base alphas,
    nearest-of-8 alpha codes, and a DXT1 color block encoded with the
    always-4-color rule.

    Args:
      rgba: pixel blocks (channels already swapped for BGRA input).
      full_outside: (N,) bool has_one_pixel flags (pixel4x4.cc:56-58) —
        parity-relevant: they force the trivial alpha encoding
        (dxtc_compressor.cc:376-379, :430-434).
    """
    a = rgba[:, :, 3]
    base0, base1 = _compute_base_alphas(a, full_outside)

    tests = _alpha_ramp(base0, base1)  # (N, 8)
    d = a[:, :, None] - tests[:, None, :]
    which = jnp.argmin(d * d, axis=-1)  # (N, 16), first-occurrence ties
    which = jnp.where(full_outside[:, None], 0, which)
    alpha_bytes = _pack_alpha_codes(which)

    c0_16, c1_16, rows = _encode_dxt1_words(
        rgba[:, :, :3], always_4_color=True, swap_red_and_blue=swap_red_and_blue
    )
    dxt1 = _dxt1_bytes(c0_16, c1_16, rows).astype(jnp.int32)

    head = jnp.stack([base0, base1], axis=-1)
    out = jnp.concatenate([head, alpha_bytes, dxt1], axis=-1)
    return out.astype(jnp.uint8)


@jax.jit
def decode_dxt5_blocks(data: jax.Array) -> jax.Array:
    """Decode (N, 16) uint8 DXT5 blocks to (N, 16, 4) int32 pixels.

    Implements DecodeDxt5Block (dxtc_compressor.cc:240-267): colors decode
    with the always-4-color rule; alphas per DecodeAlphaValues (:195-217),
    where alpha0 > alpha1 selects the 6-interpolant scheme.
    """
    d = data.astype(jnp.int32)
    a0 = d[:, 0]
    a1 = d[:, 1]

    comb = lambda s0, s1: cc.combine_int_fast(s0, s1, a0, a1)
    interp = jnp.stack(
        [a0, a1, comb(6, 1), comb(5, 2), comb(4, 3), comb(3, 4), comb(2, 5),
         comb(1, 6)],
        axis=-1,
    )
    explicit = jnp.stack(
        [a0, a1, comb(4, 1), comb(3, 2), comb(2, 3), comb(1, 4),
         jnp.zeros_like(a0), jnp.full_like(a0, 255)],
        axis=-1,
    )
    # Decode rule (dxtc_compressor.cc:202-216): a0 > a1 -> interpolated.
    ramp = jnp.where((a0 > a1)[:, None], interp, explicit)  # (N, 8)

    codes = _unpack_alpha_codes(d[:, 2:8])
    alpha = jnp.take_along_axis(ramp, codes, axis=1)  # (N, 16)

    rgb = _decode_dxt1_channels(d[:, 8:16], always_4_color=True)
    return jnp.concatenate([rgb, alpha[:, :, None]], axis=-1)


# ---------------------------------------------------------------------------
# Pad functors on packed blocks (host-side numpy; they are byte shuffles).
# ---------------------------------------------------------------------------


def _copy_column3_color_bits(row_bits: np.ndarray) -> np.ndarray:
    """Replicate the column-3 2-bit code across a row byte
    (dxtc_compressor.cc:548-554)."""
    return ((row_bits >> 6) & 3) * 0x55


def dxt1_column_pad_blocks(blocks: np.ndarray) -> np.ndarray:
    """DxtcGetColumnPadBlock (dxtc_compressor.cc:598-608) over (M, 8) uint8."""
    out = blocks.copy()
    out[:, 4:8] = _copy_column3_color_bits(blocks[:, 4:8])
    return out


def dxt1_row_pad_blocks(blocks: np.ndarray) -> np.ndarray:
    """DxtcGetRowPadBlock (dxtc_compressor.cc:634-644)."""
    out = blocks.copy()
    out[:, 4:8] = blocks[:, 7:8]
    return out


def dxt1_corner_pad_blocks(blocks: np.ndarray) -> np.ndarray:
    """DxtcGetCornerPadBlock (dxtc_compressor.cc:669-679)."""
    out = blocks.copy()
    out[:, 4:8] = _copy_column3_color_bits(blocks[:, 7:8])
    return out


def _alpha_codes_np(alpha_bytes: np.ndarray) -> np.ndarray:
    """(M, 6) uint8 -> (M, 16) int codes (numpy mirror of _unpack)."""
    b = alpha_bytes.astype(np.int64)
    half0 = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
    half1 = b[:, 3] | (b[:, 4] << 8) | (b[:, 5] << 16)
    shifts = np.arange(8) * 3
    return np.concatenate(
        [(half0[:, None] >> shifts) & 7, (half1[:, None] >> shifts) & 7], axis=1
    )


def _alpha_bytes_np(codes: np.ndarray) -> np.ndarray:
    shifts = np.arange(8) * 3
    half0 = np.sum(codes[:, :8].astype(np.int64) << shifts, axis=1)
    half1 = np.sum(codes[:, 8:].astype(np.int64) << shifts, axis=1)
    return np.stack(
        [half0 & 0xFF, (half0 >> 8) & 0xFF, (half0 >> 16) & 0xFF,
         half1 & 0xFF, (half1 >> 8) & 0xFF, (half1 >> 16) & 0xFF],
        axis=-1,
    ).astype(np.uint8)


def dxt5_column_pad_blocks(blocks: np.ndarray) -> np.ndarray:
    """DxtcGetColumnPadBlock<Dxt5Block> (dxtc_compressor.cc:610-628)."""
    out = blocks.copy()
    codes = _alpha_codes_np(blocks[:, 2:8]).reshape(-1, 4, 4)
    codes[:, :, 0:3] = codes[:, :, 3:4]
    out[:, 2:8] = _alpha_bytes_np(codes.reshape(-1, 16))
    out[:, 8:16] = dxt1_column_pad_blocks(blocks[:, 8:16])
    return out


def dxt5_row_pad_blocks(blocks: np.ndarray) -> np.ndarray:
    """DxtcGetRowPadBlock<Dxt5Block> (dxtc_compressor.cc:646-663)."""
    out = blocks.copy()
    codes = _alpha_codes_np(blocks[:, 2:8]).reshape(-1, 4, 4)
    codes[:, 0:3, :] = codes[:, 3:4, :]
    out[:, 2:8] = _alpha_bytes_np(codes.reshape(-1, 16))
    out[:, 8:16] = dxt1_row_pad_blocks(blocks[:, 8:16])
    return out


def dxt5_corner_pad_blocks(blocks: np.ndarray) -> np.ndarray:
    """DxtcGetCornerPadBlock<Dxt5Block> (dxtc_compressor.cc:681-696)."""
    out = blocks.copy()
    codes = _alpha_codes_np(blocks[:, 2:8])
    codes[:, :] = codes[:, 15:16]
    out[:, 2:8] = _alpha_bytes_np(codes)
    out[:, 8:16] = dxt1_corner_pad_blocks(blocks[:, 8:16])
    return out
