"""Pallas TPU kernel for ETC1 encode.

Same layout discipline as dxt_pallas: blocks as (16, N) packed-uint32
tensors (pixels on sublanes in scan order y*4+x, blocks on lanes). The
2 flips x 2 subblocks x 8 codewords x 4 modifiers search
(etc_compressor.cc:350-409) runs as a fully unrolled chain of dense VPU ops.

Subblock pixels are made CONTIGUOUS before the search: the flip=True
subblocks are the natural sublane halves (rows 0-7 / 8-15), and for
flip=False a static row permutation (applied once in XLA, outside the
kernel) groups the left/right column pixels the same way. Each subblock
search then runs on dense (8, T) tensors — half the vector work of the
masked (16, T) formulation — and subblock errors are plain sublane sums.
The heuristic strategy (FindCodewordHeuristic, etc_compressor.cc:415-455)
picks its codeword from the absolute deviation alone, so that path skips
the 8x4 candidate-error tensor entirely (~8x less work; it dominates the
DXT1->ETC1 transcoder).

Bit-exact with texcomp.codecs.etc (which is bit-exact with the C++
reference); tested in tests/test_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from texcomp.core.constants import ETC1_CODEBOOK, ETC1_HEURISTIC_THRESHOLDS

LANE_TILE = 1024  # blocks per grid step (search is ~4x heavier than DXT)


def _tile_for(n: int) -> int:
    """Lane-grid tile for n blocks under THIS module's LANE_TILE (the
    ETC search budget differs from dxt_pallas._tile_for's cap)."""
    return min(LANE_TILE, max(128, 1 << (n - 1).bit_length()))

SPLIT_HORIZONTALLY = 0
SPLIT_VERTICALLY = 1
SMALLER_ERROR = 2
HEURISTIC = 3

_U32 = jnp.uint32

# Perf-probe knob (tools/probe_etc_prune_ceiling.py): number of codewords
# the kSmallerError search evaluates. ANY value below 8 breaks byte
# parity — it exists only to measure the upper bound a codeword-pruning
# scheme could ever reach (the win if pruning were free and every lane
# agreed). Never set this outside the probe tool.
_N_CW_PROBE = 8



def _clamp8(v):
    return jnp.clip(v, 0, 255)


# Row permutation grouping the flip=False (vertical split) subblocks into
# contiguous sublane halves: rows 0-7 = left columns (x < 2), rows 8-15 =
# right columns. flip=True subblocks are already contiguous (y < 2 -> rows
# 0-7). Applied once in XLA before the kernel (see encode_etc1_packed).
_PERM_F = [0, 1, 4, 5, 8, 9, 12, 13, 2, 3, 6, 7, 10, 11, 14, 15]


def _codeword_select(cw, table_col):
    """Select table_col[cw] elementwise, cw in 0..7 (static unroll)."""
    out = jnp.full_like(cw, int(table_col[0]))
    for k in range(1, 8):
        out = jnp.where(cw == k, int(table_col[k]), out)
    return out


def _subblock_search(pg, base, heuristic: bool):
    """Per-subblock codeword + pixel-index search on a dense pixel group.

    pg: 3-tuple of (8, T) member pixels; base: 3-tuple of (1, T) decoded
    subblock color.
    Returns (cw (1,T), err (1,T) f32 or None for heuristic, mod (8,T)).

    The error arithmetic runs in float32: every quantity is an integer
    (|d| <= 438, per-pixel error <= 3*438^2, subblock sums <= 4.6M, all
    < 2^24), so fp32 is EXACT and the strictly-less tie-breaks are
    bit-identical to the int32 reference — while int32 multiplies on the
    TPU VPU cost several ops each and fp32 mul-adds are single-cycle.
    """
    cb = ETC1_CODEBOOK
    pgf = [ch.astype(jnp.float32) for ch in pg]
    basef = [bs.astype(jnp.float32) for bs in base]

    # Per-channel working tensors, materialized ONCE at (8, T) so the hot
    # loop has no (1, T) ops or sublane broadcasts (a (1, T) op costs the
    # same vregs as an (8, T) op in Mosaic). For a modifier v the clamped
    # delta is: v > 0 -> min(D + v, U); v < 0 -> max(D + v, L), with
    # D = base - p, U = 255 - p, L = -p (clamp(base+v) can only hit the
    # matching bound since base is in [0, 255] and the codebook has no 0).
    D = [bs - ch for ch, bs in zip(pgf, basef)]
    U = [255.0 - ch for ch in pgf]
    L = [-ch for ch in pgf]

    def mod_err(v):
        e = None
        for dc, uc, lc in zip(D, U, L):
            d = jnp.minimum(dc + v, uc) if v > 0 else jnp.maximum(dc + v, lc)
            e = d * d if e is None else e + d * d
        return e

    if heuristic:
        # FindCodewordHeuristic (etc_compressor.cc:415-455): codeword from
        # the max per-channel absolute deviation — no error tensor needed.
        dev = None
        for ch, bs in zip(pg, base):
            ad = jnp.sum(jnp.abs(bs - ch), axis=0, keepdims=True) >> 3
            dev = ad if dev is None else jnp.maximum(dev, ad)
        cw = jnp.zeros_like(dev)
        for t in ETC1_HEURISTIC_THRESHOLDS.tolist():
            cw = cw + (dev > t)
        err = None
    else:
        # Per-codeword best-modifier subblock errors, then first-occurrence
        # argmin over 8 codewords (etc_compressor.cc:350-409).
        per_cw_err = []
        for k in range(_N_CW_PROBE):
            best = None
            for m in range(4):
                e = mod_err(float(cb[k, m]))
                best = e if best is None else jnp.minimum(best, e)
            per_cw_err.append(jnp.sum(best, axis=0, keepdims=True))
        err = per_cw_err[0]
        cw = jnp.zeros(err.shape, jnp.int32)
        for k in range(1, _N_CW_PROBE):
            better = per_cw_err[k] < err
            cw = jnp.where(better, k, cw)
            err = jnp.where(better, per_cw_err[k], err)

    # Recompute per-pixel best modifier for the chosen codeword
    # (first-strictly-smaller over the 4 modifiers, etc_compressor.cc:364-380).
    # Codebook rows are [a, b, -a, -b], so only the two positive columns
    # are selected and m >= 2 subtracts (the structure the decoder uses);
    # the min/max clamp form extends to the per-lane modifier vectors.
    va = _codeword_select(cw, cb[:, 0]).astype(jnp.float32)  # (1, T)
    vb = _codeword_select(cw, cb[:, 1]).astype(jnp.float32)
    best_e = None
    best_m = None
    for m, vm in enumerate((va, vb, va, vb)):
        e = None
        for dc, uc, lc in zip(D, U, L):
            t = dc + vm if m < 2 else dc - vm
            d = jnp.minimum(t, uc) if m < 2 else jnp.maximum(t, lc)
            e = d * d if e is None else e + d * d
        if best_e is None:
            best_e = e
            best_m = jnp.zeros(e.shape, jnp.int32)
        else:
            better = e < best_e
            best_m = jnp.where(better, m, best_m)
            best_e = jnp.where(better, e, best_e)
    return cw, err, best_m


def _encode_flip(rgb_nat, rgb_perm, flip: bool, strategy: int):
    """FindBestSubblockEncoding (etc_compressor.cc:460-542) for one flip.
    rgb_nat / rgb_perm: 3-tuples of (16, T) pixels in natural / _PERM_F row
    order. Returns (hi, lo, err) — err is None for the heuristic strategy."""
    src = rgb_nat if flip else rgb_perm
    g1 = [ch[0:8] for ch in src]
    g2 = [ch[8:16] for ch in src]

    avg1 = [jnp.sum(ch, axis=0, keepdims=True) >> 3 for ch in g1]
    avg2 = [jnp.sum(ch, axis=0, keepdims=True) >> 3 for ch in g2]
    q1_555 = [a >> 3 for a in avg1]
    q2_555 = [a >> 3 for a in avg2]
    q1_444 = [a >> 4 for a in avg1]
    q2_444 = [a >> 4 for a in avg2]
    return _finish_from_q(src, q1_555, q2_555, q1_444, q2_444, flip,
                          strategy)


def _finish_from_q(src, q1_555, q2_555, q1_444, q2_444, flip: bool,
                   strategy: int):
    """Mode decision + codeword/index search + word packing for GIVEN
    quantized subblock bases (the tail of FindBestSubblockEncoding,
    etc_compressor.cc:480-542; the in-kernel twin of
    codecs.etc._finish_flip). src: 3-tuple of (16, T) pixels with the
    flip's subblocks on contiguous sublane halves; q*: 3-lists of (1, T)
    int32. Returns (hi, lo, err) logical words."""
    g1 = [ch[0:8] for ch in src]
    g2 = [ch[8:16] for ch in src]
    d555 = [b - a for a, b in zip(q1_555, q2_555)]
    use_diff = None
    for d in d555:
        c = (d >= -4) & (d <= 3)
        use_diff = c if use_diff is None else (use_diff & c)

    ext5 = lambda v: (v << 3) | (v >> 2)
    ext4 = lambda v: (v << 4) | v
    dec1 = [jnp.where(use_diff, ext5(q5), ext4(q4))
            for q5, q4 in zip(q1_555, q1_444)]
    dec2 = [jnp.where(use_diff, ext5(q5), ext4(q4))
            for q5, q4 in zip(q2_555, q2_444)]

    heuristic = strategy == HEURISTIC
    cw1, e1, mod1 = _subblock_search(g1, dec1, heuristic)
    cw2, e2, mod2 = _subblock_search(g2, dec2, heuristic)
    err = None if heuristic else e1 + e2

    # lo word: bit p_etc = mod&1, bit p_etc+16 = mod>>1, assembled with
    # per-row iota shifts + disjoint-bit sums (16 per-row extracts each
    # cost a sublane relayout; this is 4 dense (8, T) ops per group).
    # Row r of group g holds pixel p: flip=True -> p = 8g + r, so
    # p_etc = (p%4)*4 + p//4 = 4*(r%4) + 2g + r//4; flip=False (_PERM_F
    # order) -> p = 4*(r//2) + r%2 + 2g, so p_etc = 4*(r%2) + 8g + r//2.
    r_i = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    lo = None
    for g, modg in ((0, mod1), (1, mod2)):
        if flip:
            shift = 4 * (r_i & 3) + 2 * g + (r_i >> 2)
        else:
            shift = 4 * (r_i & 1) + 8 * g + (r_i >> 1)
        shift = shift.astype(_U32)
        modu = modg.astype(_U32)
        bits = ((modu & _U32(1)) << shift) | (
            ((modu >> 1) & _U32(1)) << (shift + _U32(16)))
        # OR-tree over the 8 rows via aligned slices (Mosaic has no
        # unsigned reductions).
        q = bits[0:4] | bits[4:8]
        q = q[0:2] | q[2:4]
        part = q[0:1] | q[1:2]
        lo = part if lo is None else (lo | part)

    fld = lambda v, start, nbits: (v.astype(_U32) & _U32((1 << nbits) - 1)) << start
    hi = jnp.full_like(lo, _U32(1 if flip else 0))
    hi = hi | jnp.where(use_diff, _U32(2), _U32(0))
    starts_d1 = (27, 19, 11)
    starts_d2 = (24, 16, 8)
    starts_i1 = (28, 20, 12)
    starts_i2 = (24, 16, 8)
    for ch in range(3):
        diff_bits = fld(q1_555[ch], starts_d1[ch], 5) | fld(
            d555[ch], starts_d2[ch], 3)
        ind_bits = fld(q1_444[ch], starts_i1[ch], 4) | fld(
            q2_444[ch], starts_i2[ch], 4)
        hi = hi | jnp.where(use_diff, diff_bits, ind_bits)
    hi = hi | fld(cw1, 5, 3) | fld(cw2, 2, 3)
    return hi, lo, err


def _heuristic_flip(rgb):
    """Flip choice for kHeuristic (etc_compressor.cc:553-574), including the
    sum4 pixel-(2,2)-twice quirk (:563-564). Returns (1, T) bool (flipped)."""
    pos = lambda y, x: y * 4 + x

    def quad(ps):
        return [sum(ch[p][None, :] for p in ps) for ch in rgb]

    sum1 = quad([pos(0, 0), pos(0, 1), pos(1, 0), pos(1, 1)])
    sum2 = quad([pos(2, 0), pos(2, 1), pos(3, 0), pos(3, 1)])
    sum3 = quad([pos(0, 2), pos(0, 3), pos(1, 2), pos(1, 3)])
    sum4 = quad([pos(2, 2), pos(2, 3), pos(3, 2), pos(2, 2)])

    div8 = lambda v: jnp.sign(v) * (jnp.abs(v) >> 3)
    left = [div8(a + b) for a, b in zip(sum1, sum2)]
    right = [div8(a + b) for a, b in zip(sum3, sum4)]
    top = [div8(a + b) for a, b in zip(sum1, sum3)]
    bottom = [div8(a + b) for a, b in zip(sum2, sum4)]

    err3 = lambda a, b: sum((x - y) * (x - y) for x, y in zip(a, b))
    return ~(err3(left, right) > err3(top, bottom))


def _etc1_words_from_channels(rgb, rgbp, strategy):
    """Strategy dispatch + LE word emission on decoded channel planes.
    rgb / rgbp: 3-tuples of (16, T) pixels in natural / _PERM_F order."""
    if strategy == SPLIT_HORIZONTALLY:
        hi, lo, _ = _encode_flip(rgb, rgbp, True, strategy)
    elif strategy == SPLIT_VERTICALLY:
        hi, lo, _ = _encode_flip(rgb, rgbp, False, strategy)
    elif strategy == HEURISTIC:
        hi_f, lo_f, _ = _encode_flip(rgb, rgbp, False, strategy)
        hi_t, lo_t, _ = _encode_flip(rgb, rgbp, True, strategy)
        flip = _heuristic_flip(rgb)
        hi = jnp.where(flip, hi_t, hi_f)
        lo = jnp.where(flip, lo_t, lo_f)
    else:  # SMALLER_ERROR: lr wins ties (etc_compressor.cc:583).
        hi_f, lo_f, err_f = _encode_flip(rgb, rgbp, False, strategy)
        hi_t, lo_t, err_t = _encode_flip(rgb, rgbp, True, strategy)
        take_lr = err_f <= err_t
        hi = jnp.where(take_lr, hi_f, hi_t)
        lo = jnp.where(take_lr, lo_f, lo_t)

    # Emit the block as TWO little-endian uint32 words (byte 0 of the block
    # = low byte of word 0): byte-splitting to (8, T) uint8 here would force
    # the image-level (8, N) -> (N, 8) relayout to happen at 8-bit, ~100x
    # slower than the 32-bit transpose the words form allows.
    return jnp.concatenate([_bswap32(hi), _bswap32(lo)], axis=0)


def _etc1_kernel(px_ref, pxp_ref, out_ref, *, strategy):
    w = px_ref[:].astype(jnp.int32)
    rgb = (w & 255, (w >> 8) & 255, (w >> 16) & 255)
    wp = pxp_ref[:].astype(jnp.int32)
    rgbp = (wp & 255, (wp >> 8) & 255, (wp >> 16) & 255)
    out_ref[:] = _etc1_words_from_channels(rgb, rgbp, strategy)


def _pad_lanes(x, tile):
    n = x.shape[1]
    pad = (-n) % tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


# ---------------------------------------------------------------------------
# Decode kernel.
# ---------------------------------------------------------------------------


def _bswap32(w):
    return (((w & _U32(0xFF)) << 24) | ((w & _U32(0xFF00)) << 8)
            | ((w >> 8) & _U32(0xFF00)) | (w >> 24))


def _select8(idx, table_col):
    out = jnp.full(idx.shape, int(table_col[0]), dtype=jnp.int32)
    for k in range(1, 8):
        out = jnp.where(idx == k, int(table_col[k]), out)
    return out


def _etc1_decode_channels(w0, w1):
    """(1, T) uint32 LE block words -> (r, g, b) decoded (16, T) int32
    planes (Etc1BlockDecoder, etc_compressor.cc:227-273)."""
    t = w0.shape[1]
    hi = _bswap32(w0).astype(jnp.int32)  # file order is BE
    lo = _bswap32(w1).astype(jnp.int32)

    flip = hi & 1
    diff = (hi >> 1) & 1
    cw0 = (hi >> 5) & 7
    cw1 = (hi >> 2) & 7

    bits = lambda s, nb: (hi >> s) & ((1 << nb) - 1)
    # Extend5Bit masks the replicated bits (color_util.h:200-202) — matters
    # for out-of-range differential sums in malformed blocks.
    ext5 = lambda v: (v << 3) | ((v >> 2) & 7)
    ext4 = lambda v: (v << 4) | v
    sext3 = lambda v: (v << 29) >> 29

    b5 = (bits(27, 5), bits(19, 5), bits(11, 5))
    d3 = (sext3(bits(24, 3)), sext3(bits(16, 3)), sext3(bits(8, 3)))
    c1 = [jnp.where(diff == 1, ext5(v), ext4(bits(s, 4)))
          for v, s in zip(b5, (28, 20, 12))]
    c2 = [jnp.where(diff == 1, ext5(v + d), ext4(bits(s, 4)))
          for v, d, s in zip(b5, d3, (24, 16, 8))]

    p = jax.lax.broadcasted_iota(jnp.int32, (16, t), 0)
    px = p & 3
    py = p >> 2
    p_etc = px * 4 + py
    idx = ((jnp.broadcast_to(lo, (16, t)) >> p_etc) & 1) | (
        ((jnp.broadcast_to(lo, (16, t)) >> (p_etc + 16)) & 1) << 1)
    flip_b = jnp.broadcast_to(flip, (16, t)) == 1
    is_first = (flip_b & (py < 2)) | (~flip_b & (px < 2))

    cw = jnp.where(is_first, jnp.broadcast_to(cw0, (16, t)),
                   jnp.broadcast_to(cw1, (16, t)))
    # modifier = CB[cw][idx]; CB rows are [a, b, -a, -b].
    a = _select8(cw, ETC1_CODEBOOK[:, 0])
    b = _select8(cw, ETC1_CODEBOOK[:, 1])
    mag = jnp.where((idx & 1) == 1, b, a)
    modifier = jnp.where(idx >= 2, -mag, mag)

    out = []
    for ch1, ch2 in zip(c1, c2):
        base = jnp.where(is_first, jnp.broadcast_to(ch1, (16, t)),
                         jnp.broadcast_to(ch2, (16, t)))
        out.append(jnp.clip(base + modifier, 0, 255))
    return tuple(out)


def _etc1_decode_kernel(w_ref, out_ref):
    """(2, T) uint32 LE words of 8-byte blocks -> (16, T) packed RGB
    pixels."""
    w = w_ref[:]
    r, g, b = _etc1_decode_channels(w[0][None, :], w[1][None, :])
    out_ref[:] = (r.astype(_U32) | (g.astype(_U32) << 8)
                  | (b.astype(_U32) << 16))


@partial(jax.jit, static_argnames=("interpret",))
def decode_etc1_packed(words: jax.Array, interpret: bool = False) -> jax.Array:
    """(2, N) uint32 LE block words -> (16, N) uint32 packed RGB pixels."""
    n = words.shape[1]
    tile = min(2048, max(128, 1 << (n - 1).bit_length()))
    words = _pad_lanes(words, tile)
    np_ = words.shape[1]
    out = pl.pallas_call(
        _etc1_decode_kernel,
        grid=(np_ // tile,),
        in_specs=[pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, np_), jnp.uint32),
        interpret=interpret,
    )(words)
    return out[:, :n]


@partial(jax.jit, static_argnames=("height", "width", "interpret"))
def etc1_decode_image(data: jax.Array, *, height: int, width: int,
                      interpret: bool = False) -> jax.Array:
    """(N, 8) uint8 ETC1 blocks -> (H, W, 4) uint8 RGBX image."""
    from texcomp.ops.dxt_pallas import _unblock_transpose_u32, blocks_to_words

    px = decode_etc1_packed(blocks_to_words(data, 2), interpret=interpret)
    img = _unblock_transpose_u32(px, height, width)
    return jax.lax.bitcast_convert_type(img, jnp.uint8)


def encode_etc1_words(words: jax.Array, strategy: int = SMALLER_ERROR,
                      interpret: bool = False) -> jax.Array:
    """(16, N) uint32 packed RGB pixels -> (2, N) uint32 little-endian ETC1
    block words (byte 0 of the block = low byte of word 0)."""
    n = words.shape[1]
    tile = _tile_for(n)
    words = _pad_lanes(words, tile)
    np_ = words.shape[1]
    # Row-permuted copy grouping the flip=False subblocks (see _PERM_F);
    # one static XLA gather, negligible next to the search.
    words_perm = words[np.array(_PERM_F), :]
    out = pl.pallas_call(
        partial(_etc1_kernel, strategy=strategy),
        grid=(np_ // tile,),
        in_specs=[pl.BlockSpec((16, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, np_), jnp.uint32),
        interpret=interpret,
    )(words, words_perm)
    return out[:, :n]


def etc1_words_to_blocks(words: jax.Array) -> jax.Array:
    """(2, N) uint32 LE block words -> (N, 8) uint8 blocks via a 32-bit
    transpose + free bitcast (an 8-bit (8, N) -> (N, 8) relayout is ~100x
    slower on TPU)."""
    return jax.lax.bitcast_convert_type(words.T, jnp.uint8).reshape(-1, 8)


@partial(jax.jit, static_argnames=("strategy", "interpret"))
def transcode_dxt1_to_etc1_packed(words: jax.Array, strategy: int = HEURISTIC,
                                  interpret: bool = False) -> jax.Array:
    """(2, N) uint32 DXT1 LE words -> (2, N) uint32 ETC1 LE words: fused
    decode -> re-encode on device (dxtc_to_etc_transcoder.cc:29-40).
    Convert with etc1_words_to_blocks for (N, 8) bytes."""
    from texcomp.ops.dxt_pallas import decode_dxt1_packed

    px = decode_dxt1_packed(words, interpret=interpret)
    return encode_etc1_words(px, strategy, interpret=interpret)


@partial(jax.jit, static_argnames=("strategy", "interpret"))
def encode_etc1_packed(words: jax.Array, strategy: int = SMALLER_ERROR,
                       interpret: bool = False) -> jax.Array:
    """(16, N) uint32 packed RGB pixels -> (8, N) uint8 ETC1 block bytes
    (hardware byte order: row r = byte r of each block)."""
    w = encode_etc1_words(words, strategy, interpret=interpret)
    return jnp.concatenate(
        [(w[0:1] >> s) & _U32(255) for s in (0, 8, 16, 24)]
        + [(w[1:2] >> s) & _U32(255) for s in (0, 8, 16, 24)],
        axis=0,
    ).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("strategy", "interpret"))
def etc1_encode_image(image: jax.Array, strategy: int = SMALLER_ERROR,
                      interpret: bool = False) -> jax.Array:
    """(H, W, 3) uint8 (multiples of 4) -> (N, 8) uint8 ETC1 blocks."""
    from texcomp.ops.dxt_pallas import pack_rgb_image

    words = pack_rgb_image(image)
    return etc1_words_to_blocks(
        encode_etc1_words(words, strategy, interpret=interpret))


@partial(jax.jit, static_argnames=("strategy", "grid_height", "grid_width",
                                   "interpret"))
def etc1_encode_padded_image(image: jax.Array, grid_height: int,
                             grid_width: int,
                             strategy: int = SMALLER_ERROR,
                             interpret: bool = False) -> jax.Array:
    """API-path pipeline: edge-pad to the block grid, pack, encode."""
    from texcomp.ops.dxt_pallas import pack_rgb_image

    h, w = image.shape[0], image.shape[1]
    image = jnp.pad(
        image, ((0, grid_height - h), (0, grid_width - w), (0, 0)),
        mode="edge",
    )
    words = pack_rgb_image(image)
    return etc1_words_to_blocks(
        encode_etc1_words(words, strategy, interpret=interpret))


# ---------------------------------------------------------------------------
# Fused downsample+encode (mip levels): decode the 2x2 source-block group,
# truncating-average, and re-encode the destination block in one kernel —
# see dxt_pallas for the layout story. The ETC twist: the encoder needs
# the destination pixels in BOTH natural and _PERM_F row order; the
# permuted copy falls out of the same average-and-regroup matmul with
# permuted rows, so it costs three extra tiny MXU ops instead of a
# sublane shuffle.
# ---------------------------------------------------------------------------


def _etc1_down_kernel(w_ref, out_ref, *, strategy):
    from texcomp.ops.dxt_pallas import _avg_regroup

    w = w_ref[:]  # (8, T): LE words of the 4 source blocks
    chans = [_etc1_decode_channels(w[2 * g][None, :], w[2 * g + 1][None, :])
             for g in range(4)]
    rgb = tuple(_avg_regroup(chans))
    rgbp = tuple(_avg_regroup(chans, perm=_PERM_F))
    out_ref[:] = _etc1_words_from_channels(rgb, rgbp, strategy)


@partial(jax.jit, static_argnames=("nby", "nbx", "strategy", "interpret"))
def etc1_downsample_encode_words(words: jax.Array, *, nby: int, nbx: int,
                                 strategy: int = SMALLER_ERROR,
                                 interpret: bool = False) -> jax.Array:
    """(2, N_src) uint32 LE ETC1 words on an (nby, nbx) source block grid
    (both even) -> (2, N_src/4) words of the 2x downsampled level;
    bit-identical to decode -> truncating 2x2 average -> encode."""
    grouped = (words.reshape(2, nby // 2, 2, nbx // 2, 2)
               .transpose(2, 4, 0, 1, 3).reshape(8, -1))
    n = grouped.shape[1]
    tile = _tile_for(n)
    grouped = _pad_lanes(grouped, tile)
    np_ = grouped.shape[1]
    out = pl.pallas_call(
        partial(_etc1_down_kernel, strategy=strategy),
        grid=(np_ // tile,),
        in_specs=[pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, np_), jnp.uint32),
        interpret=interpret,
    )(grouped)
    return out[:, :n]


# ---------------------------------------------------------------------------
# HQ search kernel: best-of-K candidate bases + alternating refits + ±1
# probes, entirely in VMEM.
#
# The XLA HQ path scores each of the ~66 candidate base tuples per flip
# with codecs.etc._finish_flip, which materializes an (N, 16, 8, 4) error
# tensor in HBM per candidate — 550 ms at 512^2 (tools/
# profile_hq_stages.py). Here the pixel planes stay resident in VMEM
# across a (tiles, K) grid whose K dimension walks the candidate list
# (sequential on TPU, preserving the scan-order first-occurrence
# tie-breaks), and each step is pure VPU work. Three step phases:
#   k <  KC      candidate bases from the packed input row k
#   k in [KC,KC+2)  alternating refit: LS bases from the incumbent's
#                   modifiers (codecs.etc._refit_bases), chained through
#                   a scratch register exactly like the XLA loop
#   k >= KC+2    ±1 code-point probes (both 555 and 444 spaces) around
#                   the SECOND refit's bases, in neighborhood_qs order
# Base tuples are packed 2 uint32 words per candidate (one per subblock):
# q555 r,g,b at bits 0/5/10, q444 r,g,b at bits 15/19/23.
# ---------------------------------------------------------------------------

_HQ_REFITS = 2
_HQ_PROBES = 24  # 2 subblocks x 3 channels x (-1, +1) x (555, 444)


def _pack_q_word(q555, q444):
    """3-lists of int32 planes -> packed candidate word (same layout the
    kernel unpacks)."""
    w = (q555[0].astype(jnp.uint32)
         | (q555[1].astype(jnp.uint32) << 5)
         | (q555[2].astype(jnp.uint32) << 10)
         | (q444[0].astype(jnp.uint32) << 15)
         | (q444[1].astype(jnp.uint32) << 19)
         | (q444[2].astype(jnp.uint32) << 23))
    return w


def _unpack_q_words(w1, w2):
    """(1, T) packed candidate words -> (q1_555, q2_555, q1_444, q2_444)
    3-lists of (1, T) int32."""
    f = lambda w, s, b: ((w >> s) & _U32((1 << b) - 1)).astype(jnp.int32)
    q1_555 = [f(w1, 0, 5), f(w1, 5, 5), f(w1, 10, 5)]
    q2_555 = [f(w2, 0, 5), f(w2, 5, 5), f(w2, 10, 5)]
    q1_444 = [f(w1, 15, 4), f(w1, 19, 4), f(w1, 23, 4)]
    q2_444 = [f(w2, 15, 4), f(w2, 19, 4), f(w2, 23, 4)]
    return q1_555, q2_555, q1_444, q2_444


def _quantize8_i32(v, num_bits: int):
    """Blinn round-exact quantization (color_util.h:156-164) on int32."""
    i = v * ((1 << num_bits) - 1) + 128
    return (i + (i >> 8)) >> 8


def _refit_q_words(src, hi, lo, flip: bool):
    """In-kernel twin of codecs.etc._refit_bases: least-squares subblock
    bases for the packed candidate's chosen modifiers, re-quantized.
    src: 3-tuple (16, T) int32; hi, lo: (1, T) uint32 LOGICAL words.
    Returns the two packed candidate words."""
    cb = ETC1_CODEBOOK
    hi_i = hi.astype(jnp.int32)
    cw1 = (hi_i >> 5) & 7
    cw2 = (hi_i >> 2) & 7
    r_i = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    words = []
    for g, cw in ((0, cw1), (1, cw2)):
        if flip:
            shift = 4 * (r_i & 3) + 2 * g + (r_i >> 2)
        else:
            shift = 4 * (r_i & 1) + 8 * g + (r_i >> 1)
        shift = shift.astype(_U32)
        idx = (((lo >> shift) & _U32(1))
               | (((lo >> (shift + _U32(16))) & _U32(1)) << 1)
               ).astype(jnp.int32)  # (8, T)
        va = _codeword_select(cw, cb[:, 0])  # (1, T)
        vb = _codeword_select(cw, cb[:, 1])
        m = jnp.where(idx == 0, va,
                      jnp.where(idx == 1, vb,
                                jnp.where(idx == 2, -va, -vb)))  # (8, T)
        mf = m.astype(jnp.float32)
        q555, q444 = [], []
        for ch in src:
            group = ch[8 * g:8 * g + 8].astype(jnp.float32)
            s = jnp.sum(group - mf, axis=0, keepdims=True)  # (1, T)
            b = jnp.clip(jnp.round(s * 0.125), 0.0, 255.0).astype(jnp.int32)
            q555.append(_quantize8_i32(b, 5))
            q444.append(_quantize8_i32(b, 4))
        words.append(_pack_q_word(q555, q444))
    return words[0], words[1]


def _probe_q_words(w1, w2, j: int):
    """±1 probe j (neighborhood_qs order: sb-major, then channel, then
    d in (-1, +1), then space in (555, 444)) applied to packed words."""
    sb = j // 12
    ch = (j % 12) // 4
    d = -1 if ((j % 4) // 2) == 0 else 1
    space = "555" if (j % 2) == 0 else "444"
    w = w1 if sb == 0 else w2
    if space == "555":
        sh, bits, top = 5 * ch, 5, 31
    else:
        sh, bits, top = 15 + 4 * ch, 4, 15
    mask = _U32(((1 << bits) - 1) << sh)
    f = ((w & mask) >> sh).astype(jnp.int32)
    f2 = jnp.clip(f + d, 0, top).astype(_U32) << sh
    w_new = (w & ~mask) | f2
    return (w_new, w2) if sb == 0 else (w1, w_new)


def _etc1_hq_kernel(px_ref, cand_ref, hi_lo_ref, err_ref,
                    qsel, cur, qpack, *, flip, n_cand):
    k = pl.program_id(1)
    n_steps_a = n_cand

    w = px_ref[:].astype(jnp.int32)
    src = (w & 255, (w >> 8) & 255, (w >> 16) & 255)

    @pl.when(k == 0)
    def _init():
        hi_lo_ref[:] = jnp.zeros_like(hi_lo_ref)
        # Max block error 16*3*255^2 < 2^24: this sentinel guarantees the
        # first candidate's strict-less win (scan_best's incumbent).
        err_ref[:] = jnp.full_like(err_ref, 3.4e38)

    # --- phase select: write the step's candidate words into qsel ---
    @pl.when(k < n_steps_a)
    def _phase_a():
        qsel[:] = cand_ref[0]

    for r in range(_HQ_REFITS):
        @pl.when(k == n_steps_a + r)
        def _phase_b(r=r):
            # Refit 0 starts from the best-so-far words; refit 1 from the
            # previous refit's own output (cur), matching the XLA chain.
            words = hi_lo_ref[:] if r == 0 else cur[:]
            hi = words[0:1]
            lo = words[1:2]
            w1, w2 = _refit_q_words(src, hi, lo, flip)
            qsel[:] = jnp.concatenate([w1, w2], axis=0)

    for j in range(_HQ_PROBES):
        @pl.when(k == n_steps_a + _HQ_REFITS + j)
        def _phase_c(j=j):
            w1, w2 = _probe_q_words(qpack[0:1], qpack[1:2], j)
            qsel[:] = jnp.concatenate([w1, w2], axis=0)

    # --- one shared exact search on the selected bases ---
    q = qsel[:]
    q1_555, q2_555, q1_444, q2_444 = _unpack_q_words(q[0:1], q[1:2])
    hi, lo, err = _finish_from_q(src, q1_555, q2_555, q1_444, q2_444,
                                 flip, SMALLER_ERROR)
    errf = err.astype(jnp.float32)

    # Phase-B chaining state: cur advances to the refit candidate's OWN
    # words whether or not they beat the incumbent; the probes perturb the
    # SECOND refit's bases.
    @pl.when((k >= n_steps_a) & (k < n_steps_a + _HQ_REFITS))
    def _chain():
        cur[:] = jnp.concatenate([hi, lo], axis=0)

    @pl.when(k == n_steps_a + _HQ_REFITS - 1)
    def _save_probe_center():
        qpack[:] = q

    better = errf < err_ref[:]
    hi_lo_ref[:] = jnp.where(better, jnp.concatenate([hi, lo], axis=0),
                             hi_lo_ref[:])
    err_ref[:] = jnp.where(better, errf, err_ref[:])


def etc1_hq_search(words: jax.Array, cands: jax.Array, flip: bool,
                   interpret: bool = False):
    """Best-of over candidate base tuples + refits + probes for one flip.

    words: (16, N) uint32 packed pixels in the flip's subblock-contiguous
    row order (natural for flip=True, _PERM_F for flip=False).
    cands: (K, 2, N) uint32 packed base candidates (2 words per candidate,
    one per subblock; the leading axis keeps the (2, tile) block equal to
    the trailing array dims — Mosaic rejects a (2, tile) block over a
    (2K, N) array because 2 is neither 8-divisible nor the array extent).
    Returns (hi, lo, err): (N,) logical uint32 words + (N,) float32 exact
    block error. Candidate order = scan order = tie-break order, then 2
    alternating refits, then 24 ±1 probes (codecs.etc HQ families)."""
    n = words.shape[1]
    n_cand = cands.shape[0]
    tile = _tile_for(n)
    words = _pad_lanes(words, tile)
    pad = (-n) % tile
    if pad:
        cands = jnp.pad(cands, ((0, 0), (0, 0), (0, pad)))
    np_ = words.shape[1]
    n_steps = n_cand + _HQ_REFITS + _HQ_PROBES
    hi_lo, err = pl.pallas_call(
        partial(_etc1_hq_kernel, flip=flip, n_cand=n_cand),
        grid=(np_ // tile, n_steps),
        in_specs=[
            pl.BlockSpec((16, tile), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tile),
                         lambda i, k: (jnp.minimum(k, n_cand - 1), 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, tile), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, np_), jnp.uint32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tile), jnp.uint32),
            pltpu.VMEM((2, tile), jnp.uint32),
            pltpu.VMEM((2, tile), jnp.uint32),
        ],
        interpret=interpret,
    )(words, cands)
    return hi_lo[0, :n], hi_lo[1, :n], err[0, :n]
