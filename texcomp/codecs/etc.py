"""ETC1 block kernels.

Batched, jit-compiled re-design of the reference's per-block ETC1 codec
(image_compression/internal/etc_compressor.cc). The 64-bit block layout is
documented at etc_compressor.cc:41-69; blocks are handled as (hi, lo) uint32
word pairs on device (TPU has no VMEM-friendly uint64) and serialized to the
hardware byte order — big-endian hi word then big-endian lo word, exactly
what EtcHelper::BuildBlock produces on a little-endian host
(etc_compressor.cc:158-194) — at pack time.

The brute-force search (2 flips x 2 subblocks x 8 codewords x 8 pixels x
4 modifiers, etc_compressor.cc:350-409) vectorizes into dense VPU reductions
over a (N, 16, 8, 4) error tensor. All argmin selections use
first-occurrence tie-breaking, matching the strictly-less update scans.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from texcomp.core import colors as cc
from texcomp.core.constants import ETC1_CODEBOOK, ETC1_HEURISTIC_THRESHOLDS

# Strategy codes (etc_compressor.h:57-66); kept as ints for static dispatch.
SPLIT_HORIZONTALLY = 0
SPLIT_VERTICALLY = 1
SMALLER_ERROR = 2
HEURISTIC = 3

_U32 = jnp.uint32


def _codebook():
    return jnp.asarray(ETC1_CODEBOOK)  # (8, 4) int32


# Pixel p (row-major y*4+x) -> ETC order index x*4+y (etc_compressor.cc
# :131-137). Static permutation.
_P_ETC = np.array([(p % 4) * 4 + (p // 4) for p in range(16)], dtype=np.int32)
# x and y coordinates per row-major pixel position.
_PX = np.array([p % 4 for p in range(16)], dtype=np.int32)
_PY = np.array([p // 4 for p in range(16)], dtype=np.int32)


def words_to_bytes(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """(N,) uint32 word pairs -> (N, 8) uint8 in ETC1 hardware byte order
    (big-endian hi then big-endian lo; etc_compressor.cc:172-194)."""
    parts = [
        (hi >> 24) & _U32(0xFF), (hi >> 16) & _U32(0xFF),
        (hi >> 8) & _U32(0xFF), hi & _U32(0xFF),
        (lo >> 24) & _U32(0xFF), (lo >> 16) & _U32(0xFF),
        (lo >> 8) & _U32(0xFF), lo & _U32(0xFF),
    ]
    return jnp.stack(parts, axis=-1).astype(jnp.uint8)


def bytes_to_words(data: jax.Array):
    """(N, 8) uint8 -> (hi, lo) uint32 word pairs."""
    d = data.astype(_U32)
    hi = (d[:, 0] << 24) | (d[:, 1] << 16) | (d[:, 2] << 8) | d[:, 3]
    lo = (d[:, 4] << 24) | (d[:, 5] << 16) | (d[:, 6] << 8) | d[:, 7]
    return hi, lo


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _decode_base_colors(hi: jax.Array):
    """Base colors per subblock from the hi word (Etc1BlockDecoder,
    etc_compressor.cc:227-265). Returns (c1, c2) each a (r, g, b) tuple."""
    h = hi.astype(jnp.int32)
    diff = (h >> 1) & 1

    def bits(start, n):
        return (h >> start) & ((1 << n) - 1)

    # Differential mode: 555 base + sign-extended 333 delta, both extended
    # via Extend5Bit.
    b5 = (bits(27, 5), bits(19, 5), bits(11, 5))
    d3 = tuple(
        ((bits(s, 3) << 29) >> 29) for s in (24, 16, 8)
    )  # sign-extend 3-bit
    c1_diff = tuple(cc.extend_5bit(v) for v in b5)
    c2_diff = tuple(cc.extend_5bit(v + d) for v, d in zip(b5, d3))

    # Individual mode: 444 + 444, Extend4Bit.
    c1_ind = tuple(cc.extend_4bit(bits(s, 4)) for s in (28, 20, 12))
    c2_ind = tuple(cc.extend_4bit(bits(s, 4)) for s in (24, 16, 8))

    c1 = tuple(jnp.where(diff == 1, a, b) for a, b in zip(c1_diff, c1_ind))
    c2 = tuple(jnp.where(diff == 1, a, b) for a, b in zip(c2_diff, c2_ind))
    return c1, c2


@jax.jit
def decode_etc1_blocks(data: jax.Array) -> jax.Array:
    """Decode (N, 8) uint8 ETC1 blocks to (N, 16, 3) int32 pixels
    (DecodeBlock, etc_compressor.cc:282-289)."""
    hi, lo = bytes_to_words(data)
    h = hi.astype(jnp.int32)
    l = lo.astype(jnp.int32)

    flip = h & 1
    cw0 = (h >> 5) & 7  # first subblock codeword (etc_compressor.cc:235)
    cw1 = (h >> 2) & 7

    c1, c2 = _decode_base_colors(hi)

    # Pixel modifier index: bit p (low) and bit p+16 (high) of lo, ETC
    # column-major p = x*4+y (etc_compressor.cc:142-146).
    p = jnp.asarray(_P_ETC)  # (16,)
    idx = ((l[:, None] >> p[None, :]) & 1) | (
        (((l[:, None] >> (p[None, :] + 16)) & 1)) << 1
    )  # (N, 16)

    # Subblock membership: flip -> top 4x2 is first; else left 2x4
    # (etc_compressor.cc:206).
    px = jnp.asarray(_PX)[None, :]
    py = jnp.asarray(_PY)[None, :]
    is_first = jnp.where(flip[:, None] == 1, py < 2, px < 2)  # (N, 16)

    cw = jnp.where(is_first, cw0[:, None], cw1[:, None])  # (N, 16)
    modifier = _codebook()[cw, idx]  # (N, 16)

    out = []
    for ch1, ch2 in zip(c1, c2):
        base = jnp.where(is_first, ch1[:, None], ch2[:, None])
        out.append(cc.clamp8(base + modifier))
    return jnp.stack(out, axis=-1)  # (N, 16, 3)


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _subblock_mask(flip: bool):
    """(16,) bool: True for first-subblock pixels (row-major order)."""
    return (_PY < 2) if flip else (_PX < 2)


def _encode_one_flip(rgb: jax.Array, flip: bool, strategy: int,
                     rounding: str = "trunc"):
    """FindBestSubblockEncoding for a fixed flip (etc_compressor.cc:460-542).

    Returns (hi, lo, error): (N,) uint32 words + (N,) int32 cumulative error.

    ``rounding``: "trunc" reproduces the reference's shift quantization
    (QuantizeRgbFast, etc_compressor.cc:474-516); "round" uses Blinn
    round-exact quantization instead — a high-quality-mode candidate, NOT
    reference behavior.
    """
    n = rgb.shape[0]
    mask0 = jnp.asarray(_subblock_mask(flip))  # (16,)
    mask0f = mask0.astype(jnp.int32)[None, :]

    # Subblock truncating averages (ComputeAverageColor, :299-312).
    avg1 = []
    avg2 = []
    for ch in range(3):
        c = rgb[:, :, ch]
        avg1.append(jnp.sum(c * mask0f, axis=1) // 8)
        avg2.append(jnp.sum(c * (1 - mask0f), axis=1) // 8)

    if rounding == "round":
        q1_555 = [cc.quantize8(a, 5) for a in avg1]
        q2_555 = [cc.quantize8(a, 5) for a in avg2]
        q1_444 = [cc.quantize8(a, 4) for a in avg1]
        q2_444 = [cc.quantize8(a, 4) for a in avg2]
    else:
        q1_555 = [a >> 3 for a in avg1]
        q2_555 = [a >> 3 for a in avg2]
        q1_444 = [a >> 4 for a in avg1]
        q2_444 = [a >> 4 for a in avg2]
    return _finish_flip(rgb, flip, strategy,
                        q1_555, q2_555, q1_444, q2_444)


def _finish_flip(rgb: jax.Array, flip: bool, strategy: int,
                 q1_555, q2_555, q1_444, q2_444):
    """Mode decision, codeword/pixel-index search, and word packing for
    given quantized subblock bases (the tail of FindBestSubblockEncoding,
    etc_compressor.cc:480-542). Split from :func:`_encode_one_flip` so the
    HQ mode can evaluate perturbed base-color candidates through the exact
    same search and packer."""
    n = rgb.shape[0]
    mask0 = jnp.asarray(_subblock_mask(flip))  # (16,)
    mask0f = mask0.astype(jnp.int32)[None, :]
    d555 = [b - a for a, b in zip(q1_555, q2_555)]
    use_diff = jnp.ones(n, dtype=bool)
    for d in d555:
        use_diff &= (d >= -4) & (d <= 3)

    # Decoded palette base colors for the search (:496-516).
    dec1 = [
        jnp.where(use_diff, cc.extend_5bit(q5), cc.extend_4bit(q4))
        for q5, q4 in zip(q1_555, q1_444)
    ]
    dec2 = [
        jnp.where(use_diff, cc.extend_5bit(q5), cc.extend_4bit(q4))
        for q5, q4 in zip(q2_555, q2_444)
    ]

    # Per-pixel base color by subblock membership.
    base = jnp.stack(
        [
            jnp.where(mask0[None, :], d1[:, None], d2[:, None])
            for d1, d2 in zip(dec1, dec2)
        ],
        axis=-1,
    )  # (N, 16, 3)

    cb = _codebook()  # (8, 4)
    # Candidate colors and per-(pixel, codeword, modifier) errors.
    cand = cc.clamp8(base[:, :, None, None, :] + cb[None, None, :, :, None])
    diff = cand - rgb[:, :, None, None, :]
    err = jnp.sum(diff * diff, axis=-1)  # (N, 16, 8cw, 4mod)

    best_mod = jnp.argmin(err, axis=-1)  # (N, 16, 8) first occurrence
    best_err = jnp.min(err, axis=-1)  # (N, 16, 8)

    # Per-subblock cumulative error per codeword.
    err_sb1 = jnp.sum(best_err * mask0f[:, :, None], axis=1)  # (N, 8)
    err_sb2 = jnp.sum(best_err * (1 - mask0f)[:, :, None], axis=1)

    if strategy == HEURISTIC:
        # FindCodewordHeuristic (:415-455): codeword from the max-channel
        # mean absolute deviation, thresholds at :435-451.
        th = jnp.asarray(ETC1_HEURISTIC_THRESHOLDS)  # (7,)

        def heuristic_cw(decoded, mask):
            # The deviation is measured from the *decoded* subblock color
            # (FindCodewordHeuristic is called with decoded_color1/2,
            # etc_compressor.cc:524-527), not the raw average.
            dev_ch = []
            for ch in range(3):
                ad = jnp.abs(decoded[ch][:, None] - rgb[:, :, ch]) * mask
                dev_ch.append(jnp.sum(ad, axis=1) // 8)
            dev = jnp.maximum(jnp.maximum(dev_ch[0], dev_ch[1]), dev_ch[2])
            return jnp.sum(dev[:, None] > th[None, :], axis=1)  # (N,)

        cw1 = heuristic_cw(dec1, mask0f)
        cw2 = heuristic_cw(dec2, 1 - mask0f)
        e1 = jnp.take_along_axis(err_sb1, cw1[:, None], axis=1)[:, 0]
        e2 = jnp.take_along_axis(err_sb2, cw2[:, None], axis=1)[:, 0]
    else:
        # FindBestCodeword (:391-409): exhaustive, first-occurrence argmin.
        cw1 = jnp.argmin(err_sb1, axis=1)
        cw2 = jnp.argmin(err_sb2, axis=1)
        e1 = jnp.min(err_sb1, axis=1)
        e2 = jnp.min(err_sb2, axis=1)

    cumulative_error = e1 + e2

    # Pixel indices for the selected codeword of each pixel's subblock.
    cw_px = jnp.where(mask0[None, :], cw1[:, None], cw2[:, None])  # (N, 16)
    mod = jnp.take_along_axis(best_mod, cw_px[:, :, None], axis=2)[:, :, 0]

    # lo word: bit p = mod&1, bit p+16 = mod>>1, p in ETC order
    # (StorePixelIndex, :150-156). All word math in uint32 (JAX has no
    # 64-bit ints by default; the block is two 32-bit words anyway).
    p = jnp.asarray(_P_ETC, dtype=_U32)[None, :]
    modu = mod.astype(_U32)
    lo_bits = ((modu & _U32(1)) << p) | (((modu >> 1) & _U32(1)) << (p + _U32(16)))
    lo = jnp.bitwise_or.reduce(lo_bits, axis=1)

    # hi word assembly (:485-541).
    hi = jnp.full(n, _U32(1 if flip else 0), dtype=_U32)
    hi |= jnp.where(use_diff, _U32(2), _U32(0))

    def field(v, start, bits):
        return (v.astype(_U32) & _U32((1 << bits) - 1)) << start

    # Differential: base1 555 at 27/19/11, delta 333 at 24/16/8
    # (StoreDiffModeColors :328-337); individual: 444/444 at
    # 28/20/12 and 24/16/8 (StoreNormalModeColors :316-324).
    starts_diff1 = (27, 19, 11)
    starts_diff2 = (24, 16, 8)
    starts_ind1 = (28, 20, 12)
    starts_ind2 = (24, 16, 8)
    color_bits = jnp.zeros(n, dtype=_U32)
    for ch in range(3):
        diff_bits = field(q1_555[ch], starts_diff1[ch], 5) | field(
            d555[ch], starts_diff2[ch], 3
        )
        ind_bits = field(q1_444[ch], starts_ind1[ch], 4) | field(
            q2_444[ch], starts_ind2[ch], 4
        )
        color_bits |= jnp.where(use_diff, diff_bits, ind_bits)
    hi |= color_bits
    hi |= field(cw1, 5, 3) | field(cw2, 2, 3)

    return hi, lo, cumulative_error


def _heuristic_flip(rgb: jax.Array) -> jax.Array:
    """Per-block flip choice for kHeuristic (etc_compressor.cc:553-574).

    Note sum4 reuses pixel (2,2) and omits (3,3) — replicated verbatim
    (etc_compressor.cc:563-564). Returns (N,) bool: True -> flipped (tb).
    """

    def quad(ps):
        return [
            sum(rgb[:, p, ch] for p in ps) for ch in range(3)
        ]  # list of 3 (N,)

    pos = lambda y, x: y * 4 + x
    sum1 = quad([pos(0, 0), pos(0, 1), pos(1, 0), pos(1, 1)])
    sum2 = quad([pos(2, 0), pos(2, 1), pos(3, 0), pos(3, 1)])
    sum3 = quad([pos(0, 2), pos(0, 3), pos(1, 2), pos(1, 3)])
    sum4 = quad([pos(2, 2), pos(2, 3), pos(3, 2), pos(2, 2)])  # (2,2) twice!

    left = [cc.div_trunc(a + b, 8) for a, b in zip(sum1, sum2)]
    right = [cc.div_trunc(a + b, 8) for a, b in zip(sum3, sum4)]
    top = [cc.div_trunc(a + b, 8) for a, b in zip(sum1, sum3)]
    bottom = [cc.div_trunc(a + b, 8) for a, b in zip(sum2, sum4)]

    def err3(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    # flip=False (lr) iff err(left,right) > err(top,bottom); else flipped.
    return ~(err3(left, right) > err3(top, bottom))


@partial(jax.jit, static_argnames=("strategy",))
def encode_etc1_blocks(rgb: jax.Array, strategy: int = SMALLER_ERROR) -> jax.Array:
    """Encode (N, 16, 3) int32 pixel blocks to (N, 8) uint8 ETC1 blocks
    (EncodeEtc1Block, etc_compressor.cc:545-586)."""
    if strategy == SPLIT_HORIZONTALLY:
        hi, lo, _ = _encode_one_flip(rgb, True, strategy)
    elif strategy == SPLIT_VERTICALLY:
        hi, lo, _ = _encode_one_flip(rgb, False, strategy)
    elif strategy == HEURISTIC:
        hi_f, lo_f, _ = _encode_one_flip(rgb, False, strategy)
        hi_t, lo_t, _ = _encode_one_flip(rgb, True, strategy)
        flip = _heuristic_flip(rgb)
        hi = jnp.where(flip, hi_t, hi_f)
        lo = jnp.where(flip, lo_t, lo_f)
    else:  # SMALLER_ERROR: lr wins ties (etc_compressor.cc:583).
        hi_f, lo_f, err_f = _encode_one_flip(rgb, False, strategy)
        hi_t, lo_t, err_t = _encode_one_flip(rgb, True, strategy)
        take_lr = err_f <= err_t
        hi = jnp.where(take_lr, hi_f, hi_t)
        lo = jnp.where(take_lr, lo_f, lo_t)
    return words_to_bytes(hi, lo)


def _refit_bases(rgb: jax.Array, flip: bool, hi: jax.Array, lo: jax.Array):
    """Least-squares subblock bases for a packed candidate's modifiers.

    For fixed per-pixel modifiers m (the candidate's chosen codeword +
    pixel indices, extracted from the words), the unclamped optimal base
    per (subblock, channel) is mean(pixel - m). Returns (q1_555, q2_555,
    q1_444, q2_444) ready for :func:`_finish_flip`, which re-searches
    codewords and indices exhaustively — one alternating-optimization
    round."""
    h = hi.astype(jnp.int32)
    l = lo.astype(jnp.int32)
    cw1 = (h >> 5) & 7
    cw2 = (h >> 2) & 7
    p = jnp.asarray(_P_ETC)
    idx = ((l[:, None] >> p[None, :]) & 1) | (
        ((l[:, None] >> (p[None, :] + 16)) & 1) << 1
    )  # (N, 16)
    mask0 = jnp.asarray(_subblock_mask(flip))
    cw_px = jnp.where(mask0[None, :], cw1[:, None], cw2[:, None])
    m = _codebook()[cw_px, idx]  # (N, 16)

    mask0f = mask0.astype(jnp.float32)[None, :]
    q1_555, q2_555, q1_444, q2_444 = [], [], [], []
    for ch in range(3):
        resid = (rgb[:, :, ch] - m).astype(jnp.float32)
        b1 = jnp.clip(jnp.round(jnp.sum(resid * mask0f, axis=1) / 8.0),
                      0, 255).astype(jnp.int32)
        b2 = jnp.clip(jnp.round(jnp.sum(resid * (1 - mask0f), axis=1) / 8.0),
                      0, 255).astype(jnp.int32)
        q1_555.append(cc.quantize8(b1, 5))
        q2_555.append(cc.quantize8(b2, 5))
        q1_444.append(cc.quantize8(b1, 4))
        q2_444.append(cc.quantize8(b2, 4))
    return q1_555, q2_555, q1_444, q2_444


def _cluster_fit_bases(rgb: jax.Array, flip: bool, iters: int = 2,
                       extra_seeds=()):
    """Joint-assignment (cluster-fit) base candidates for the HQ search.

    For EACH of the 8 codewords, alternate (a) exact per-pixel modifier
    assignment against the current real-valued bases (clamped squared-RGB
    error, the decoder's arithmetic) and (b) the least-squares base refit
    mean(pixel - modifier) per subblock — i.e. indices and bases are
    re-solved *jointly* per codeword, where :func:`_refit_bases` only
    refits the incumbent's codeword choice. Two seeds per codeword: the
    subblock mean, and a 2-means luminance split (midpoint of the
    below/above-mean cluster centroids — centers the modifier ladder on
    bimodal subblocks the mean seed misses).

    The converged (base1, base2) pair of each (codeword, seed) is scored
    cheaply with that codeword's own clamped error, and only the best and
    runner-up pairs per seed survive to the exact :func:`_finish_flip`
    scorer (quantization can reorder near-ties, hence two). Returns a
    list of quantized base tuples for `_finish_flip`.
    """
    mask0 = jnp.asarray(_subblock_mask(flip))           # (16,)
    m0 = mask0.astype(jnp.float32)[None, :]             # (1, 16)
    m1 = 1.0 - m0
    rgbf = rgb.astype(jnp.float32)                      # (N, 16, 3)
    cb = _codebook().astype(jnp.float32)                # (8, 4)

    mean1 = jnp.sum(rgbf * m0[:, :, None], axis=1) / 8.0    # (N, 3)
    mean2 = jnp.sum(rgbf * m1[:, :, None], axis=1) / 8.0

    # EXACT cross-backend arithmetic (tools/tpu_parity_smoke.py): the
    # split seed runs in int32 — luminance as the x3 channel sum, the
    # above/below split by cross-multiplied integer compare, and the
    # centroid midpoint rounded to exact eighths via integer
    # round-half-up — so the seeds (like the mean seeds, which are /8
    # sums) are exact f32 eighths. From eighths-valued seeds every
    # downstream product in `assign` stays <= 2^24 with 1/64 fractions,
    # i.e. exact, and the whole alternation is backend-independent
    # (fractional divides here were CPU-vs-TPU ulp-divergent).
    lum3 = jnp.sum(rgb, axis=2).astype(jnp.int32)       # (N, 16) x3 lum
    mask0i = mask0.astype(jnp.int32)[None, :]
    m1i = 1 - mask0i

    def split_seed(maski):
        slum = jnp.sum(lum3 * maski, axis=1, keepdims=True)  # x24 mean
        hi_m = ((8 * lum3 >= slum) & (maski == 1)).astype(jnp.int32)
        lo_m = maski - hi_m
        hi_n = jnp.maximum(jnp.sum(hi_m, axis=1), 1)    # (N,)
        lo_n = jnp.maximum(jnp.sum(lo_m, axis=1), 1)
        s_hi = jnp.sum(rgb * hi_m[:, :, None], axis=1)  # (N, 3) int
        s_lo = jnp.sum(rgb * lo_m[:, :, None], axis=1)
        # midpoint (s_hi/hi_n + s_lo/lo_n)/2 rounded half-up to eighths:
        # a/b with a = 8*(s_hi*lo_n + s_lo*hi_n), b = 2*hi_n*lo_n, all
        # exact int32 (|a| <= 8*2*2040*8 = 261120).
        a = 8 * (s_hi * lo_n[:, None] + s_lo * hi_n[:, None])
        b = 2 * (hi_n * lo_n)[:, None]
        eighths = (2 * a + b) // (2 * b)
        return eighths.astype(jnp.float32) / 8.0

    seeds = [(mean1, mean2), (split_seed(mask0i), split_seed(m1i))]
    if extra_seeds:
        seeds += list(extra_seeds)

    def assign(b1, b2, mods):
        """Per-pixel best modifier values + residual error for bases."""
        base_px = jnp.where(mask0[None, :, None],
                            b1[:, None, :], b2[:, None, :])  # (N, 16, 3)
        cand = jnp.clip(
            base_px[:, :, None, :] + mods[None, None, :, None], 0.0, 255.0)
        d = cand - rgbf[:, :, None, :]
        e = jnp.sum(d * d, axis=-1)                     # (N, 16, 4)
        m = mods[jnp.argmin(e, axis=-1)]                # (N, 16)
        return m, jnp.sum(jnp.min(e, axis=-1), axis=1)  # (N, 16), (N,)

    out = []
    for b1_0, b2_0 in seeds:
        best = None   # (err, b1, b2) running keep-best over codewords
        second = None
        for cw in range(8):
            mods = cb[cw]
            b1, b2 = b1_0, b2_0
            for _ in range(iters):
                m, _ = assign(b1, b2, mods)
                resid = rgbf - m[:, :, None]
                b1 = jnp.clip(jnp.sum(resid * m0[:, :, None], axis=1) / 8.0,
                              0.0, 255.0)
                b2 = jnp.clip(jnp.sum(resid * m1[:, :, None], axis=1) / 8.0,
                              0.0, 255.0)
            _, e = assign(b1, b2, mods)
            if best is None:
                # second's error starts at +inf, NOT codeword 0's: with a
                # copy-init, any block whose first codeword stays the
                # winner would keep second == best forever (the `mid`
                # test can never beat it) and the runner-up candidate
                # would duplicate the winner.
                best = (e, b1, b2)
                second = (jnp.full_like(e, jnp.inf), b1, b2)
            else:
                def sel(cond, x, y):
                    return jnp.where(
                        cond.reshape(cond.shape + (1,) * (x.ndim - 1)), x, y)

                better = e < best[0]
                mid = e < second[0]
                second = tuple(
                    sel(better, bv, sel(mid, nv, sv))
                    for bv, nv, sv in zip(best, (e, b1, b2), second))
                best = tuple(sel(better, nv, bv)
                             for nv, bv in zip((e, b1, b2), best))
        for _, b1, b2 in (best, second):
            r1 = [jnp.round(b1[:, ch]).astype(jnp.int32) for ch in range(3)]
            r2 = [jnp.round(b2[:, ch]).astype(jnp.int32) for ch in range(3)]
            out.append(([cc.quantize8(v, 5) for v in r1],
                        [cc.quantize8(v, 5) for v in r2],
                        [cc.quantize8(v, 4) for v in r1],
                        [cc.quantize8(v, 4) for v in r2]))
    return out


def _cluster_fit_enum_bases(rgb: jax.Array, flip: bool, top: int = 2):
    """Exhaustive cluster-fit: globally optimal (unclamped) joint solve.

    For a fixed codeword with sorted modifiers v0<=v1<=v2<=v3, the
    unclamped-LS-optimal assignment of a subblock's 8 pixels to modifiers
    is monotone in pixel luminance, so every candidate assignment is a
    contiguous partition of the luminance-sorted pixels — C(11,3) = 165
    partitions. For each (partition, codeword) the LS base is
    mean(p) - mean(m) and the error reduces to
    ``SSp + 3*sum((m-mu)^2) - 2*sum(t*m)`` with t the centered 3-channel
    luminance; via prefix sums T of sorted t, ``sum(t*m)`` is
    ``(a-b)(T[p1]+T[p3]) - 2a*T[p2]`` — three gathers and a handful of
    static constants per candidate. The ``top`` best (partition, codeword)
    pairs per subblock yield quantized base tuples for
    :func:`_finish_flip`, which re-scores exactly (with clamping).
    """
    idx1 = np.where(np.asarray(_subblock_mask(flip)))[0]
    idx2 = np.where(~np.asarray(_subblock_mask(flip)))[0]
    rgbf = rgb.astype(jnp.float32)
    cb = np.asarray(ETC1_CODEBOOK)                  # (8, 4): [a, b, -a, -b]
    a_cw = cb[:, 0].astype(np.float32)
    b_cw = cb[:, 1].astype(np.float32)

    # Static partition tables: cuts 0 <= p1 <= p2 <= p3 <= 8.
    parts = np.array([(p1, p2, p3)
                      for p1 in range(9)
                      for p2 in range(p1, 9)
                      for p3 in range(p2, 9)], dtype=np.int32)  # (165, 3)
    n0 = parts[:, 0].astype(np.float32)
    n1 = (parts[:, 1] - parts[:, 0]).astype(np.float32)
    n2 = (parts[:, 2] - parts[:, 1]).astype(np.float32)
    n3 = 8.0 - parts[:, 2].astype(np.float32)
    # Ascending modifiers [-b, -a, a, b] per codeword.
    sum_m = (-b_cw[None, :] * n0[:, None] - a_cw[None, :] * n1[:, None]
             + a_cw[None, :] * n2[:, None] + b_cw[None, :] * n3[:, None])
    sum_m2 = (a_cw[None, :] ** 2 * (n1 + n2)[:, None]
              + b_cw[None, :] ** 2 * (n0 + n3)[:, None])
    mu = sum_m / 8.0                                 # (165, 8)
    const = 3.0 * sum_m2 - 24.0 * mu * mu            # (165, 8)
    const_j = jnp.asarray(const.reshape(1, -1))      # (1, 1320)
    mu_j = jnp.asarray(mu.reshape(-1))               # (1320,)
    coef13 = jnp.asarray((a_cw - b_cw))              # * (T1 + T3)
    coef2 = jnp.asarray(-2.0 * a_cw)                 # * T2

    def subblock(idx):
        px = rgbf[:, idx, :]                         # (N, 8, 3)
        mean_ch = jnp.mean(px, axis=1)               # (N, 3)
        t = jnp.sum(px - mean_ch[:, None, :], axis=2)  # (N, 8) centered
        ts = jnp.sort(t, axis=1)
        T = jnp.concatenate(
            [jnp.zeros((t.shape[0], 1), jnp.float32), jnp.cumsum(ts, axis=1)],
            axis=1)                                  # (N, 9)
        G13 = T[:, parts[:, 0]] + T[:, parts[:, 2]]  # (N, 165)
        G2 = T[:, parts[:, 1]]
        tm = (G13[:, :, None] * coef13[None, None, :]
              + G2[:, :, None] * coef2[None, None, :])  # (N, 165, 8)
        e0 = const_j - 2.0 * tm.reshape(tm.shape[0], -1)  # (N, 1320)
        e = e0
        bases = []
        for _ in range(top):
            k = jnp.argmin(e, axis=1)                # (N,)
            base = mean_ch - mu_j[k][:, None]        # (N, 3)
            bases.append(jnp.clip(base, 0.0, 255.0))
            e = jnp.where(jax.nn.one_hot(k, e.shape[1], dtype=bool),
                          jnp.inf, e)
        return bases, e0, mean_ch

    bases1, e1, mean1 = subblock(idx1)
    bases2, e2, mean2 = subblock(idx2)
    out = []
    real = []
    for s1, s2 in zip(bases1, bases2):
        real.append((s1, s2))
        r1 = [jnp.round(s1[:, ch]).astype(jnp.int32) for ch in range(3)]
        r2 = [jnp.round(s2[:, ch]).astype(jnp.int32) for ch in range(3)]
        out.append(([cc.quantize8(v, 5) for v in r1],
                    [cc.quantize8(v, 5) for v in r2],
                    [cc.quantize8(v, 4) for v in r1],
                    [cc.quantize8(v, 4) for v in r2]))

    # Diff-constrained picks: when the two unconstrained winners land >4
    # code points apart, _finish_flip silently falls back to the coarse
    # 444 individual mode. Re-run the (partition, codeword) argmin for
    # each subblock with the OTHER subblock's winner fixed and an exact
    # quadratic penalty for bases outside the 555 diff window — for a
    # fixed assignment, error(b) = error(b_opt) + 8*sum_ch(b - b_opt)^2,
    # so the penalized argmin is the true constrained optimum over
    # contiguous partitions. The resulting diff-feasible pairs unlock
    # diff mode on blocks the unconstrained enum forces individual.
    def constrained(e, mean_ch, other_codes, lo_off, hi_off):
        pen = 0.0
        windows = []
        for ch in range(3):
            lo_c = jnp.clip(other_codes[ch] + lo_off, 0, 31)
            hi_c = jnp.clip(other_codes[ch] + hi_off, 0, 31)
            lo_v = (lo_c * 8).astype(jnp.float32)[:, None]
            hi_v = (hi_c * 8 + 7).astype(jnp.float32)[:, None]
            b_opt = mean_ch[:, ch:ch + 1] - mu_j[None, :]   # (N, 1320)
            d = (jnp.maximum(lo_v - b_opt, 0.0)
                 + jnp.maximum(b_opt - hi_v, 0.0))
            pen = pen + d * d
            windows.append((lo_c, hi_c, lo_v[:, 0], hi_v[:, 0]))
        k = jnp.argmin(e + 8.0 * pen, axis=1)
        q555, q444 = [], []
        for ch, (lo_c, hi_c, lo_v, hi_v) in enumerate(windows):
            b = jnp.clip(mean_ch[:, ch] - mu_j[k], lo_v, hi_v)
            r = jnp.round(b).astype(jnp.int32)
            # Post-quantize clamp keeps the pair diff-feasible even when
            # Blinn rounding crosses the window edge.
            q555.append(jnp.clip(cc.quantize8(r, 5), lo_c, hi_c))
            q444.append(cc.quantize8(r, 4))
        return q555, q444

    q1w_555, q2w_555, q1w_444, q2w_444 = out[0]
    q2c_555, q2c_444 = constrained(e2, mean2, q1w_555, -4, 3)
    out.append((q1w_555, q2c_555, q1w_444, q2c_444))
    q1c_555, q1c_444 = constrained(e1, mean1, q2w_555, -3, 4)
    out.append((q1c_555, q2w_555, q1c_444, q2w_444))
    return out, real


def _neighborhood_qs(q, spaces):
    """±1 probes per (subblock, channel) of the quantized bases
    q = (q1_555, q2_555, q1_444, q2_444), in the given spaces
    ("555" and/or "444"); one base tuple per probe."""
    out = []
    for sb in (0, 1):
        for ch in range(3):
            for d in (-1, 1):
                if "555" in spaces:
                    p1, p2 = list(q[0]), list(q[1])
                    (p1 if sb == 0 else p2)[ch] = jnp.clip(
                        (p1 if sb == 0 else p2)[ch] + d, 0, 31)
                    out.append((p1, p2, q[2], q[3]))
                if "444" in spaces:
                    f1, f2 = list(q[2]), list(q[3])
                    (f1 if sb == 0 else f2)[ch] = jnp.clip(
                        (f1 if sb == 0 else f2)[ch] + d, 0, 15)
                    out.append((q[0], q[1], f1, f2))
    return out


def _hq_base_candidates(rgb: jax.Array, flip: bool):
    """The ordered phase-A candidate base tuples of the HQ search
    (families 1-3 and 5 of :func:`encode_etc1_hq_blocks`; the refits and
    final probes are sequential phases). Order IS the tie-break order.
    Returns a list of (q1_555, q2_555, q1_444, q2_444) 3-list tuples."""
    mask0f = jnp.asarray(_subblock_mask(flip)).astype(jnp.int32)[None, :]
    avg1, avg2 = [], []
    for ch in range(3):
        c = rgb[:, :, ch]
        avg1.append(jnp.sum(c * mask0f, axis=1) // 8)
        avg2.append(jnp.sum(c * (1 - mask0f), axis=1) // 8)

    q1t = ([a >> 3 for a in avg1], [a >> 4 for a in avg1])
    q2t = ([a >> 3 for a in avg2], [a >> 4 for a in avg2])
    q1r = ([cc.quantize8(a, 5) for a in avg1],
           [cc.quantize8(a, 4) for a in avg1])
    q2r = ([cc.quantize8(a, 5) for a in avg2],
           [cc.quantize8(a, 4) for a in avg2])

    qs = [(q1t[0], q2t[0], q1t[1], q2t[1]),
          (q1r[0], q2r[0], q1r[1], q2r[1])]

    # Clamped-delta candidates: when a channel delta falls outside
    # differential mode's [-4, 3], the reference drops to 444+444
    # individual mode for the whole block. Clamping one base toward
    # the other keeps 555 precision on both subblocks — a candidate
    # the reference never tries (the 444 halves still compete via the
    # families above).
    q2c = [jnp.clip(b, a - 4, a + 3) for a, b in zip(q1r[0], q2r[0])]
    q1c = [jnp.clip(a, b - 3, b + 4) for a, b in zip(q1r[0], q2r[0])]
    qs.append((q1r[0], q2c, q1r[1], q2r[1]))
    qs.append((q1c, q2r[0], q1r[1], q2r[1]))

    qs += _neighborhood_qs((q1r[0], q2r[0], q1r[1], q2r[1]),
                           ("555", "444"))

    # 5. Joint-assignment (cluster-fit) candidates: per-codeword
    #    alternating reassign + LS refit from two seeds (subblock mean,
    #    2-means luminance split); best + runner-up pairs per seed.
    q_enum, real_enum = _cluster_fit_enum_bases(rgb, flip)
    # Clamp-aware alternating refinement additionally seeded from the
    # enum winner's real-valued bases (the enum score ignores the
    # [0, 255] clamp; the alternation's exact assignment restores it).
    qs += _cluster_fit_bases(rgb, flip, extra_seeds=real_enum[:1])
    qs += q_enum
    # Clamped-delta variants of the enum winner (same 555-preserving
    # move as family 2's, centered on the joint optimum). A ±1
    # neighborhood around the enum winner was tried and rejected:
    # +0.01-0.03 dB for 24 finish calls per flip.
    eq1, eq2 = q_enum[0][0], q_enum[0][1]
    e2c = [jnp.clip(b, a - 4, a + 3) for a, b in zip(eq1, eq2)]
    e1c = [jnp.clip(a, b - 3, b + 4) for a, b in zip(eq1, eq2)]
    qs.append((eq1, e2c, q_enum[0][2], q_enum[0][3]))
    qs.append((e1c, eq2, q_enum[0][2], q_enum[0][3]))
    return qs


def _encode_etc1_hq_blocks_pallas(rgb: jax.Array,
                                  interpret: bool = False,
                                  pixel_words=None) -> jax.Array:
    """Device path of :func:`encode_etc1_hq_blocks`: candidate bases are
    generated in XLA (cheap — 1.6 ms total at 512^2), then ONE Pallas
    kernel per flip scores every candidate, runs the two alternating
    refits, and probes the ±1 neighborhood with the pixel planes resident
    in VMEM (the XLA _finish_flip route materializes an (N, 16, 8, 4)
    error tensor in HBM per candidate: 550 ms at 512^2 for the ~66
    candidates per flip, tools/profile_hq_stages.py). ``pixel_words``:
    optional (16, N) uint32 packed pixels (pack_rgb_image layout) to
    skip the repack + transpose."""
    from texcomp.ops import etc_pallas as ep

    if pixel_words is None:
        px = (rgb[:, :, 0].astype(jnp.uint32)
              | (rgb[:, :, 1].astype(jnp.uint32) << 8)
              | (rgb[:, :, 2].astype(jnp.uint32) << 16))  # (N, 16)
        pixel_words = px.T
    words_nat = pixel_words  # (16, N)
    words_perm = words_nat[np.asarray(ep._PERM_F), :]

    best = None
    for flip in (False, True):
        qs = _hq_base_candidates(rgb, flip)
        cands = jnp.stack(
            [jnp.stack([ep._pack_q_word(q[0], q[2]),    # subblock 1
                        ep._pack_q_word(q[1], q[3])])   # subblock 2
             for q in qs], axis=0)  # (K, 2, N)
        hi, lo, err = ep.etc1_hq_search(
            words_nat if flip else words_perm, cands, flip,
            interpret=interpret)
        if best is None:
            best = (hi, lo, err)
        else:
            better = err < best[2]
            best = (jnp.where(better, hi, best[0]),
                    jnp.where(better, lo, best[1]),
                    jnp.where(better, err, best[2]))
    return words_to_bytes(best[0], best[1])


@jax.jit
def encode_etc1_hq_blocks(rgb: jax.Array) -> jax.Array:
    """High-quality ETC1 encode (EXTENSION — beats the reference encoder).

    Five candidate families, all scored by the exhaustive codeword
    search's true squared-RGB error (so the min-select is exact) and all
    packing standard ETC1 words:

      1. The reference's truncating quantization (QuantizeRgbFast shifts,
         etc_compressor.cc:474-516) for both flips — including these makes
         the result provably never worse per block.
      2. Blinn round-exact quantization for both flips (the truncation
         biases base colors low by up to 7 (555) / 15 (444) code points).
      3. A ±1 code-point neighborhood around the round-exact bases: each
         (subblock, channel) perturbed independently in 555 space and in
         444 space. The subblock average is the least-squares base only if
         the codeword modifiers were zero-mean; in truth the best base
         often sits one code point off per channel — freedom the shared
         luminance modifier cannot express. (+0.25-0.4 dB on photos over
         families 1-2 alone.)
      4. Two alternating-refit rounds per flip: refit the bases by least
         squares against the incumbent winner's chosen modifiers
         (:func:`_refit_bases`), then re-run the exhaustive search on the
         refit bases. Captures multi-code-point base shifts the ±1
         neighborhood cannot reach.
      5. Joint-assignment (cluster-fit) families
         (:func:`_cluster_fit_enum_bases` — the exhaustive
         contiguous-partition solve with top-2, diff-window-constrained,
         and clamped-delta variants — and :func:`_cluster_fit_bases`,
         the clamp-aware alternating reassign/refit from mean,
         2-means-split, and enum-winner seeds). (+0.3-0.4 dB over
         families 1-4; gains measured at +1.17-1.71 dB total on the
         bundled photos, QUALITY.md.)
    """
    from texcomp import ops as _ops

    if _ops.use_pallas():
        return _encode_etc1_hq_blocks_pallas(rgb)

    return _encode_etc1_hq_blocks_xla(rgb)


@jax.jit
def encode_etc1_hq_image(image: jax.Array) -> jax.Array:
    """(H, W, 3) uint8 (H, W multiples of 4) -> (N, 8) uint8 HQ ETC1
    blocks — byte-identical to encode_etc1_hq_blocks(image_to_blocks(im))
    but block extraction runs as pack-to-u32 + one 2-D 32-bit transpose
    instead of the generic 5-D int32 transpose (~18 ms fused at 512^2,
    tools/profile_etc_hq_scale.py), and the packed words feed the Pallas
    search kernel directly."""
    from texcomp import ops as _ops
    from texcomp.blocks import blocks_from_packed_words
    from texcomp.ops.dxt_pallas import pack_rgb_image

    words = pack_rgb_image(image)  # (16, N)
    rgb = blocks_from_packed_words(words, 3)
    if _ops.use_pallas():
        return _encode_etc1_hq_blocks_pallas(rgb, pixel_words=words)
    return _encode_etc1_hq_blocks_xla(rgb)


def _encode_etc1_hq_blocks_xla(rgb: jax.Array) -> jax.Array:
    """CPU/XLA path of :func:`encode_etc1_hq_blocks`."""
    best = None
    for flip in (False, True):
        def finish(q1_555, q2_555, q1_444, q2_444, flip=flip):
            return _finish_flip(rgb, flip, SMALLER_ERROR,
                                q1_555, q2_555, q1_444, q2_444)

        def scan_best(qs, incumbent, flip=flip):
            """Strict-less best-of over candidate base tuples via ONE
            lax.scan — one _finish_flip instance in the compiled graph
            instead of len(qs). Candidate ORDER is the scan order, so
            first-occurrence tie-breaking matches the unrolled loop this
            replaces (the unrolled form compiled ~66 _finish_flip copies
            per flip: 88 s XLA compile at N=256 on CPU)."""
            stacked = jnp.stack(
                [jnp.stack([*q[0], *q[1], *q[2], *q[3]]) for q in qs]
            )  # (K, 12, N) int32

            def body(carry, qrow):
                cand = _finish_flip(
                    rgb, flip, SMALLER_ERROR,
                    [qrow[0], qrow[1], qrow[2]],
                    [qrow[3], qrow[4], qrow[5]],
                    [qrow[6], qrow[7], qrow[8]],
                    [qrow[9], qrow[10], qrow[11]],
                )
                hi, lo, err = carry
                h2, l2, e2 = cand
                better = e2 < err
                return (jnp.where(better, h2, hi),
                        jnp.where(better, l2, lo),
                        jnp.where(better, e2, err)), None

            if incumbent is None:
                n = rgb.shape[0]
                # Max block error is 16*3*255^2 < 2^24, so this sentinel
                # guarantees the first candidate's strict-less win.
                incumbent = (jnp.zeros(n, _U32), jnp.zeros(n, _U32),
                             jnp.full(n, jnp.iinfo(jnp.int32).max,
                                      jnp.int32))
            out, _ = jax.lax.scan(body, incumbent, stacked)
            return out

        hi, lo, err = scan_best(_hq_base_candidates(rgb, flip), None)

        # Alternating refit: LS bases from the incumbent's modifiers, then
        # a fresh exhaustive search. The refit output (not the incumbent)
        # seeds the next round so the second iteration explores the new
        # assignment; the keep-best select protects against regressions.
        # (Sequential dependence — stays unrolled: 2 copies.)
        cur_hi, cur_lo = hi, lo
        q = None
        for _ in range(2):
            q = _refit_bases(rgb, flip, cur_hi, cur_lo)
            h2, l2, e2 = finish(*q)
            better = e2 < err
            hi = jnp.where(better, h2, hi)
            lo = jnp.where(better, l2, lo)
            err = jnp.where(better, e2, err)
            cur_hi, cur_lo = h2, l2

        # ±1 neighborhood around the final refit bases in both quantized
        # spaces (the LS optimum rounds each channel independently; the
        # joint best often sits one code point off — same reasoning as
        # family 3, but centered on the refit instead of the subblock
        # average). +0.08 dB on photos for 24 extra candidates per flip.
        hi, lo, err = scan_best(_neighborhood_qs(q, ("555", "444")),
                                (hi, lo, err))

        if best is None:
            best = (hi, lo, err)
        else:
            better = err < best[2]
            best = (jnp.where(better, hi, best[0]),
                    jnp.where(better, lo, best[1]),
                    jnp.where(better, err, best[2]))

    return words_to_bytes(best[0], best[1])


# ---------------------------------------------------------------------------
# Solid blocks, pads, transcode building blocks
# ---------------------------------------------------------------------------


def create_solid_block_bytes(r: int, g: int, b: int) -> np.ndarray:
    """CreateSolidBlock (etc_compressor.cc:595-617): differential mode,
    555-quantized color, zero delta, codeword 0, all pixel indices 0.
    (The adjusted_color computed at :601-603 is unused in the reference —
    quantization uses the raw color at :608.)"""
    hi = 0
    hi |= 2  # diff bit
    for v, start in ((r >> 3, 27), (g >> 3, 19), (b >> 3, 11)):
        hi |= (v & 0x1F) << start
    # codewords 0; lo = 0
    return np.array(
        [(hi >> 24) & 0xFF, (hi >> 16) & 0xFF, (hi >> 8) & 0xFF, hi & 0xFF,
         0, 0, 0, 0],
        dtype=np.uint8,
    )


def _replicate_and_encode(data: np.ndarray, take: str, strategy: int) -> np.ndarray:
    """Shared body of the ETC pad functors (etc_compressor.cc:645-698):
    decode, replicate the last column/row across the block, re-encode."""
    pixels = np.asarray(decode_etc1_blocks(jnp.asarray(data)))  # (M, 16, 3)
    grid = pixels.reshape(-1, 4, 4, 3)
    if take == "column":
        grid = np.repeat(grid[:, :, 3:4, :], 4, axis=2)
    else:  # row
        grid = np.repeat(grid[:, 3:4, :, :], 4, axis=1)
    blocks = jnp.asarray(grid.reshape(-1, 16, 3).astype(np.int32))
    return np.asarray(encode_etc1_blocks(blocks, strategy))


def etc_column_pad_blocks(data: np.ndarray, strategy: int) -> np.ndarray:
    return _replicate_and_encode(data, "column", strategy)


def etc_row_pad_blocks(data: np.ndarray, strategy: int) -> np.ndarray:
    return _replicate_and_encode(data, "row", strategy)


def etc_corner_pad_blocks(data: np.ndarray) -> np.ndarray:
    """EtcGetCornerPadBlock (etc_compressor.cc:693-698): solid block from
    the decoded corner pixel."""
    pixels = np.asarray(decode_etc1_blocks(jnp.asarray(data)))
    out = np.zeros((data.shape[0], 8), dtype=np.uint8)
    for i in range(data.shape[0]):
        r, g, b = pixels[i, 15]
        out[i] = create_solid_block_bytes(int(r), int(g), int(b))
    return out
