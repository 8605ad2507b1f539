"""TPU-fast PVRTC 2BPP encode: gather-free, block-plane layout.

Produces bytes identical to texcomp.codecs.pvrtc (which is byte-identical
to the C++ reference); the difference is purely mechanical:

  * pixels live in a (32, NB) block-plane layout (pixel position on
    sublanes, blocks on lanes) built with the fast two-stage 32-bit
    transpose (see ops/dxt_pallas._block_transpose_u32);
  * per-block argmin/argmax use iota-mask reductions instead of
    take_along_axis gathers;
  * the bilinear wrap-around upscale exploits the fact that for a fixed
    in-block pixel position both the corner choice and the weights are
    static: corners come from jnp.roll'ed copies of the low-res A/B images
    selected by per-sublane masks — no per-pixel gather at all;
  * modulation-mode neighbor counts use sublane shifts + jnp.roll for the
    block-boundary wrap.

Everything is plain XLA; it fuses into a handful of full-width VPU loops.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from texcomp.codecs.pvrtc import (
    BLOCK_H,
    BLOCK_W,
    _apply_bit_depth_reduction,
    zorder_block_permutation,
)
from texcomp.ops.dxt_pallas import _pad_lanes, _tile_for

_U32 = jnp.uint32
_ZTILE = 1024


@lru_cache(maxsize=None)
def _zorder_tiles(nbx: int, nby: int):
    """Tile decomposition of the Z-order permutation.

    The low 10 Morton bits address a fixed-shape tile (32x32 blocks for
    square-ish grids), identically laid out for every tile: Z-order then
    factors into (a) a coarse reorder of whole tiles and (b) ONE shared
    within-tile permutation. (a) is a few hundred contiguous row copies;
    (b) runs as a one-hot bf16 matmul on the MXU over byte planes (exact
    for bytes) — ~25x faster than an element gather at 4096^2, where
    TPU random access costs ~10 ns/element.

    Returns (tile_order, th, tw, one_hot) or None when the grid is too
    small / unstructured (fall back to a plain gather)."""
    perm = np.asarray(zorder_block_permutation(nbx, nby))
    n = perm.size
    if n % _ZTILE:
        return None
    pr = perm.reshape(-1, _ZTILE)
    off = pr - pr[:, :1]
    if not (off == off[0]).all():
        return None
    dy, dx = off[0] // nbx, off[0] % nbx
    th, tw = int(dy.max()) + 1, int(dx.max()) + 1
    local = dy * tw + dx
    origins = pr[:, 0]
    if (
        th * tw != _ZTILE
        or nby % th or nbx % tw
        or np.unique(local).size != _ZTILE
        or ((origins % nbx) % tw).any()
        or ((origins // nbx) % th).any()
    ):
        return None
    ntx = nbx // tw
    tile_order = (origins // nbx // th) * ntx + (origins % nbx) // tw
    one_hot = np.zeros((_ZTILE, _ZTILE), np.float32)
    one_hot[local, np.arange(_ZTILE)] = 1.0  # out[:, j] = in[:, local[j]]
    return tile_order.astype(np.int32), th, tw, one_hot


def _zorder_words(w2: jax.Array, nbx: int, nby: int) -> jax.Array:
    """(C, NB) uint32 row-major block order -> Z-order along the lane axis."""
    tiles = _zorder_tiles(nbx, nby)
    if tiles is None:
        perm = jnp.asarray(zorder_block_permutation(nbx, nby))
        return jnp.take(w2, perm, axis=1)
    tile_order, th, tw, one_hot = tiles
    c, n = w2.shape
    nty, ntx = nby // th, nbx // tw
    t = w2.reshape(c, nty, th, ntx, tw).transpose(0, 1, 3, 2, 4)
    t = t.reshape(c, (nty * ntx), _ZTILE)
    t = jnp.take(t, jnp.asarray(tile_order), axis=1)
    m_bf = jnp.asarray(one_hot, dtype=jnp.bfloat16)
    planes = [((t >> (8 * b)) & 0xFF).astype(jnp.bfloat16) for b in range(4)]
    outp = [
        jnp.einsum("cnt,tu->cnu", p, m_bf,
                   preferred_element_type=jnp.float32).astype(_U32)
        for p in planes
    ]
    out = outp[0] | (outp[1] << 8) | (outp[2] << 16) | (outp[3] << 24)
    return out.reshape(c, n)


def _px_block_words(px: jax.Array) -> jax.Array:
    """(H, W) uint32 packed pixels -> (32, NB) uint32, sublane =
    py*8+px, lanes in row-major block order."""
    h, w = px.shape[0], px.shape[1]
    t = px.reshape(h // BLOCK_H, BLOCK_H, w).transpose(1, 0, 2)
    t = t.reshape(BLOCK_H, h // BLOCK_H, w // BLOCK_W, BLOCK_W)
    return t.transpose(0, 3, 1, 2).reshape(32, -1)  # (py*8+px, NB)


def _to_block_words(image: jax.Array) -> jax.Array:
    """(H, W, 4) uint8 -> (32, NB) uint32 packed pixels.

    NOTE: the u8 -> u32 bitcast is NOT free on TPU — XLA relayouts the
    (8, 128)-tiled u8 minor pair into u32 tiles (~4 ms per 134 Mpix,
    measured tools/profile_pvrtc_input_layout.py). Callers that hold the
    RGBA bytes on host should upload them as u32 words (a free numpy
    .view) and call _px_block_words directly."""
    return _px_block_words(jax.lax.bitcast_convert_type(image, jnp.uint32))


def _unpack4(words: jax.Array):
    """(..., NB) uint32 -> 4 int32 channel planes (r, g, b, a)."""
    t = words.astype(jnp.int32)
    return [(t >> (8 * c)) & 255 for c in range(4)]


def _pack4(ch4):
    """Inverse of _unpack4 for 0-255 channel values."""
    r, g, b, a = [c.astype(_U32) for c in ch4]
    return r | (g << 8) | (b << 16) | (a << 24)


def _first_min(f, channels):
    """First-occurrence argmin over sublanes; returns channel picks (1, NB)."""
    fmin = jnp.min(f, axis=0, keepdims=True)
    idx = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
    first = jnp.min(jnp.where(f == fmin, idx, 32), axis=0, keepdims=True)
    hit = idx == first
    return [jnp.sum(jnp.where(hit, ch, 0), axis=0, keepdims=True)
            for ch in channels]


def _first_max(f, channels, pixel00):
    """First-occurrence argmax over sublanes, with the reference's
    all-zero-axis quirk: if the axis is 0 everywhere in the block, the max
    stays global pixel (0,0) (pvrtc_compressor.cc:266-301)."""
    fmax = jnp.max(f, axis=0, keepdims=True)
    idx = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
    first = jnp.min(jnp.where(f == fmax, idx, 32), axis=0, keepdims=True)
    hit = idx == first
    out = [jnp.sum(jnp.where(hit, ch, 0), axis=0, keepdims=True)
           for ch in channels]
    zero = fmax == 0
    # Explicit broadcast: a (1,1) operand inside this where makes XLA's
    # scheduling pass explode (50s+ compile at 2048^2 via remote compile).
    return [jnp.where(zero, jnp.broadcast_to(p00, ch.shape), ch)
            for ch, p00 in zip(out, pixel00)]


def _reduce_a(ch4, is_b: bool):
    """ApplyColorChannelReduction on channel tuples of (1, NB)."""
    r, g, b, a = ch4
    opaque = a == 255
    return [
        jnp.where(opaque, _apply_bit_depth_reduction(r, 5),
                  _apply_bit_depth_reduction(r, 4)),
        jnp.where(opaque, _apply_bit_depth_reduction(g, 5),
                  _apply_bit_depth_reduction(g, 4)),
        jnp.where(opaque, _apply_bit_depth_reduction(b, 5 if is_b else 4),
                  _apply_bit_depth_reduction(b, 4 if is_b else 3)),
        jnp.where(opaque, a, _apply_bit_depth_reduction(a, 3)),
    ]


def _morph_words(words, p00wi):
    """GetExtremesFast + ApplyColorChannelReduction on packed words
    (pvrtc_compressor.cc:255-329, :337-349, :506-521): (32, T) uint32
    packed pixels -> (2, T) uint32 packed reduced (A, B).

    Extraction trick: the first-occurrence argmin/argmax pull the winning
    pixel's PACKED word with ONE masked sum per extreme (exactly one hit
    per lane; done in int32 so Mosaic's plain add-reduction applies — the
    sign bit is just transported alpha bits) instead of four per-channel
    masked sums; channels unpack afterwards with shifts.

    p00wi: broadcastable int32 — the bit pattern of the packed GLOBAL image
    pixel (0, 0), the all-zero-axis fallback (pvrtc_compressor.cc:266-301).
    Runs under both XLA (CPU fallback) and Mosaic (the Pallas morph kernel).
    """
    r, g, b, a = _unpack4(words)
    # >> 8 == // 256 for the nonneg sum; Mosaic/XLA don't strength-reduce
    # signed integer division (CLAUDE.md playbook), and an idiv in the hot
    # kernel is catastrophically slow.
    lightness = (77 * r + 150 * g + 28 * b) >> 8
    idx = jax.lax.broadcasted_iota(jnp.int32, words.shape, 0)
    wi = words.astype(jnp.int32)

    def extreme_word(f, is_max):
        fx = (jnp.max if is_max else jnp.min)(f, axis=0, keepdims=True)
        first = jnp.min(jnp.where(f == fx, idx, 32), axis=0, keepdims=True)
        w = jnp.sum(jnp.where(idx == first, wi, 0), axis=0, keepdims=True)
        if is_max:
            # Explicit broadcast: a (1, 1) operand inside this where makes
            # XLA's scheduling pass explode (see _first_max).
            w = jnp.where(fx == 0, jnp.broadcast_to(p00wi, w.shape), w)
        return w

    best_diff = best_lo = best_hi = None
    for f in (lightness, r, g, b, a):
        lo_w = extreme_word(f, is_max=False)
        hi_w = extreme_word(f, is_max=True)
        diff = sum(jnp.abs(h - l)
                   for l, h in zip(_unpack4(lo_w), _unpack4(hi_w)))
        if best_diff is None:
            best_diff, best_lo, best_hi = diff, lo_w, hi_w
        else:
            upd = diff > best_diff  # strictly greater: first pair wins ties
            best_lo = jnp.where(upd, lo_w, best_lo)
            best_hi = jnp.where(upd, hi_w, best_hi)
            best_diff = jnp.where(upd, diff, best_diff)

    # Order by brightness (sum of channels), swap if needed (:321-328).
    lo4 = _unpack4(best_lo)
    hi4 = _unpack4(best_hi)
    swap = sum(hi4) < sum(lo4)
    lo = [jnp.where(swap, h, l) for l, h in zip(lo4, hi4)]
    hi = [jnp.where(swap, l, h) for l, h in zip(lo4, hi4)]
    return jnp.concatenate(
        [_pack4(_reduce_a(lo, is_b=False)),
         _pack4(_reduce_a(hi, is_b=True))], axis=0)


def _morph_kernel(p00_ref, words_ref, out_ref):
    out_ref[:] = _morph_words(words_ref[:], p00_ref[0, 0])


@partial(jax.jit, static_argnames=("interpret",))
def morph_packed(words32: jax.Array, p00wi: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Pallas morph: (32, N) uint32 packed pixels + (1, 1) int32 packed
    global pixel (0, 0) -> (2, N) uint32 packed reduced (A, B).

    The XLA form of this stage is the PVRTC pipeline's superlinear term at
    ≥8192²: its fused 5-axis scan working set spills past VMEM (24 ms at
    8192² vs 2 ms at 4096² measured). The Pallas grid bounds the working
    set to one (32, tile) block by construction."""
    n = words32.shape[1]
    tile = _tile_for(n)
    words32 = _pad_lanes(words32, tile)
    np_ = words32.shape[1]
    out = pl.pallas_call(
        _morph_kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((32, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, np_), _U32),
        interpret=interpret,
    )(p00wi, words32)
    return out[:, :n]


_VAR_DYDX = tuple((dy, dx) for dy in (1, 0, -1) for dx in (1, 0, -1))


def _make_var_words(low_words, nby: int, nbx: int,
                    halo_top=None, halo_bot=None):
    """The 9 (dy, dx)-shifted copies of a PACKED low-res image that the
    bilinear wrap upscale reads: (1, NB) u32 -> (9, NB) u32 in _VAR_DYDX
    order. roll(+1) brings the top/left (by-1 / bx-1) neighbor into
    position, image-wrapped.

    halo_top/halo_bot: (nbx,) packed rows replacing the y-wrap when the
    image's block rows are sharded across devices (the previous shard's
    last row / the next shard's first row); None = single-device roll.

    Precomputing the variants OUTSIDE the upscale body is what makes the
    Pallas tiling possible: all cross-block (wrap/halo) addressing happens
    here on the tiny low-res image, and the per-tile kernel body is purely
    lane-local."""
    low = low_words.reshape(nby, nbx)
    rows = {}
    for dy in (1, 0, -1):
        if dy == 0:
            rows[dy] = low
        elif halo_top is None:
            rows[dy] = jnp.roll(low, dy, axis=0)
        elif dy == 1:
            rows[dy] = jnp.concatenate(
                [halo_top.reshape(1, nbx), low[:-1]], 0)
        else:
            rows[dy] = jnp.concatenate(
                [low[1:], halo_bot.reshape(1, nbx)], 0)
    out = []
    for dy, dx in _VAR_DYDX:
        ry = rows[dy]
        v = jnp.roll(ry, dx, axis=1) if dx else ry
        out.append(v.reshape(1, -1))
    return jnp.concatenate(out, axis=0)


def _upscale_weights(nrows: int = 16) -> jax.Array:
    """(32, nrows) bf16 bilinear weight matrix W such that
    up_ch = floor((W @ var_ch) / 32) is the 2BPP bilinear wrap upscale
    (GetInterpolatedColor2BPP, pvrtc_compressor.cc:208-237: for in-block
    (py, px), left block = bx-1 iff px < 4, top block = by-1 iff py < 2,
    x weight = (px+4) & 7, y weight = (py+2) & 3): for each in-block
    position s the 4 static corners' var-row indices and integer
    weights land in W[s, :9] (columns >= 9
    stay zero). Built from iotas so it is Mosaic-legal inside a kernel
    (captured array constants are not). Exactness: var_ch <= 255 and
    weights <= 32 are both exact in bf16; every product (<= 8160) and
    the <= 4-term accumulation (<= 8160 total — the weights sum to 32)
    are exact in the MXU's f32 accumulator."""
    s = jax.lax.broadcasted_iota(jnp.int32, (32, nrows), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (32, nrows), 1)
    py, px = s >> 3, s & 7
    lp, tp = px < 4, py < 2
    xw, yw = (px + 4) & 7, (py + 2) & 3
    dy_top = jnp.where(tp, 1, 0)      # corner rows use dy in {1,0} on the
    dy_bot = jnp.where(tp, 0, -1)     # top pair, {0,-1} on the bottom pair
    dx_l = jnp.where(lp, 1, 0)
    dx_r = jnp.where(lp, 0, -1)
    corners = (
        ((BLOCK_H - yw) * (BLOCK_W - xw), dy_top, dx_l),
        ((BLOCK_H - yw) * xw, dy_top, dx_r),
        (yw * (BLOCK_W - xw), dy_bot, dx_l),
        (yw * xw, dy_bot, dx_r),
    )
    w = jnp.zeros((32, nrows), jnp.int32)
    for wt, dy, dx in corners:
        # _VAR_DYDX order: index = 3*(1-dy) + (1-dx).
        w = w + jnp.where(r == 3 * (1 - dy) + (1 - dx), wt, 0)
    return w.astype(jnp.bfloat16)


def _upscale_mm(v16, wmat):
    """Bilinear upscale as 4 one-hot-weighted MXU matmuls: (16, T) u32
    packed variants (rows 0-8 live, rest ignored via zero W columns) ->
    4 f32 channel planes (32, T) of exact integers 0-255."""
    outs = []
    for sh in (0, 8, 16, 24):
        # Two-step cast: Mosaic has no u32 -> bf16 (values are <= 255).
        ch = ((v16 >> jnp.uint32(sh)) & jnp.uint32(255)).astype(
            jnp.int32).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            wmat, ch, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(jnp.floor(acc * (1.0 / 32.0)))
    return outs


def _modulate_planes_f32(planes_f, a_up, b_up):
    """BestModulation on f32 planes of exact small ints (everything
    here is < 2^13, so f32 compare/select semantics are identical to the
    int form, and *0.125 + floor is an exact >>3)."""
    diff0 = sum(jnp.abs(p - c) for p, c in zip(planes_f, a_up))
    best = jnp.zeros_like(diff0)
    best_diff = diff0
    alive = jnp.ones_like(diff0, dtype=bool)
    for mod, (s0, s1) in ((1, (5, 3)), (2, (3, 5)), (3, (0, 8))):
        if (s0, s1) == (0, 8):
            cand = b_up  # (0*a + 8*b)//8 == b exactly
        else:
            cand = [jnp.floor((s0 * a + s1 * b) * 0.125)
                    for a, b in zip(a_up, b_up)]
        diff = sum(jnp.abs(p - c) for p, c in zip(planes_f, cand))
        take = alive & (diff < best_diff)
        best = jnp.where(take, float(mod), best)
        best_diff = jnp.where(take, diff, best_diff)
        alive = take
    return best.astype(jnp.int32)  # (32, NB)


def _upscale_modulate_16(words, va16, vb16):
    """Shared body on 16-row padded variants: (32, T) packed pixels +
    2x(16, T) -> (32, T) int32 modulation. The bilinear upscale runs as
    8 MXU matmuls (see _upscale_weights) instead of ~12 packed-word
    select chains + 28 VPU weighted-sum ops; the modulation search runs
    in f32 (exact for these ranges), saving the per-channel int
    converts."""
    wmat = _upscale_weights(16)
    a_up = _upscale_mm(va16, wmat)
    b_up = _upscale_mm(vb16, wmat)
    planes_f = [((words >> jnp.uint32(sh)) & jnp.uint32(255)).astype(
        jnp.int32).astype(jnp.float32) for sh in (0, 8, 16, 24)]
    return _modulate_planes_f32(planes_f, a_up, b_up)


def _pad16(v9):
    return jnp.concatenate(
        [v9, jnp.zeros((16 - v9.shape[0], v9.shape[1]), v9.dtype)], axis=0)


def _upscale_modulate_body(words, va9, vb9):
    """(32, T) packed pixels + 2x(9, T) packed low-res variants -> (32, T)
    int32 modulation. Lane-local (all wrap addressing lives in the
    variants) — shared by the XLA path and the Pallas kernel."""
    return _upscale_modulate_16(words, _pad16(va9), _pad16(vb9))


def _upmod_kernel(words_ref, vab_ref, out_ref):
    out_ref[:] = _upscale_modulate_16(
        words_ref[:], vab_ref[0:16], vab_ref[16:32])


@partial(jax.jit, static_argnames=("interpret",))
def upscale_modulate_packed(words32: jax.Array, vab: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """Pallas upscale+modulate: (32, N) packed pixels + (18, N) packed
    A/B variants -> (32, N) int32 modulation.

    The XLA form of these stages materializes O(10) full-size (32, NB)
    int32 intermediates per barrier once its fusion working set spills
    (~25x over the HBM bound at 8192²); the grid bounds every
    intermediate to one (32, tile) VMEM block. The 18-row vab operand is
    re-laid to 32 rows (9 + 7 zeros, x2) so the kernel's sublane slices
    stay 8-aligned."""
    n = words32.shape[1]
    tile = _tile_for(n)
    vab32 = jnp.concatenate([_pad16(vab[0:9]), _pad16(vab[9:18])], axis=0)
    words32 = _pad_lanes(words32, tile)
    vab32 = _pad_lanes(vab32, tile)
    np_ = words32.shape[1]
    out = pl.pallas_call(
        _upmod_kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((32, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, np_), jnp.int32),
        interpret=interpret,
    )(words32, vab32)
    return out[:, :n]


def _mpc_kernel(mod_ref, nh_ref, nv_ref, ab_ref, out_ref):
    out_ref[:] = _modes_pack_colors_body(
        mod_ref[:], nh_ref[:], nv_ref[:], ab_ref[:])


@partial(jax.jit, static_argnames=("interpret",))
def modes_pack_colors_packed(mod: jax.Array, nh_edge: jax.Array,
                             nv_edge: jax.Array, ab: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Pallas mode-decision + packing: -> (2, N) uint32 words."""
    n = mod.shape[1]
    tile = _tile_for(n)
    mod, nh_edge, nv_edge, ab = (
        _pad_lanes(x, tile) for x in (mod, nh_edge, nv_edge, ab))
    np_ = mod.shape[1]
    out = pl.pallas_call(
        _mpc_kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((32, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, np_), _U32),
        interpret=interpret,
    )(mod, nh_edge, nv_edge, ab)
    return out[:, :n]


def _modulate_planes(planes, a_up, b_up):
    """BestModulation with the early-exit rule on (32, NB) planes."""
    diff0 = sum(jnp.abs(p - c) for p, c in zip(planes, a_up))
    best = jnp.zeros_like(diff0)
    best_diff = diff0
    alive = jnp.ones_like(diff0, dtype=bool)
    for mod, (s0, s1) in ((1, (5, 3)), (2, (3, 5)), (3, (0, 8))):
        if (s0, s1) == (0, 8):
            cand = b_up  # (0*a + 8*b)//8 == b exactly; XLA can't prove it
        else:
            cand = [(s0 * a + s1 * b) >> 3 for a, b in zip(a_up, b_up)]
        diff = sum(jnp.abs(p - c) for p, c in zip(planes, cand))
        take = alive & (diff < best_diff)
        best = jnp.where(take, mod, best)
        best_diff = jnp.where(take, diff, best_diff)
        alive = take
    return best  # (32, NB)


def _mode_edges(mod, nby, nbx, halo_v=None):
    """The two cross-block edge tiles the mode decision needs, built in
    XLA on the small slices (all remaining mode work is lane-local in
    _modes_pack_colors_body):

    * nh_edge (4, NB): for each py, the px=0 modulation of the block to
      the right (image-wrapped) — the px=7 horizontal neighbor.
    * nv_edge (8, NB): the py=0 rows of the block below (image-wrapped,
      or the next shard's first block-row when sharded via halo_v).
    """
    nb = mod.shape[1]
    col0 = mod[0::8]  # (4, NB): px=0 row per py
    nh_edge = jnp.roll(col0.reshape(4, nby, nbx), -1, axis=2).reshape(4, nb)
    m3 = mod[0:8].reshape(8, nby, nbx)
    if halo_v is None:
        rolled = jnp.roll(m3, -1, axis=1)
    else:
        rolled = jnp.concatenate([m3[:, 1:], halo_v[:, None, :]], axis=1)
    return nh_edge, rolled.reshape(8, nb)


def _or_tree32(x):
    """Sublane OR-reduce of (32, T) via aligned slices (Mosaic has no
    unsigned reductions; also used on the XLA path for parity)."""
    t = x[0:16] | x[16:32]
    t = t[0:8] | t[8:16]
    t = t[0:4] | t[4:8]
    t = t[0:2] | t[2:4]
    return t[0:1] | t[1:2]


def _pack_modulation(mod, modes):
    """CalculateBlockModulationData (pvrtc_compressor.cc:456-496) on
    (32, T) -> (1, T) uint32."""
    s = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    py = s >> 3
    px = s & 7
    checker = ((px ^ py) & 1) == 0
    bp2 = 2 * (py * 4 + (px >> 1))

    modu = mod.astype(_U32)
    word_1bpp = _or_tree32((modu >> 1) << s.astype(_U32))

    bits = mod
    at0 = checker & (bp2 == 0)
    at20 = checker & (bp2 == 20)
    is_avg4 = modes == 1
    is_vert = modes == 2
    bits = jnp.where(at0, jnp.where(is_avg4, bits & 2, bits | 1), bits)
    bits = jnp.where(at20, jnp.where(is_vert, bits | 1, bits & 2), bits)
    word2 = jnp.where(checker, bits.astype(_U32) << bp2.astype(_U32),
                      _U32(0))
    word_2bpp = _or_tree32(word2)
    return jnp.where(modes == 0, word_1bpp, word_2bpp)


def _modes_pack_colors_body(mod, nh_edge, nv_edge, ab):
    """Mode decision + modulation/color packing, lane-local:
    mod (32, T) int32, nh_edge (4, T), nv_edge (8, T), ab (2, T) packed
    -> (2, T) uint32 (modulation word, color word).

    CalculateBlockModulationMode (pvrtc_compressor.cc:395-447); note the
    reference's crossed counters — horizontal_count sums vertical-neighbor
    deltas and vice versa (:417-429)."""
    # nh: (y, x+1) — within a block row s's neighbor is s+1; the px=7
    # column takes the edge tile. Built from whole-group slices (per-row
    # extracts each cost a sublane relayout).
    parts = []
    for g in range(4):
        parts.append(mod[8 * g + 1 : 8 * g + 8])
        parts.append(nh_edge[g : g + 1])
    nh = jnp.concatenate(parts, axis=0)
    # nv: (y+1, x) — rows 8..31 shift up one block-row; py=3 wraps to the
    # edge tile.
    nv = jnp.concatenate([mod[8:32], nv_edge], axis=0)

    intermediate = jnp.sum(((mod == 1) | (mod == 2)).astype(jnp.int32),
                           axis=0, keepdims=True)
    horizontal_count = jnp.sum(jnp.abs(mod - nv), axis=0, keepdims=True)
    vertical_count = jnp.sum(jnp.abs(mod - nh), axis=0, keepdims=True)

    vertical = (vertical_count > 10) & (vertical_count > horizontal_count * 2)
    horizontal = (horizontal_count > 10) & (
        horizontal_count > vertical_count * 2)
    mode = jnp.where(vertical, 2, jnp.where(horizontal, 3, 1))
    modes = jnp.where(intermediate <= 4, 0, mode)  # (1, T)

    mod_words = _pack_modulation(mod, modes)
    color_words = _encode_colors(_unpack4(ab[0:1]), _unpack4(ab[1:2]),
                                 modes)
    return jnp.concatenate([mod_words, color_words], axis=0)


def _encode_colors(a, b, modes):
    """EncodeColors (pvrtc_compressor.cc:356-388) on (1, NB) channels."""
    u = lambda x: x.astype(_U32)
    ar, ag, ab, aa = a
    br, bg, bb, ba = b
    a_op = aa == 255
    a_o = (_U32(1 << 15) | (u(ab >> 4) << 1) | (u(ag >> 3) << 5)
           | (u(ar >> 3) << 10))
    a_t = ((u(ab >> 5) << 1) | (u(ag >> 4) << 4) | (u(ar >> 4) << 8)
           | (u(aa >> 5) << 12))
    b_op = ba == 255
    b_o = (_U32(1 << 31) | (u(bb >> 3) << 16) | (u(bg >> 3) << 21)
           | (u(br >> 3) << 26))
    b_t = ((u(bb >> 4) << 16) | (u(bg >> 4) << 20) | (u(br >> 4) << 24)
           | (u(ba >> 5) << 28))
    value = jnp.where(a_op, a_o, a_t) | jnp.where(b_op, b_o, b_t)
    return value | jnp.where(modes == 0, _U32(0), _U32(1))


def _encode_rowmajor_words(image: jax.Array, pixel00,
                           axis_name: str | None = None) -> jax.Array:
    """Shared encode pipeline body: (h, W, 4) uint8 -> (2, NB) uint32
    (modulation word, color word) in row-major block order.

    Stages are separated by optimization barriers: letting XLA fuse the
    whole pipeline triggers massive recomputation of the broadcast-heavy
    upscale (measured ~700x slower at 1024^2 on v5e). Barriers force each
    stage to materialize once. Everything crossing a barrier is kept
    PACKED uint32 (one word per pixel, not 4 int32 planes): barriers force
    materialization, and at 4096^2 the unpacked planes alone are ~270 MB
    of HBM traffic per stage; re-unpacking with shifts on the consumer
    side is ALU-cheap.

    With ``axis_name`` the image's block rows are a shard of a taller
    atlas distributed over that mesh axis: the y-wraps of the bilinear
    upscale and of the mode decision's vertical neighbor become one-row
    halo exchanges over ICI (jax.lax.ppermute) instead of jnp.roll.
    pixel00: 4-list of (1, 1) int32 — the GLOBAL image pixel (0, 0).
    """
    h, w = image.shape[0], image.shape[1]
    nby, nbx = h // BLOCK_H, w // BLOCK_W
    barrier = jax.lax.optimization_barrier

    if axis_name is not None:
        n = jax.lax.axis_size(axis_name)
        fwd = [(i, (i + 1) % n) for i in range(n)]  # receive from prev
        bwd = [(i, (i - 1) % n) for i in range(n)]  # receive from next

    from texcomp.ops import use_pallas as _use_pallas  # shared gate

    use_pallas = _use_pallas()
    words32 = barrier(_to_block_words(image))
    if pixel00 is None:
        # Single-image case: the global pixel (0, 0) IS words32[0, 0]
        # (sublane 0 = in-block (0,0), lane 0 = block (0,0)). Extracting
        # it from the (H, W, 4) uint8 image instead forces XLA to
        # materialize that tensor in its lane-padded layout (4 -> 128,
        # 32x: 8 GB and ~58 ms at 8192^2).
        p00wi = words32[0:1, 0:1].astype(jnp.int32)
    else:
        # Sharded atlas: callers pass the GLOBAL image pixel (0, 0) as a
        # 4-list of (1, 1) int32 channels (dist/mesh.py).
        p00wi = _pack4(pixel00).astype(jnp.int32)
    # The Pallas morph only wins once XLA's fused 5-axis scan spills its
    # working set (>= ~1M blocks, i.e. >= 8192^2): 4.1 ms vs 11.3 ms there.
    # Below that the XLA form fuses with its neighbors and the pallas_call
    # boundary costs more than it saves (1.25 vs 3.3 Gpix/s at 2048^2
    # measured end-to-end).
    if use_pallas and words32.shape[1] >= (1 << 20):
        ab = morph_packed(words32, p00wi)
    else:
        ab = _morph_words(words32, p00wi)
    ab = barrier(ab)
    if axis_name is None:
        a_halo = b_halo = (None, None)
    else:
        # Halo rows travel PACKED (one uint32 word per low-res pixel, A
        # and B stacked): two ppermutes total.
        aw = ab[0].reshape(nby, nbx)
        bw = ab[1].reshape(nby, nbx)
        tops = jax.lax.ppermute(jnp.stack([aw[-1], bw[-1]]), axis_name, fwd)
        bots = jax.lax.ppermute(jnp.stack([aw[0], bw[0]]), axis_name, bwd)
        a_halo = (tops[0], bots[0])
        b_halo = (tops[1], bots[1])

    # Upscale + modulate: all cross-block wrap/halo addressing happens in
    # the 9 packed low-res variants (tiny); the heavy (32, NB) work is
    # lane-local, so on TPU it runs as a Pallas grid whose intermediates
    # stay in VMEM (the XLA form spills superlinearly past ~4096^2).
    va9 = _make_var_words(ab[0:1], nby, nbx, *a_halo)
    vb9 = _make_var_words(ab[1:2], nby, nbx, *b_halo)
    if use_pallas:
        mod = upscale_modulate_packed(
            words32, jnp.concatenate([va9, vb9], axis=0))
    else:
        mod = _upscale_modulate_body(words32, va9, vb9)
    mod = barrier(mod)

    if axis_name is None:
        halo_v = None
    else:
        first = mod[0:8].reshape(8, nby, nbx)[:, 0]  # (8, nbx)
        halo_v = jax.lax.ppermute(first, axis_name, bwd)
    nh_edge, nv_edge = _mode_edges(mod, nby, nbx, halo_v=halo_v)
    if use_pallas:
        return modes_pack_colors_packed(mod, nh_edge, nv_edge, ab)
    return _modes_pack_colors_body(mod, nh_edge, nv_edge, ab)


def _zorder_payload(words: jax.Array, nby: int, nbx: int) -> jax.Array:
    """(2, NB) row-major words -> (NB, 8) uint8 Z-order PVRTC records.

    Z-order via the MXU-tiled permutation; bytes via LE bitcast, not 8
    uint8 lane stacks (8-bit shuffles are slow; see CLAUDE.md playbook)."""
    zw = _zorder_words(words, nbx, nby)
    both = jnp.stack([zw[0], zw[1]], axis=-1)  # (NB, 2) uint32
    return jax.lax.bitcast_convert_type(both, jnp.uint8).reshape(-1, 8)


# Standalone-jitted form (static grid dims) for callers that run the
# pipeline body under shard_map and finish with the global permutation.
zorder_payload_jit = jax.jit(_zorder_payload, static_argnums=(1, 2))


@jax.jit
def encode_pvrtc_2bpp_fast(image: jax.Array) -> jax.Array:
    """(H, W, 4) uint8 (square power-of-two) -> (NB, 8) uint8 Z-order
    PVRTC records; byte-identical to codecs.pvrtc.encode_pvrtc_2bpp_device.
    """
    h, w = image.shape[0], image.shape[1]
    words = _encode_rowmajor_words(image, None)
    return _zorder_payload(words, h // BLOCK_H, w // BLOCK_W)


# ---------------------------------------------------------------------------
# Batched fleet encode: B same-size images fold into the LANE axis instead
# of a vmap over the whole pipeline (vmap was 2-4x slower per pixel on the
# fleet distribution: every barrier-staged intermediate gains a batch
# dimension and the tiny low-res stages relayout per image). The heavy
# stages (morph, upscale+modulate, modes+pack) are lane-local by design, so
# they run UNCHANGED on (., B*NB) planes — only the cross-block addressing
# (wrap rolls, Z-order) needs per-image grid shapes, and the all-zero-axis
# fallback needs a per-lane global pixel (0, 0) instead of a scalar.
# ---------------------------------------------------------------------------


def _make_var_words_batched(low_words, gr: int, nby: int, gc: int,
                            nbx: int):
    """Batched _make_var_words on MOSAIC lane order (gr, nby, gc, nbx):
    (1, B*NB) -> (9, B*NB), wraps per image (roll along each image's own
    block-row/col axes). gc == 1 is the plain image-major batch."""
    low = low_words.reshape(gr, nby, gc, nbx)
    rows = {0: low, 1: jnp.roll(low, 1, axis=1),
            -1: jnp.roll(low, -1, axis=1)}
    out = []
    for dy, dx in _VAR_DYDX:
        ry = rows[dy]
        v = jnp.roll(ry, dx, axis=3) if dx else ry
        out.append(v.reshape(1, -1))
    return jnp.concatenate(out, axis=0)


def _mode_edges_batched(mod, gr: int, nby: int, gc: int, nbx: int):
    """Batched _mode_edges on mosaic lane order: image-wrapped neighbor
    tiles per image."""
    nb = mod.shape[1]
    col0 = mod[0::8]  # (4, B*NB)
    nh_edge = jnp.roll(col0.reshape(4, gr, nby, gc, nbx), -1,
                       axis=4).reshape(4, nb)
    m3 = mod[0:8].reshape(8, gr, nby, gc, nbx)
    return nh_edge, jnp.roll(m3, -1, axis=2).reshape(8, nb)


def _morph_kernel_rowp00(p00_ref, words_ref, out_ref):
    out_ref[:] = _morph_words(words_ref[:], p00_ref[:])


@partial(jax.jit, static_argnames=("interpret",))
def morph_packed_batched(words32: jax.Array, p00wi: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Pallas morph with a PER-LANE (1, N) int32 packed global pixel (0, 0)
    (each lane's image origin) instead of morph_packed's (1, 1) scalar."""
    n = words32.shape[1]
    tile = _tile_for(n)
    words32 = _pad_lanes(words32, tile)
    p00wi = _pad_lanes(p00wi, tile)
    np_ = words32.shape[1]
    out = pl.pallas_call(
        _morph_kernel_rowp00,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, np_), _U32),
        interpret=interpret,
    )(p00wi, words32)
    return out[:, :n]


def _zorder_words_batched(w2: jax.Array, b: int, nbx: int,
                          nby: int) -> jax.Array:
    """(C, B*NB) uint32 row-major -> Z-order within each image's lane
    segment. One shared permutation per image: the tile decomposition
    batches by treating each image's tiles as extra coarse tiles; small
    grids (NB < _ZTILE) run the WHOLE shared perm as one one-hot bf16
    matmul over byte planes (exact for bytes) instead of a B*NB-element
    gather (~10 ns/element)."""
    c = w2.shape[0]
    nb = w2.shape[1] // b
    tiles = _zorder_tiles(nbx, nby)
    if tiles is not None:
        tile_order, th, tw, one_hot = tiles
        nty, ntx = nby // th, nbx // tw
        t = w2.reshape(c, b, nty, th, ntx, tw).transpose(0, 1, 2, 4, 3, 5)
        t = t.reshape(c, b * nty * ntx, _ZTILE)
        idx = (jnp.asarray(tile_order)[None, :]
               + (jnp.arange(b) * (nty * ntx))[:, None]).reshape(-1)
        t = jnp.take(t, idx, axis=1)
        m_bf = jnp.asarray(one_hot, dtype=jnp.bfloat16)
        planes = [((t >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
                  for k in range(4)]
        outp = [
            jnp.einsum("cnt,tu->cnu", p, m_bf,
                       preferred_element_type=jnp.float32).astype(_U32)
            for p in planes
        ]
        out = outp[0] | (outp[1] << 8) | (outp[2] << 16) | (outp[3] << 24)
        return out.reshape(c, b * nb)
    perm = np.asarray(zorder_block_permutation(nbx, nby))
    if nb <= _ZTILE:
        one_hot = np.zeros((nb, nb), np.float32)
        one_hot[perm, np.arange(nb)] = 1.0  # out[:, j] = in[:, perm[j]]
        m_bf = jnp.asarray(one_hot, dtype=jnp.bfloat16)
        t = w2.reshape(c, b, nb)
        planes = [((t >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
                  for k in range(4)]
        outp = [
            jnp.einsum("cbt,tu->cbu", p, m_bf,
                       preferred_element_type=jnp.float32).astype(_U32)
            for p in planes
        ]
        out = outp[0] | (outp[1] << 8) | (outp[2] << 16) | (outp[3] << 24)
        return out.reshape(c, b * nb)
    return jnp.take(w2.reshape(c, b, nb), jnp.asarray(perm),
                    axis=2).reshape(c, b * nb)


def _pvrtc_mosaic_cols(b: int, w: int) -> int:
    """Images per mosaic row for the batched pack. Folding the batch into
    the image Y axis alone makes the pack's major-dims transpose scale
    with the tall row count, not bytes (12 ms of the 23 ms 512^2 x192
    fleet cell); a (gr, gc) image GRID restores a ~2048-wide aspect at
    ONE pack call. Measured (v5e, fleet cells, tall -> mosaic): 512^2
    x192 23.2 -> ~12 ms. Stay tall at w >= 2048 (already wide)."""
    if w >= 2048 or b == 1:
        return 1
    gc = max(1, min(b, 2048 // w))
    while b % gc:
        gc -= 1
    return gc


@jax.jit
def encode_pvrtc_2bpp_batched(images: jax.Array) -> jax.Array:
    """(B, H, W, 4) uint8 same-size square power-of-two images ->
    (B, NB, 8) uint8 Z-order PVRTC records; each image's payload is
    byte-identical to encode_pvrtc_2bpp_fast(images[i])."""
    return encode_pvrtc_2bpp_batched_words(
        jax.lax.bitcast_convert_type(images, jnp.uint32))


@jax.jit
def encode_pvrtc_2bpp_batched_words(px: jax.Array) -> jax.Array:
    """(B, H, W) uint32 packed RGBA pixel words -> (B, NB, 8) uint8.

    The words form is the fast fleet entry: uploading host RGBA bytes as
    u32 (a free numpy .view) skips the device-side u8 -> u32 bitcast
    relayout (~4 ms / 134 Mpix, tools/profile_pvrtc_input_layout.py)."""
    b, h, w = px.shape[0], px.shape[1], px.shape[2]
    nby, nbx = h // BLOCK_H, w // BLOCK_W
    nb = nby * nbx
    barrier = jax.lax.optimization_barrier

    from texcomp.ops import use_pallas as _use_pallas

    use_pallas = _use_pallas()
    # Mosaic stack: fold the batch into a (gr, gc) image grid so ONE wide
    # pack feeds all B images' blocks onto lanes; lanes land in mosaic
    # order (gr, nby, gc, nbx) and every per-image stage addresses that
    # 4D grid directly (rolls/broadcasts are per-image either way), so
    # no lane reorder is needed until the tiny (2, N) Z-order output.
    gc = _pvrtc_mosaic_cols(b, w)
    gr = b // gc
    if gc > 1:
        m = px.reshape(gr, gc, h, w).transpose(0, 2, 1, 3)
        m = m.reshape(gr * h, gc * w)
    else:
        m = px.reshape(b * h, w)
    words32 = barrier(_px_block_words(m))
    # Per-lane global pixel (0, 0): image (i, j)'s origin word sits at
    # mosaic lane ((i*nby)*gc + j)*nbx.
    w0 = words32[0:1].reshape(gr, nby, gc, nbx)
    p00 = jnp.broadcast_to(w0[:, 0:1, :, 0:1], (gr, nby, gc, nbx)
                           ).reshape(1, b * nb).astype(jnp.int32)
    if use_pallas and words32.shape[1] >= (1 << 20):
        ab = morph_packed_batched(words32, p00)
    else:
        ab = _morph_words(words32, p00)
    ab = barrier(ab)
    va9 = _make_var_words_batched(ab[0:1], gr, nby, gc, nbx)
    vb9 = _make_var_words_batched(ab[1:2], gr, nby, gc, nbx)
    if use_pallas:
        mod = upscale_modulate_packed(
            words32, jnp.concatenate([va9, vb9], axis=0))
    else:
        mod = _upscale_modulate_body(words32, va9, vb9)
    mod = barrier(mod)
    nh_edge, nv_edge = _mode_edges_batched(mod, gr, nby, gc, nbx)
    if use_pallas:
        words = modes_pack_colors_packed(mod, nh_edge, nv_edge, ab)
    else:
        words = _modes_pack_colors_body(mod, nh_edge, nv_edge, ab)
    if gc > 1:
        # Mosaic -> image-major lane order, on the (2, N) uint32 words.
        words = words.reshape(2, gr, nby, gc, nbx).transpose(
            0, 1, 3, 2, 4).reshape(2, b * nb)
    zw = _zorder_words_batched(words, b, nbx, nby)
    both = jnp.stack([zw[0].reshape(b, nb), zw[1].reshape(b, nb)], axis=-1)
    return jax.lax.bitcast_convert_type(both, jnp.uint8).reshape(b, nb, 8)
