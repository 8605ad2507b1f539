"""High-quality PVRTC 2BPP encoding (EXTENSION — beats reference PSNR).

The reference PVRTC encoder (pvrtc_compressor.cc:506-597) is a one-shot
heuristic: per-block L1 extremes seed the low-res A/B palette images
(GetExtremesFast, :255-329) and per-pixel modulation greedily early-exits
on the first non-improving candidate (BestModulation, :148-166). Nothing
ever revisits A/B after seeing the modulation choices, so on natural
photos it leaves several dB on the table.

This opt-in mode (``PvrtcCompressor(quality="high")``) keeps the payload
format 100% standard and replaces the encoder search with alternating
minimization, TPU-first (dense tensor ops + jax.grad, no per-block scalar
code):

  1. Seed A/B from the reference's unquantized block extremes.
  2. Alternate: (a) per-pixel hard modulation assignment by true squared
     RGBA error against the bilinear-wrap upscaled A/B; (b) exact
     least-squares refit of ALL A/B texels given the assignment — the
     subproblem is an anchored quadratic (the upscale and modulation mix
     are linear maps), solved by conjugate gradients with Hessian-vector
     products from jax.jvp/vjp.
  3. Quantize A/B with the format's channel reduction (554/555 or
     3443/3444, pvrtc_compressor.cc:337-349), recompute modulation with
     exact integer decode semantics, and pick each block's modulation
     packing mode (1BPP vs the three checkerboard submodes,
     :395-496) by measuring the true reconstruction error of each —
     instead of the reference's intermediate-count thresholds.
  4. Packing-aware refinement: reconstruct the modulation image the
     DECODER will actually see under the chosen packing (1BPP
     thresholding / checkerboard interpolation) and refit A/B against
     that, repeating quantize→assign→refit a few times — this recovers
     most of the error the lossy modulation packing introduces
     (+0.4-0.8 dB on photos over stopping at step 3).
  5. Best-of: the final payload is whichever of {HQ, reference} decodes
     closer to the source image, so quality="high" is never worse.

Per-block mode selection evaluates each block under the candidate mode
with neighbor stored values taken from the ideal modulation image; at
borders between 1BPP and checkerboard blocks the decoder's neighbor
interpolation can differ slightly from this model (the image-level
best-of above still bounds the result from below).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from texcomp.codecs import pvrtc as pv

# Iteration counts tuned by a PSNR-vs-throughput sweep on the photo crops
# (china/flower 256^2, grace_hopper 512^2): 8/6/3 -> 4/4/2 loses at most
# 0.09 dB of the +4.2-5.5 dB HQ gain while going 26 -> 49 Mpix/s at
# 1024^2 on TPU (the CG refits dominate; quality saturates by 4 outer
# alternations). The never-worse best-of below bounds any config from
# below at reference quality.
_OUTER_ITERS = 4
_REFINE_CYCLES = 2  # packing-aware quantize->assign->refit rounds
_CG_ITERS = 4
_RIDGE = 1e-2  # anchors texels whose bilinear support is all-mod-0/3

# Blend weight of B for each modulation value (ApplyModulation,
# pvrtc_compressor.cc:120-144). Stays numpy: a module-level jnp array
# leaks as a tracer when this module is first imported inside a traced
# region (the asset pipeline's shard_map imports codecs lazily).
_T = np.asarray([0.0, 3.0 / 8.0, 5.0 / 8.0, 1.0], dtype=np.float32)


def _t_of(mod):
    """``_T[mod]`` as a select chain — gather-free (TPU element gathers
    cost ~10 ns each even for a 4-entry table)."""
    t = jnp.zeros(mod.shape, jnp.float32)
    for m in (1, 2, 3):
        t = jnp.where(mod == m, _T[m], t)
    return t


def _shrunk_seed(lo, hi, s: float = 0.5):
    """ALS seed: block mean ± s·(spread/2) instead of the raw extremes.

    The extremes seed commits the first modulation assignment to a ramp
    twice as wide as the final optimum wants (same inward pull as any
    K-level quantizer), and the anchored CG refit then stays in that
    basin. Halving the seed spread measured +0.47-0.60 dB on each of the
    QUALITY.md photos at identical cost; random-restart probing showed
    +0.24 dB of seed-dependence on the hardest photo, which this seed
    more than captures (docs/PERF.md)."""
    lo_f = lo.astype(jnp.float32)
    hi_f = hi.astype(jnp.float32)
    mean = (lo_f + hi_f) * 0.5
    half = (hi_f - lo_f) * 0.5
    return (mean - s * half, mean + s * half)


def _make_upscale_f(h: int, w: int, block_h: int, block_w: int):
    """Float bilinear wrap upscale — the continuous-relaxation counterpart
    of pvrtc._interpolate_upscaled (same separable passes, true division).
    8x4 blocks for 2bpp; 4x4 for the 4bpp extension."""
    def upscale_f(low: jax.Array) -> jax.Array:
        tmp = pv._upscale_axis(low, w, axis=1, block=block_w)
        full = pv._upscale_axis(tmp, h, axis=0, block=block_h)
        return full / float(block_w * block_h)
    return upscale_f


def _tree_dot(x, y):
    return sum(jnp.vdot(a, b) for a, b in zip(x, y))


def _tree_axpy(alpha, x, y):
    return tuple(alpha * a + b for a, b in zip(x, y))


def _solve_ab(img_f, t, ab0, upscale_f):
    """Least-squares refit of the A/B texels for fixed modulation blend t.

    Solves (JᵀJ + λI) x = Jᵀ img + λ x₀ by CG, where J is the linear map
    (A, B) → (1-t)·up(A) + t·up(B). Anchoring at the current x₀ keeps
    texels with no effective support (e.g. all-mod-0 regions leave B
    unconstrained) where they are.
    """
    tb = t[..., None]

    def fwd(ab):
        return (1.0 - tb) * upscale_f(ab[0]) + tb * upscale_f(ab[1])

    def fwd_t(r):
        (vjp_ab,) = jax.vjp(fwd, ab0)[1](r)
        return vjp_ab

    def apply_h(x):
        jx = jax.jvp(fwd, (ab0,), (x,))[1]
        jtjx = jax.vjp(fwd, ab0)[1](jx)[0]
        return _tree_axpy(_RIDGE, x, jtjx)

    b = _tree_axpy(_RIDGE, ab0, fwd_t(img_f))
    x = ab0
    r = _tree_axpy(-1.0, apply_h(x), b)

    def cg_step(_, state):
        x, r, p, rs = state
        hp = apply_h(p)
        alpha = rs / jnp.maximum(_tree_dot(p, hp), 1e-12)
        x = _tree_axpy(alpha, p, x)
        r = _tree_axpy(-alpha, hp, r)
        rs_new = _tree_dot(r, r)
        p = _tree_axpy(rs_new / jnp.maximum(rs, 1e-12), p, r)
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(
        0, _CG_ITERS, cg_step, (x, r, r, _tree_dot(r, r)))
    return x


def _make_outer_step(img_f, upscale_f, solve):
    """One alternating-minimization step: hard per-pixel modulation by true
    squared error against the upscaled A/B, then the CG refit.

    The candidate errors are quadratic in the blend weight t:
    ``|d - t e|^2 = |d|^2 - 2 t (d.e) + t^2 |e|^2`` with d = img - up(A)
    and e = up(B) - up(A); the argmin over the 4 t values only needs the
    two scalar planes (d.e) and |e|^2 — two FMAs per candidate instead of
    the (H, W, 4ch, 4mod) candidate tensor (8 planes vs 32)."""
    def outer_step(_, ab):
        a_up = upscale_f(ab[0])
        b_up = upscale_f(ab[1])
        d = img_f - a_up
        e = b_up - a_up
        s = jnp.sum(d * e, axis=-1)          # (H, W)
        q = jnp.sum(e * e, axis=-1)          # (H, W)
        best_t = jnp.zeros(s.shape, jnp.float32)
        best_e = jnp.zeros(s.shape, jnp.float32)  # t=0 candidate: 0
        for tv in _T[1:]:
            cand = tv * tv * q - 2.0 * tv * s
            better = cand < best_e
            best_t = jnp.where(better, tv, best_t)
            best_e = jnp.where(better, cand, best_e)
        return solve(img_f, best_t, ab)
    return outer_step


def _mod_errors_int(img_i, a_up, b_up):
    """(H, W, 4) squared-RGBA error of each of the 4 integer modulation
    candidates, exactly as the decode model reconstructs them."""
    errs = []
    for m in range(4):
        cand = pv._apply_modulation(a_up, b_up, m)
        d = (img_i - cand).astype(jnp.float32)
        errs.append(jnp.sum(d * d, axis=-1))
    return jnp.stack(errs, axis=-1)  # (H, W, 4)


def _mode_recons(mod, h: int, w: int):
    """The 4 candidate per-pixel modulation images the decoder would see,
    one per packing mode: 1BPP thresholding, or checkerboard storage +
    neighbor interpolation with the flag positions' low bit lost (encode
    does |1 or &2 there, decode masks with &2 — the stored value is mod&2
    in every checkerboard mode)."""
    nby, nbx = h // pv.BLOCK_H, w // pv.BLOCK_W
    stored = jnp.tile(jnp.asarray(pv._CHECKER), (nby, nbx))
    flagged = jnp.tile(jnp.asarray(pv._FLAGGED_2BPP), (nby, nbx))
    sval = jnp.where(flagged, mod & 2, mod)

    avg4, avg_v, avg_h = pv.modulation_neighbor_interps(sval)
    return [
        (mod // 2) * 3,                       # 0: 1BPP
        jnp.where(stored, sval, avg4),        # 1: checkerboard average-4
        jnp.where(stored, sval, avg_v),       # 2: vertical
        jnp.where(stored, sval, avg_h),       # 3: horizontal
    ]


def _choose_block_modes(mod, err_m, h: int, w: int):
    """Per-block packing mode by true reconstruction error: score each
    candidate's reconstructed modulation with the per-pixel candidate
    errors and take the per-block argmin."""
    nby, nbx = h // pv.BLOCK_H, w // pv.BLOCK_W
    recons = _mode_recons(mod, h, w)

    def per_block(x):
        return x.reshape(nby, pv.BLOCK_H, nbx, pv.BLOCK_W).sum(axis=(1, 3))

    def pick(r):
        # Select chain, NOT take_along_axis: element gathers cost ~10 ns
        # each on TPU (4 x 1M at 1024^2 was 50 ms — the whole HQ encode's
        # dominant term); the where chain fuses to a few VPU ops.
        e = err_m[..., 0]
        for m in (1, 2, 3):
            e = jnp.where(r == m, err_m[..., m], e)
        return e

    scores = jnp.stack([per_block(pick(r)) for r in recons], axis=-1)
    return jnp.argmin(scores, axis=-1).astype(jnp.int32)  # (nby, nbx)


def _recon_mod(mod, modes, h: int, w: int):
    """The decoder-visible modulation image under the chosen per-block
    packing modes."""
    recons = _mode_recons(mod, h, w)
    mode_px = jnp.repeat(jnp.repeat(modes, pv.BLOCK_H, 0), pv.BLOCK_W, 1)
    r = recons[0]
    for m in (1, 2, 3):
        r = jnp.where(mode_px == m, recons[m], r)
    return r


def _quantize_ab(ab, img_i):
    """Round/clip the continuous A/B and apply the format's channel
    reduction. If the source is fully opaque, keep the palette opaque: the
    554/555 reduction path needs alpha == 255 exactly."""
    all_opaque = jnp.all(img_i[..., 3] == 255)
    force = lambda x: x.at[..., 3].set(
        jnp.where(all_opaque, 255.0, x[..., 3]))
    a_i = jnp.clip(jnp.round(force(ab[0])), 0, 255).astype(jnp.int32)
    b_i = jnp.clip(jnp.round(force(ab[1])), 0, 255).astype(jnp.int32)
    return (pv._apply_color_channel_reduction(a_i, is_b=False),
            pv._apply_color_channel_reduction(b_i, is_b=True))


def _assign(img_i, a_q, b_q, h: int, w: int):
    """Final-form assignment: integer-exact candidate errors, per-pixel
    modulation, per-block packing mode."""
    a_up = pv._interpolate_upscaled(a_q, h, w)
    b_up = pv._interpolate_upscaled(b_q, h, w)
    err_m = _mod_errors_int(img_i, a_up, b_up)
    mod = jnp.argmin(err_m, axis=-1).astype(jnp.int32)
    modes = _choose_block_modes(mod, err_m, h, w)
    return mod, modes


def _encode_hq(image: jax.Array) -> jax.Array:
    """(H, W, 4) uint8 -> (num_blocks, 8) uint8 PVRTC 2BPP records
    (Z-order file layout), via alternating minimization."""
    h, w = image.shape[0], image.shape[1]
    nby, nbx = h // pv.BLOCK_H, w // pv.BLOCK_W
    img_i = image.astype(jnp.int32)
    img_f = image.astype(jnp.float32)

    lo, hi = pv._morph_extremes(img_i)
    ab = _shrunk_seed(lo, hi)
    upscale_f = _make_upscale_f(h, w, pv.BLOCK_H, pv.BLOCK_W)
    solve = lambda im, t, ab: _solve_ab(im, t, ab, upscale_f)

    ab = jax.lax.fori_loop(
        0, _OUTER_ITERS, _make_outer_step(img_f, upscale_f, solve), ab)

    # Packing-aware rounds: refit A/B against the modulation the decoder
    # will actually reconstruct under the chosen packing modes.
    def refine_step(_, ab):
        a_q, b_q = _quantize_ab(ab, img_i)
        mod, modes = _assign(img_i, a_q, b_q, h, w)
        t = _t_of(_recon_mod(mod, modes, h, w))
        return solve(img_f, t, ab)

    ab = jax.lax.fori_loop(0, _REFINE_CYCLES, refine_step, ab)

    a_q, b_q = _quantize_ab(ab, img_i)
    mod, modes = _assign(img_i, a_q, b_q, h, w)
    mod_words = pv._block_modulation_data(mod, modes).reshape(-1)
    color_words = pv._encode_colors(a_q, b_q, modes).reshape(-1)

    perm = jnp.asarray(pv.zorder_block_permutation(nbx, nby))
    return pv._pack_records(mod_words[perm], color_words[perm])


@partial(jax.jit, static_argnames=())
def encode_pvrtc_2bpp_hq_device(image: jax.Array) -> jax.Array:
    """HQ PVRTC 2BPP encode with a never-worse guarantee: returns whichever
    of {HQ, reference} payload decodes closer (squared RGBA error) to the
    source image under the documented reconstruction model."""
    h, w = image.shape[0], image.shape[1]
    ref = pv.encode_pvrtc_2bpp_device(image)
    hq = _encode_hq(image)

    img_f = image.astype(jnp.float32)

    def sse(payload):
        dec = pv.decode_pvrtc_2bpp_device(payload, height=h, width=w)
        d = dec.astype(jnp.float32) - img_f
        return jnp.sum(d * d)

    return jnp.where(sse(hq) <= sse(ref), hq, ref)


# ---------------------------------------------------------------------------
# 4bpp variant (codecs/pvrtc4.py is itself an extension; its HQ mode is
# simpler than 2bpp: all 16 modulation values are stored per 4x4 block, so
# there is no packing mode to pick and no packing-aware refit needed).
# ---------------------------------------------------------------------------


def _interpolate_upscaled4(low: jax.Array, h: int, w: int):
    """Integer bilinear wrap upscale for 4x4 blocks (/16), separable —
    matches codecs/pvrtc4._upscale4's corner/weight semantics on the
    (nby, nbx, 4) image-grid layout."""
    tmp = pv._upscale_axis(low, w, axis=1, block=4)
    full = pv._upscale_axis(tmp, h, axis=0, block=4)
    return full // 16


def _encode_hq4(image: jax.Array) -> jax.Array:
    """(H, W, 4) uint8 square power-of-two -> (NB, 8) uint8 4bpp records
    (Z-order), via the same alternating minimization as 2bpp."""
    h, w = image.shape[0], image.shape[1]
    nb = h // 4
    img_i = image.astype(jnp.int32)
    img_f = image.astype(jnp.float32)

    lo, hi = pv._morph_extremes(img_i, block_h=4, block_w=4)
    # 4bpp keeps the raw-extremes seed: the 2bpp shrink (s=0.5) measured
    # -0.25 dB on flower here and <=+0.01 elsewhere — with 4x the texel
    # density the extremes ramp is already near the optimum's width.
    ab = (lo.astype(jnp.float32), hi.astype(jnp.float32))
    upscale_f = _make_upscale_f(h, w, 4, 4)
    solve = lambda im, t, ab: _solve_ab(im, t, ab, upscale_f)

    ab = jax.lax.fori_loop(
        0, _OUTER_ITERS, _make_outer_step(img_f, upscale_f, solve), ab)

    a_q, b_q = _quantize_ab(ab, img_i)
    a_up = _interpolate_upscaled4(a_q, h, w)
    b_up = _interpolate_upscaled4(b_q, h, w)
    err_m = _mod_errors_int(img_i, a_up, b_up)
    mod = jnp.argmin(err_m, axis=-1).astype(jnp.uint32)

    # Pack: 2 bits per pixel, pixel (y, x) at bit 2*(y*4+x); color word with
    # mode flag 0 (standard weights), like codecs/pvrtc4.
    m = mod.reshape(nb, 4, nb, 4).transpose(0, 2, 1, 3).reshape(nb, nb, 16)
    pos = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    mod_words = jnp.bitwise_or.reduce(m << pos, axis=-1).reshape(-1)
    modes0 = jnp.zeros((nb, nb), dtype=jnp.int32)
    color_words = pv._encode_colors(a_q, b_q, modes0).reshape(-1)

    perm = jnp.asarray(pv.zorder_block_permutation(nb, nb))
    return pv._pack_records(mod_words[perm], color_words[perm])


@partial(jax.jit, static_argnames=())
def encode_pvrtc_4bpp_hq_device(image: jax.Array) -> jax.Array:
    """HQ PVRTC 4BPP encode, never worse than the one-shot extension
    encoder (codecs/pvrtc4.encode_pvrtc_4bpp_device) by decoded SSE."""
    from texcomp.codecs import pvrtc4

    h, w = image.shape[0], image.shape[1]
    ref = pvrtc4.encode_pvrtc_4bpp_device(image)
    hq = _encode_hq4(image)

    img_f = image.astype(jnp.float32)

    def sse(payload):
        dec = pvrtc4.decode_pvrtc_4bpp_device(payload, height=h, width=w)
        d = dec.astype(jnp.float32) - img_f
        return jnp.sum(d * d)

    return jnp.where(sse(hq) <= sse(ref), hq, ref)
