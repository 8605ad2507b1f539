"""High-quality DXT1/DXT5 encoding (EXTENSION — beats reference PSNR).

The reference encoder is a speed-first heuristic: endpoints are the min/max
*luminance* pixels (dxtc_compressor.cc:284-311) and indices minimize a
luminance-only distance (:315-349), which confuses iso-luminant colors. This
opt-in mode (DxtcCompressor(quality="high")) replaces endpoint selection
with PCA along the principal color axis plus alternating least-squares
refinement, and assigns indices by true squared-RGB distance against the
*hardware-decoded* palette (NVIDIA 565 expansion + integer thirds), so the
optimization target is exactly what a GPU will reconstruct.

Decode remains 100% standard — only encoder choices change; payloads stay
valid DXT and decode bit-exactly under the reference decoder. Alpha (DXT5)
keeps the reference scheme (it is already a dense 8-level fit).

Typical gain over the reference encoder: +2-4 dB PSNR on natural content.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from texcomp.codecs import dxt as dxt_ref
from texcomp.core import colors as cc

_REFINE_ITERS = 3
# Interpolation weights of palette entries p0, p1, p2, p3 as (w0, w1):
# decode computes p2 = (2*p0 + p1) / 3, p3 = (p0 + 2*p1) / 3.
# Module-level constants stay numpy: jnp arrays created at import time
# leak as tracers when the module is first imported inside a traced region
# (e.g. the asset pipeline's shard_map importing codecs lazily).
_CODE_W0 = np.asarray([1.0, 0.0, 2.0 / 3.0, 1.0 / 3.0], dtype=np.float32)
_CODE_W1 = np.asarray([0.0, 1.0, 1.0 / 3.0, 2.0 / 3.0], dtype=np.float32)
# Integer-scaled (x3) variants for the exact least-squares solve (see
# _least_squares_endpoints: integer summands make the reductions exact and
# therefore identical across backends).
_CODE_U0 = np.asarray([3.0, 0.0, 2.0, 1.0], dtype=np.float32)
_CODE_U1 = np.asarray([0.0, 3.0, 1.0, 2.0], dtype=np.float32)


def _hardware_palette(c0_16, c1_16):
    """Decoded 4-color palette per channel from packed 565 endpoints,
    always-4-color rule, exact integer semantics (dxtc_compressor.cc
    :167-192). Returns (N, 4) per channel."""
    e0 = [cc.extend565_r(c0_16 >> 11), cc.extend565_g((c0_16 >> 5) & 63),
          cc.extend565_b(c0_16 & 31)]
    e1 = [cc.extend565_r(c1_16 >> 11), cc.extend565_g((c1_16 >> 5) & 63),
          cc.extend565_b(c1_16 & 31)]
    pal = []
    for a, b in zip(e0, e1):
        p2 = cc.combine_int_fast(2, 1, a, b)
        p3 = cc.combine_int_fast(1, 2, a, b)
        pal.append(jnp.stack([a, b, p2, p3], axis=-1))
    return pal  # 3 x (N, 4)


def _assign_codes(rgb_f, c0_16, c1_16):
    """Nearest palette index by true squared-RGB distance against the
    hardware-decoded palette. rgb_f: (N, 16, 3) f32. Returns codes (N, 16)
    int32 and the summed block error (N,) f32."""
    pal = _hardware_palette(c0_16, c1_16)
    d = None
    for ch in range(3):
        diff = pal[ch].astype(jnp.float32)[:, None, :] - rgb_f[:, :, ch][:, :, None]
        d = diff * diff if d is None else d + diff * diff
    codes = jnp.argmin(d, axis=-1)
    err = jnp.sum(jnp.min(d, axis=-1), axis=-1)
    return codes, err


def _tab4(codes, tab):
    """tab[codes] for a 4-entry float table WITHOUT a gather: element
    gathers cost ~10 ns/element on TPU however expressed (CLAUDE.md
    playbook); three compare+selects are vector ops."""
    out = jnp.full(codes.shape, float(tab[0]), jnp.float32)
    for k in range(1, 4):
        out = jnp.where(codes == k, float(tab[k]), out)
    return out


def _least_squares_endpoints(rgb_f, codes, w0_tab=None, w1_tab=None,
                             scale: int = 3):
    """Solve min ||w0*e0 + w1*e1 - px||^2 over the block for e0, e1 given
    per-pixel weights; closed-form 2x2 normal equations per block/channel.

    EXACT cross-backend arithmetic: the tables are INTEGER-scaled weights
    (u = scale * w — e.g. thirds x3), so every reduction sums exact f32
    integers (order-independent; fractional-weight sums differ between
    CPU and TPU reduction orders, which made TPU HQ bytes diverge from
    CPU — tools/tpu_parity_smoke.py). Solving the scaled system
    (A_u = scale^2 A, b_u = scale b) gives y = x / scale, so the result
    is rescaled at the end; a zero/nonzero det test is exact on the
    integer-valued det_u."""
    w0 = _tab4(codes, _CODE_U0 if w0_tab is None else w0_tab).astype(
        jnp.int32)
    w1 = _tab4(codes, _CODE_U1 if w1_tab is None else w1_tab).astype(
        jnp.int32)
    a00 = jnp.sum(w0 * w0, axis=1)
    a01 = jnp.sum(w0 * w1, axis=1)
    a11 = jnp.sum(w1 * w1, axis=1)
    det = a00 * a11 - a01 * a01  # exact int32
    safe = det != 0
    det_f = jnp.where(safe, det, 1).astype(jnp.float32)
    s = float(scale)
    rgb_i = rgb_f.astype(jnp.int32)

    rdet = _det_recip(det_f)  # hardware divide is NOT backend-stable
    _nc = jax.lax.optimization_barrier
    e0 = []
    e1 = []
    for ch in range(3):
        px = rgb_i[:, :, ch]
        b0 = jnp.sum(w0 * px, axis=1)
        b1 = jnp.sum(w1 * px, axis=1)
        # Numerators in int32 (|.| <= scale^2*16 * scale*255*16 < 2^31):
        # the only roundings are the int->f32 conversion and the two
        # pinned muls below — all individually IEEE-rounded, so the
        # result is bit-identical across backends.
        x0 = _nc(_nc(s * (a11 * b0 - a01 * b1).astype(jnp.float32)) * rdet)
        x1 = _nc(_nc(s * (a00 * b1 - a01 * b0).astype(jnp.float32)) * rdet)
        # Degenerate (all pixels on one endpoint): keep that endpoint.
        fallback = jnp.sum(px, axis=1).astype(jnp.float32) / 16.0
        e0.append(jnp.clip(jnp.where(safe, x0, fallback), 0.0, 255.0))
        e1.append(jnp.clip(jnp.where(safe, x1, fallback), 0.0, 255.0))
    return e0, e1


def _quantize_endpoints(e0, e1):
    """Round float endpoints to packed 565. The 31/255 and 63/255 factors
    are host-precomputed f32 constants so quantization is ONE deterministic
    mul + round — `v * m / 255.0` would end in a hardware divide, which is
    backend-dependent in the last ulp on TPU (see _det_recip)."""
    q = lambda v, bits: jnp.clip(
        jnp.round(v * np.float32(((1 << bits) - 1) / 255.0)),
        0, (1 << bits) - 1).astype(jnp.int32)
    c0 = (q(e0[0], 5) << 11) | (q(e0[1], 6) << 5) | q(e0[2], 5)
    c1 = (q(e1[0], 5) << 11) | (q(e1[1], 6) << 5) | q(e1[2], 5)
    return c0, c1


def _pca_project(rgb_f):
    """Principal-axis projections: 3 power iterations on the 3x3 block
    covariance. Returns (mean (N, 1, 3), axis (N, 3), t (N, 16)).

    EXACT cross-backend arithmetic (tools/tpu_parity_smoke.py): the
    covariance is computed in int32 on 16x-scaled centered pixels (sums
    of products fit in int32; integer reductions are order-independent,
    where f32 matmuls — even at HIGHEST precision — round differently on
    the MXU vs the CPU). The power iteration and projections are then
    unrolled elementwise ops, which are IEEE-deterministic everywhere."""
    n = rgb_f.shape[0]
    rgb_i = rgb_f.astype(jnp.int32)
    s = jnp.sum(rgb_i, axis=1)  # (N, 3)
    d16 = 16 * rgb_i - s[:, None, :]  # (N, 16, 3): 16 * (px - mean)
    # 3x3 covariance (x256 scaled): 6 unique int32 entries, each a sum of
    # 16 exact products |.| <= 16 * 4080^2 < 2^31.
    cov = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i, 3):
            cij = jnp.sum(d16[:, :, i] * d16[:, :, j], axis=1)
            cov[i][j] = cov[j][i] = cij.astype(jnp.float32)
    mean = (s.astype(jnp.float32) / 16.0)[:, None, :]  # (N, 1, 3)
    v = [jnp.ones((n,), jnp.float32) for _ in range(3)]
    # _nc (no-contract): pin every fractional product to a materialized
    # f32 before the adjacent add. XLA's FMA contraction keeps the
    # infinitely-precise product on one backend and rounds it on the
    # other (TPU VPU fma vs CPU mul+add), which flipped downstream
    # quantized codes on ~0.1% of blocks (tools/tpu_parity_smoke.py).
    # Integer-valued products are immune (exact either way) — only the
    # fractional chains below need the barrier.
    _nc = jax.lax.optimization_barrier
    for _ in range(3):
        w = [_nc(cov[i][0] * v[0]) + _nc(cov[i][1] * v[1])
             + _nc(cov[i][2] * v[2]) for i in range(3)]
        # Normalize with the deterministic Newton rsqrt: jnp.sqrt and the
        # hardware divide are both backend-dependent in the last ulp on
        # TPU (see _det_recip). The 1e-12 guard keeps solid blocks
        # (w == 0) at v == 0 exactly, like the old sqrt(0) + 1e-6 path.
        inv = _det_rsqrt(_nc(w[0] * w[0]) + _nc(w[1] * w[1])
                         + _nc(w[2] * w[2]) + 1e-12)
        v = [_nc(wi * inv) for wi in w]
    d = rgb_f - mean  # (N, 16, 3) — exact (x/16 fractions)
    t = (_nc(d[:, :, 0] * v[0][:, None]) + _nc(d[:, :, 1] * v[1][:, None])
         + _nc(d[:, :, 2] * v[2][:, None]))  # (N, 16)
    return mean, jnp.stack(v, axis=-1), t


def _pca_endpoints(rgb_f, proj=None):
    """Initial endpoints: the extreme projections along the principal
    axis. ``proj`` reuses a precomputed _pca_project result."""
    mean, v, t = _pca_project(rgb_f) if proj is None else proj
    tmin = jnp.min(t, axis=1, keepdims=True)
    tmax = jnp.max(t, axis=1, keepdims=True)
    _nc = jax.lax.optimization_barrier  # see _pca_project
    e0 = mean[:, 0, :] + _nc(tmin * v)  # (N, 3)
    e1 = mean[:, 0, :] + _nc(tmax * v)
    e0 = jnp.clip(e0, 0.0, 255.0)
    e1 = jnp.clip(e1, 0.0, 255.0)
    return ([e0[:, c] for c in range(3)], [e1[:, c] for c in range(3)])


# --- cluster-fit enumeration (squish-style, 4-color mode) ---------------
#
# The optimal 4-color index assignment is contiguous along the principal
# axis (the palette is collinear), so the full assignment space collapses
# to the 969 ordered partitions (c1 <= c2 <= c3 in 0..16) of the 16
# axis-sorted pixels into the ramp clusters with weights w0 = 1, 2/3,
# 1/3, 0. For each partition the least-squares endpoints are closed-form
# in the sorted prefix sums P: with u = P[c1] + P[c2] + P[c3] and the
# block total Pt, the normal equations' RHS is (b0, b1) = (u/3, Pt - u/3)
# and the 2x2 system matrix depends only on the cluster counts — so its
# inverse (alpha, beta, delta) and the resulting error-minimizing score
#   score = alpha*b0^2 + 2*beta*b0*b1 + delta*b1^2   (summed over RGB)
# are precomputable per partition. Scoring all partitions is one
# (N, 17, 3) x (17, P) matmul + elementwise math; only the top-k scoring
# partitions get quantized + exactly re-scored. Partitions with singular
# normal equations (everything in one endpoint cluster) are excluded at
# module level — their solutions are spanned by the other candidates.
def _cluster_tables():
    # All ordered cuts, weight orientation fixed at (1, 2/3, 1/3, 0): no
    # duplicates — reversing the weights on the same cuts is the endpoint
    # swap (same candidate), but that orientation is never enumerated;
    # mirrored cuts (16-c3, 16-c2, 16-c1) are genuinely different
    # clusterings (verified: halving by that "symmetry" lost 0.04 dB).
    parts = np.array(
        [(c1, c2, c3)
         for c1 in range(17)
         for c2 in range(c1, 17)
         for c3 in range(c2, 17)],
        np.int64,
    )
    n0 = parts[:, 0].astype(np.float64)
    n1 = (parts[:, 1] - parts[:, 0]).astype(np.float64)
    n2 = (parts[:, 2] - parts[:, 1]).astype(np.float64)
    n3 = 16.0 - parts[:, 2].astype(np.float64)
    a00 = n0 + 4.0 * n1 / 9.0 + n2 / 9.0
    a01 = 2.0 * (n1 + n2) / 9.0
    a11 = n3 + 4.0 * n2 / 9.0 + n1 / 9.0
    det = a00 * a11 - a01 * a01
    keep = np.abs(det) > 1e-9
    parts, a00, a01, a11, det = (x[keep] for x in (parts, a00, a01, a11, det))
    alpha = a11 / det
    beta = -a01 / det
    delta = a00 / det
    # Prefix-sum selection matrix: U[:, p] = P[c1] + P[c2] + P[c3].
    sel = np.zeros((17, parts.shape[0]), np.float32)
    for k in range(3):
        np.add.at(sel, (parts[:, k], np.arange(parts.shape[0])), 1.0)
    # Quadratic score coefficients in (u, Pt): b0 = u/3, b1 = Pt - u/3.
    quu = (alpha - 2.0 * beta + delta) / 9.0
    qut = 2.0 * (beta - delta) / 3.0
    qtt = delta
    f32 = lambda x: x.astype(np.float32)
    # Pick table: one (P, 20) row per partition = [sel row | alpha, beta,
    # delta], selected per block by a single one-hot matmul.
    pick = np.concatenate(
        [sel.T, f32(alpha)[:, None], f32(beta)[:, None], f32(delta)[:, None]],
        axis=1,
    ).astype(np.float32)
    return (sel, pick, f32(quu), f32(qut), f32(qtt),
            f32(alpha), f32(beta), f32(delta))


(_CF_SEL, _CF_PICK, _CF_QUU, _CF_QUT, _CF_QTT,
 _CF_ALPHA, _CF_BETA, _CF_DELTA) = _cluster_tables()
_CLUSTER_TOPK = 4


def _round_bf16(x: np.ndarray) -> np.ndarray:
    """Round f32 values to the nearest bfloat16 (round-half-even),
    returned as f32. Score constants are pre-split into bf16 hi + lo
    components so every score product multiplies two <= 8-bit mantissas —
    exactly representable in f32, which makes fma contraction a no-op
    (fma(a, b, c) == round(a*b) + c when a*b is exact) and the score
    bit-identical across XLA CPU, XLA TPU, and Mosaic without any
    optimization_barrier (barriers do not survive Mosaic/interpret
    lowering)."""
    u = x.astype(np.float32).view(np.uint32)
    u = (u + np.uint32(0x7FFF) + ((u >> np.uint32(16)) & np.uint32(1)))
    return (u & np.uint32(0xFFFF0000)).view(np.float32)


def _split_bf16(x: np.ndarray):
    """f32 -> (hi, lo) bf16-representable f32 pair, hi + lo accurate to
    ~2^-16 relative — one bf16 component alone (2^-8) mis-ranked enough
    near-tied partitions to cost 0.15-0.19 dB on the QUALITY.md photos."""
    xf = x.astype(np.float32)
    hi = _round_bf16(xf)
    lo = _round_bf16((xf - hi).astype(np.float32))
    return hi, lo


def _det_recip(b):
    """Deterministic f32 reciprocal: barrier-pinned Newton from a bit-hack
    seed. Hardware f32 division is NOT cross-backend deterministic — the
    TPU's is ~1 ulp off the CPU's correctly-rounded result, which flipped
    quantized HQ endpoints on near-tie blocks (tools/tpu_parity_smoke.py,
    2026-08-20). Every op here is an individually-rounded IEEE mul/add
    (products pinned against fma contraction), so the result is
    bit-identical on every backend; 4 Newton steps reach ~1 ulp of 1/b
    over [1e-12, 1e18] (brute-verified vs f64 on 2M log-uniform samples).
    The value may differ from the correctly-rounded quotient in the last
    ulp — deterministically, which is what the candidate search needs."""
    _nc = jax.lax.optimization_barrier
    bits = jax.lax.bitcast_convert_type(b.astype(jnp.float32), jnp.int32)
    r = jax.lax.bitcast_convert_type(jnp.int32(0x7EF311C3) - bits,
                                     jnp.float32)
    for _ in range(4):
        r = _nc(r * _nc(2.0 - _nc(b * r)))
    return r


def _det_rsqrt(x):
    """Deterministic f32 1/sqrt(x) (see _det_recip): barrier-pinned Newton
    from the classic 0x5F3759DF seed, 4 steps (~1 ulp over [1e-12, 2e17],
    brute-verified vs f64). Replaces jnp.sqrt + divide, both of which are
    backend-dependent in the last ulp on TPU."""
    _nc = jax.lax.optimization_barrier
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    y = jax.lax.bitcast_convert_type(
        jnp.int32(0x5F3759DF) - (bits >> 1), jnp.float32)
    for _ in range(4):
        y = _nc(y * _nc(1.5 - _nc(0.5 * _nc(x * _nc(y * y)))))
    return y


@lru_cache(maxsize=1)
def _cf_device_tables():
    """Padded partition tables for ops.dxt_pallas.cluster_topk4: selt
    (P4, 24) prefix-selection rows, qtab (P4, 16) = [quu_h, quu_l,
    qut_h, qut_l, qtt_h, qtt_l, bias, 0, alpha, beta, delta, 0...] with
    the score constants bf16 hi/lo-split (see _split_bf16); pad rows
    select nothing and carry a bias below any real score so they never
    reach the top-4."""
    from texcomp.ops.dxt_pallas import _CF_NEG

    p = _CF_SEL.shape[1]
    p4 = ((p + 127) // 128) * 128
    selt = np.zeros((p4, 24), np.float32)
    selt[:p, :17] = _CF_SEL.T
    qtab = np.zeros((p4, 16), np.float32)
    for col, const in ((0, _CF_QUU), (2, _CF_QUT), (4, _CF_QTT)):
        hi, lo = _split_bf16(const)
        qtab[:p, col] = hi
        qtab[:p, col + 1] = lo
    qtab[p:, 6] = _CF_NEG
    qtab[:p, 8] = _CF_ALPHA
    qtab[:p, 9] = _CF_BETA
    qtab[:p, 10] = _CF_DELTA
    return selt, qtab


# Blocks per cluster-fit chunk: bounds the live (chunk, P) f32 planes to
# ~250 MB regardless of image size (a whole-image 8192² HQ encode would
# otherwise materialize a 16 GB score plane).
_CLUSTER_CHUNK = 1 << 16
# All dots below need true f32: the TPU default matmul precision is one
# bf16 pass, which rounds prefix sums (ints up to 4080 need 12 mantissa
# bits) and the irrational alpha/beta/delta — HIGHEST restores f32-exact
# products for these magnitudes at negligible cost on these small dots.
_F32 = jax.lax.Precision.HIGHEST


def _cluster_fit_chunk(rgb_f, t, topk):
    """Cluster-fit topk candidates for one chunk: ((topk, C), (topk, C))
    packed-565 endpoint arrays."""
    n = rgb_f.shape[0]
    # Descending-projection prefix sums WITHOUT a sort: p[r] is the sum of
    # the r largest-projection pixels, i.e. sum_i [rank_i < r] * px_i with
    # rank_i = #{j : t_j > t_i} + #{j < i : t_j == t_i} (the stable
    # descending rank argsort(-t) assigns). The old argsort +
    # take_along_axis was 8.8 ms at 1024^2 — element gathers at ~10 ns
    # each; this is (N, 16, 16) compares + 17 masked reductions, all
    # fusable vector ops. Order of summation differs from the cumsum but
    # every sum is integer-valued < 2^24, so f32 is exact either way.
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 16), 1)  # pixel i
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 16), 2)  # pixel j
    tj = t[:, None, :]
    ti = t[:, :, None]
    rank = jnp.sum(
        ((tj > ti) | ((tj == ti) & (jj < ii))).astype(jnp.int32), axis=2
    )  # (C, 16)
    p = jnp.stack(
        [jnp.sum(jnp.where((rank < r)[:, :, None], rgb_f, 0.0), axis=1)
         for r in range(17)],
        axis=1,
    )  # (C, 17, 3) prefix sums
    # Stage barriers: p feeds the score loop AND every pick; without them
    # XLA re-materializes the sort/cumsum (and the score) per consumer
    # (measured 5x: ~1.5 s vs ~0.3 s at N=16384 on CPU).
    p = jax.lax.optimization_barrier(p)
    pt = p[:, 16, :]  # (C, 3)
    _nc = jax.lax.optimization_barrier  # see _pca_project (no-contract)

    # Partition scoring + top-4 selection. Both paths compute the SAME
    # integer-exact terms (uc, A = sum uc^2, B = sum pt*uc, ptt — all
    # int32-exact, so order-free) and the SAME fixed f32 combine tree
    # ((quu*A + qut*B) + qtt*ptt), so scores and therefore picks are
    # bit-identical across backends:
    #   * Pallas kernel (accelerators): every (tile, 128)-partition score
    #     lives in VMEM — the barrier-pinned XLA route materializes
    #     several (C, 969) f32 HBM planes (~11 ms of the 16.7 ms FULL at
    #     1024^2, tools/profile_hq_stages.py "cur +score").
    #   * jnp route (CPU / ground truth): HIGHEST-precision matmuls for
    #     uc, int32 A/B, barrier-pinned f32 combine, then top-4 by
    #     ITERATED argmax + index masking (ties to the lowest partition
    #     index — the kernel's strict-> insertion matches exactly).
    # Each pick's payload is (u (3,), alpha, beta, delta); the shared
    # tail below turns payloads into quantized 565 endpoint candidates.
    from texcomp import ops as _ops

    picks = []  # topk x (uk (C, 3), al, be, de (C, 1))
    if _ops.use_pallas() and topk == _CLUSTER_TOPK:
        from texcomp.ops.dxt_pallas import cluster_topk4

        selt, qtab = _cf_device_tables()
        p72 = jnp.pad(p, ((0, 0), (0, 7), (0, 0)))  # (C, 24, 3)
        p72 = p72.transpose(2, 1, 0).reshape(72, n)
        payload = cluster_topk4(p72, jnp.asarray(selt), jnp.asarray(qtab))
        for k in range(topk):
            uk = payload[6 * k:6 * k + 3].T  # (C, 3)
            al = payload[6 * k + 3][:, None]
            be = payload[6 * k + 4][:, None]
            de = payload[6 * k + 5][:, None]
            picks.append((uk, al, be, de))
    else:
        from texcomp.ops.dxt_pallas import cf_score

        _, qtab_np = _cf_device_tables()
        npart = _CF_SEL.shape[1]
        sel = jnp.asarray(_CF_SEL)  # (17, P)
        pti = pt.astype(jnp.int32)
        ptt_i = (pti[:, 0] * pti[:, 0] + pti[:, 1] * pti[:, 1]
                 + pti[:, 2] * pti[:, 2])[:, None]
        uc = [jnp.matmul(p[:, :, c], sel, precision=_F32).astype(jnp.int32)
              for c in range(3)]  # (C, P) exact ints
        a_i = uc[0] * uc[0] + uc[1] * uc[1] + uc[2] * uc[2]
        b_i = (pti[:, 0:1] * uc[0] + pti[:, 1:2] * uc[1]
               + pti[:, 2:3] * uc[2])
        # Contraction-immune score, the kernel's exact twin (cf_score:
        # same op tree, bf16 hi/lo-split factors, exact products — XLA's
        # fma choices cannot change a bit on any backend).
        qrow = lambda col: jnp.asarray(qtab_np[:npart, col])[None, :]
        score = cf_score(a_i, b_i, ptt_i, qrow(0), qrow(1), qrow(2),
                         qrow(3), qrow(4), qrow(5))
        score = jax.lax.optimization_barrier(score)

        npart = _CF_SEL.shape[1]
        pick_tab = jnp.asarray(_CF_PICK)  # (P, 20)
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, npart), 1)
        for k in range(topk):
            kidx = jnp.argmax(score, axis=1)  # (C,) first-occurrence max
            onehot = (kidx[:, None] == iota_p).astype(jnp.float32)
            if k + 1 < topk:
                score = jax.lax.optimization_barrier(
                    jnp.where(onehot != 0.0, -jnp.inf, score))
            picked = jnp.matmul(onehot, pick_tab, precision=_F32)  # (C, 20)
            w = picked[:, :17]  # per-block sel row (counts 0..3)
            uk = jnp.einsum("ni,nic->nc", w, p, precision=_F32)  # exact ints
            picks.append((uk, picked[:, 17:18], picked[:, 18:19],
                          picked[:, 19:20]))

    c0s, c1s = [], []
    for uk, al, be, de in picks:
        # One deterministic mul, not a backend-dependent hardware divide
        # (see _det_recip); uk is an exact integer so the only rounding
        # is this product's.
        b0 = _nc(uk * np.float32(1.0 / 3.0))
        b1 = pt - b0
        e0 = jnp.clip(_nc(al * b0) + _nc(be * b1), 0.0, 255.0)
        e1 = jnp.clip(_nc(be * b0) + _nc(de * b1), 0.0, 255.0)
        c0, c1 = _quantize_endpoints(
            [e0[:, c] for c in range(3)], [e1[:, c] for c in range(3)]
        )
        c0s.append(c0)
        c1s.append(c1)
    return jnp.stack(c0s), jnp.stack(c1s)


def _cluster_fit_candidates(rgb_f, t=None, topk: int = _CLUSTER_TOPK):
    """Top-k cluster-fit endpoint candidates as packed-565 (c0, c1) pairs.

    Squish-style joint solve: see _cluster_tables. The iterated-LS search
    in _hq_color_words only refines a fixed assignment; this enumerates
    assignments, which is where the remaining ~0.2 dB lives (measured on
    the QUALITY.md photo set). ``t``: the _pca_project projections (pass
    the caller's copy — recomputing risks a diverged sort axis).

    Large inputs run as a lax.map over _CLUSTER_CHUNK-block chunks so
    peak memory is image-size-independent."""
    n = rgb_f.shape[0]
    if t is None:
        _, _, t = _pca_project(rgb_f)
    if n <= _CLUSTER_CHUNK:
        c0s, c1s = _cluster_fit_chunk(rgb_f, t, topk)
    else:
        pad = (-n) % _CLUSTER_CHUNK
        nc = (n + pad) // _CLUSTER_CHUNK
        rgb_p = jnp.pad(rgb_f, ((0, pad), (0, 0), (0, 0)))
        t_p = jnp.pad(t, ((0, pad), (0, 0)))
        c0s, c1s = jax.lax.map(
            lambda a: _cluster_fit_chunk(a[0], a[1], topk),
            (rgb_p.reshape(nc, _CLUSTER_CHUNK, 16, 3),
             t_p.reshape(nc, _CLUSTER_CHUNK, 16)),
        )  # (nc, topk, chunk)
        c0s = jnp.moveaxis(c0s, 1, 0).reshape(topk, -1)[:, :n]
        c1s = jnp.moveaxis(c1s, 1, 0).reshape(topk, -1)[:, :n]
    return [(c0s[k], c1s[k]) for k in range(topk)]


def _perturb_565(c, ch: int, d: int):
    """c with 565 field ``ch`` (0=r, 1=g, 2=b) moved by d code points,
    clamped to the field's range."""
    shift = (11, 5, 0)[ch]
    bits = (5, 6, 5)[ch]
    f = (c >> shift) & ((1 << bits) - 1)
    f2 = jnp.clip(f + d, 0, (1 << bits) - 1)
    return (c & ~(((1 << bits) - 1) << shift)) | (f2 << shift)


_pack_rows = dxt_ref._pack_rows


def _hq_color_words(rgb):
    """HQ endpoint search. rgb: (N, 16, 3) int32. Returns (c0_16, c1_16,
    rows) like dxt_ref._encode_dxt1_words, always using 4-color mode."""
    rgb_f = rgb.astype(jnp.float32)

    proj = _pca_project(rgb_f)  # shared by the seed AND the cluster sort
    e0, e1 = _pca_endpoints(rgb_f, proj)
    c0, c1 = _quantize_endpoints(e0, e1)
    codes, best_err = _assign_codes(rgb_f, c0, c1)
    best = (c0, c1, codes)

    def take(c0, c1, best, best_err):
        codes, err = _assign_codes(rgb_f, c0, c1)
        improved = err < best_err
        best = (
            jnp.where(improved, c0, best[0]),
            jnp.where(improved, c1, best[1]),
            jnp.where(improved[:, None], codes, best[2]),
        )
        return codes, best, jnp.minimum(err, best_err)

    for _ in range(_REFINE_ITERS):
        e0, e1 = _least_squares_endpoints(rgb_f, codes)
        c0, c1 = _quantize_endpoints(e0, e1)
        codes, best, best_err = take(c0, c1, best, best_err)

    # ±1 code-point neighborhood of the converged endpoints, per endpoint
    # and channel: quantization rounds each 565 field independently, but
    # the best joint endpoint pair often sits one code point off (the
    # palette thirds move by a fraction of a code point). _assign_codes
    # scores with the exact hardware-decoded palette, so this selection is
    # by true 4-color error.
    bc0, bc1 = best[0], best[1]
    for ch in range(3):
        for d in (-1, 1):
            _, best, best_err = take(_perturb_565(bc0, ch, d), bc1,
                                     best, best_err)
            _, best, best_err = take(bc0, _perturb_565(bc1, ch, d),
                                     best, best_err)

    # Cluster-fit assignment enumeration: each top-k partition's exact LS
    # endpoints, scored exactly, plus one LS refit from its induced
    # assignment (A/B on the QUALITY.md photos: +0.18-0.19 dB over the
    # iterated-LS + probes incumbent; per-candidate probes add <0.01 dB
    # more and are omitted).
    for c0_k, c1_k in _cluster_fit_candidates(rgb_f, proj[2]):
        codes_k, best, best_err = take(c0_k, c1_k, best, best_err)
        e0, e1 = _least_squares_endpoints(rgb_f, codes_k)
        _, best, best_err = take(*_quantize_endpoints(e0, e1),
                                 best, best_err)

    c0, c1, codes = best
    # Enforce c0 > c1 (4-color mode) by swapping endpoints and remapping
    # codes 0<->1, 2<->3. Equal endpoints: all codes -> 0 (either decodes
    # the same color; index 0 is cheapest).
    swap = c0 < c1
    c0_f = jnp.where(swap, c1, c0)
    c1_f = jnp.where(swap, c0, c1)
    codes = jnp.where(swap[:, None], codes ^ 1, codes)
    codes = jnp.where((c0_f == c1_f)[:, None], 0, codes)
    # best_err is the exact decoded squared-RGB error of the returned
    # block: _assign_codes scores against the hardware palette, and the
    # swap/equal normalizations above don't change decoded values (equal
    # endpoints collapse the whole palette to one color in both the
    # 4-color and 3-color decode rules).
    return c0_f, c1_f, _pack_rows(codes), best_err


# 3-color mode (c0 <= c1): palette [e0, e1, (e0+e1)/2, black]. Weights for
# the least-squares refit; black contributes nothing (free = 0 drops the
# pixel from the normal equations). Integer-scaled x2 for the exact solve.
_CODE3_U0 = np.asarray([2.0, 0.0, 1.0, 0.0], dtype=np.float32)
_CODE3_U1 = np.asarray([0.0, 2.0, 1.0, 0.0], dtype=np.float32)


def _assign_codes3(rgb_f, c0_16, c1_16):
    """Nearest index against the exact 3-color-mode palette
    (DecodeColors with c0 <= c1, dxtc_compressor.cc:183-191): entry 2 is
    the integer average, entry 3 black."""
    e0 = [cc.extend565_r(c0_16 >> 11), cc.extend565_g((c0_16 >> 5) & 63),
          cc.extend565_b(c0_16 & 31)]
    e1 = [cc.extend565_r(c1_16 >> 11), cc.extend565_g((c1_16 >> 5) & 63),
          cc.extend565_b(c1_16 & 31)]
    d = None
    for ch in range(3):
        mid = cc.combine_int_fast(1, 1, e0[ch], e1[ch])
        pal = jnp.stack([e0[ch], e1[ch], mid, jnp.zeros_like(mid)], axis=-1)
        diff = pal.astype(jnp.float32)[:, None, :] - rgb_f[:, :, ch][:, :, None]
        d = diff * diff if d is None else d + diff * diff
    codes = jnp.argmin(d, axis=-1)
    err = jnp.sum(jnp.min(d, axis=-1), axis=-1)
    return codes, err


def _hq3_color_words(rgb, init_c0, init_c1):
    """3-color-mode candidate (c0 <= c1; palette midpoint + black). Helps
    blocks containing near-black pixels, which the 4-color ramp must span.
    Returns packed (N, 8) uint8 blocks."""
    rgb_f = rgb.astype(jnp.float32)
    codes, best_err = _assign_codes3(rgb_f, init_c0, init_c1)
    best = (init_c0, init_c1, codes)

    for _ in range(2):
        e0, e1 = _least_squares_endpoints(rgb_f, codes, w0_tab=_CODE3_U0,
                                          w1_tab=_CODE3_U1, scale=2)
        c0, c1 = _quantize_endpoints(e0, e1)
        codes, err = _assign_codes3(rgb_f, c0, c1)
        improved = err < best_err
        best = (
            jnp.where(improved, c0, best[0]),
            jnp.where(improved, c1, best[1]),
            jnp.where(improved[:, None], codes, best[2]),
        )
        best_err = jnp.minimum(err, best_err)

    c0, c1, codes = best
    # 3-color decode requires c0 <= c1: swap + remap 0<->1 (entries 2, 3
    # are symmetric). The c0 == c1 degenerate palette differs from the
    # search palette: the decoder maps code 3 to ch1 (DecodeColors'
    # ``equal`` rule), not black — correct best_err for those blocks so
    # the returned error is the exact decoded error (every palette entry
    # then decodes to e0, so the block error is just sum((e0 - px)^2)).
    swap = c0 > c1
    c0_f = jnp.where(swap, c1, c0)
    c1_f = jnp.where(swap, c0, c1)
    codes = jnp.where(swap[:, None] & (codes < 2), codes ^ 1, codes)
    e0 = jnp.stack(
        [cc.extend565_r(c0_f >> 11), cc.extend565_g((c0_f >> 5) & 63),
         cc.extend565_b(c0_f & 31)], axis=-1
    ).astype(jnp.float32)  # (N, 3)
    d = e0[:, None, :] - rgb_f
    err_equal = jnp.sum(d * d, axis=(1, 2))
    best_err = jnp.where(c0_f == c1_f, err_equal, best_err)
    return dxt_ref._dxt1_bytes(c0_f, c1_f, _pack_rows(codes)), best_err


def _true_block_error(data, rgb, always4: bool):
    """Exact decoded squared-RGB error of DXT1 payloads vs source pixels."""
    dec = dxt_ref._decode_dxt1_channels(data, always4).astype(jnp.float32)
    d = dec - rgb.astype(jnp.float32)
    return jnp.sum(d * d, axis=(1, 2))  # (N,)


def _block_error_from_words(rgb_f, c0_16, c1_16, codes, always4: bool):
    """Exact decoded squared-RGB error from unpacked block fields,
    gather-free (the byte-payload route through _decode_dxt1_channels
    costs ~35 ms at 1024^2 in take_along_axis gathers). Replicates
    DecodeColors' palette rules (dxtc_compressor.cc:167-192) including
    the equal-endpoint and 3-color cases, and selects the per-pixel
    palette entry with compare+selects instead of a gather."""
    e0 = [cc.extend565_r(c0_16 >> 11), cc.extend565_g((c0_16 >> 5) & 63),
          cc.extend565_b(c0_16 & 31)]
    e1 = [cc.extend565_r(c1_16 >> 11), cc.extend565_g((c1_16 >> 5) & 63),
          cc.extend565_b(c1_16 & 31)]
    equal = c0_16 == c1_16
    four = (jnp.ones_like(equal) if always4 else c0_16 > c1_16)
    err = None
    for ch in range(3):
        p2_4 = cc.combine_int_fast(2, 1, e0[ch], e1[ch])
        p3_4 = cc.combine_int_fast(1, 2, e0[ch], e1[ch])
        p2_3 = cc.combine_int_fast(1, 1, e0[ch], e1[ch])
        p2 = jnp.where(equal, e1[ch], jnp.where(four, p2_4, p2_3))
        p3 = jnp.where(equal, e1[ch],
                       jnp.where(four, p3_4, jnp.zeros_like(e0[ch])))
        val = jnp.where(
            codes == 0, e0[ch][:, None],
            jnp.where(codes == 1, e1[ch][:, None],
                      jnp.where(codes == 2, p2[:, None], p3[:, None])))
        d = val.astype(jnp.float32) - rgb_f[:, :, ch]
        err = d * d if err is None else err + d * d
    return jnp.sum(err, axis=1)  # (N,)


# Bit position of pixel p's 2-bit code inside the LE index word: byte
# p//4 (row), bits 2*(p%4) within the byte.
_ROW_SHIFTS = np.asarray([8 * (p // 4) + 2 * (p % 4) for p in range(16)],
                         dtype=np.uint32)


def _ref_dxt1_candidate(rgb, always4: bool, swap: bool, pixel_words=None):
    """The reference encoder's block as (c0_16, c1_16, codes, rows): the
    never-worse baseline candidate. On accelerators this runs the Pallas
    word-emitting kernel (bit-identical to the jnp path, test_pallas.py;
    ~160x faster than the XLA encode at 1024^2); on CPU the jnp
    reference-parity path. ``pixel_words``: optional (16, N) uint32
    packed pixels (pack_rgb_image layout) — the image entry points pass
    them through so the kernel input needs no repack/transpose."""
    from texcomp import ops as _ops

    if _ops.use_pallas():
        from texcomp.ops import dxt_pallas

        if pixel_words is None:
            px = (rgb[:, :, 0].astype(jnp.uint32)
                  | (rgb[:, :, 1].astype(jnp.uint32) << 8)
                  | (rgb[:, :, 2].astype(jnp.uint32) << 16))  # (N, 16)
            pixel_words = px.T
        words = dxt_pallas.encode_dxt1_words(pixel_words, always4=always4,
                                             swap=swap)  # (2, N) uint32
        w0, w1 = words[0], words[1]
        c0 = (w0 & jnp.uint32(0xFFFF)).astype(jnp.int32)
        c1 = (w0 >> 16).astype(jnp.int32)
        codes = ((w1[:, None] >> jnp.asarray(_ROW_SHIFTS)[None, :])
                 & jnp.uint32(3)).astype(jnp.int32)  # (N, 16)
        rows = jnp.stack(
            [((w1 >> (8 * k)) & jnp.uint32(255)).astype(jnp.int32)
             for k in range(4)], axis=-1)  # (N, 4)
        return c0, c1, codes, rows
    c0, c1, rows = dxt_ref._encode_dxt1_words(rgb, always4, swap)
    shifts = jnp.arange(4, dtype=jnp.int32) * 2
    codes = ((rows[:, :, None] >> shifts[None, None, :]) & 3).reshape(-1, 16)
    return c0, c1, codes, rows


def _encode_dxt1_hq(rgb, swap_red_and_blue: bool, pixel_words=None):
    """Shared body of encode_dxt1_hq_blocks / encode_dxt1_hq_image.

    Guaranteed per-block error <= the reference encoder's: both encodings
    are produced and the one with the smaller true decoded error wins (the
    reference's constant-color LUT path still wins on near-solid blocks,
    where its sub-565 interpolated endpoints beat a 4-color fit).

    For BGR sources pass the blocks pre-swapped to RGB order plus
    ``swap_red_and_blue=True``: the HQ search itself is channel-permutation
    invariant (squared-RGB error), but the reference candidate re-applies
    the const-color double swap (dxtc_compressor.cc:360), which the flag
    preserves — keeping the never-worse guarantee exact for BGR too.

    Every candidate's exact decoded error is tracked by its own search
    (or computed gather-free for the reference candidate), so no payload
    is ever re-decoded — the decode-based best-of cost ~105 ms of the
    round-4 130 ms at 1024^2 (tools/profile_hq_stages.py)."""
    rgb_f = rgb.astype(jnp.float32)
    c0, c1, rows, err_hq = _hq_color_words(rgb)
    hq = dxt_ref._dxt1_bytes(c0, c1, rows)
    # The hq candidate decodes under always4=False: c0 > c1 is enforced
    # (4-color, matching the search palette) and c0 == c1 collapses every
    # palette entry to one color in both rules — err_hq is exact.
    hq3, err_hq3 = _hq3_color_words(rgb, c0, c1)

    rc0, rc1, rcodes, rrows = _ref_dxt1_candidate(rgb, False,
                                                  swap_red_and_blue,
                                                  pixel_words)
    ref = dxt_ref._dxt1_bytes(rc0, rc1, rrows)
    err_ref = _block_error_from_words(rgb_f, rc0, rc1, rcodes, False)

    out, err = hq, err_hq
    for cand, e in ((hq3, err_hq3), (ref, err_ref)):
        # ref last with <=: ties go to the reference payload.
        better = e <= err
        out = jnp.where(better[:, None], cand, out)
        err = jnp.minimum(e, err)
    return out


@partial(jax.jit, static_argnames=("swap_red_and_blue",))
def encode_dxt1_hq_blocks(rgb: jax.Array,
                          swap_red_and_blue: bool = False) -> jax.Array:
    """(N, 16, 3) int32 -> (N, 8) uint8 high-quality DXT1 blocks
    (see :func:`_encode_dxt1_hq`)."""
    return _encode_dxt1_hq(rgb, swap_red_and_blue)


@partial(jax.jit, static_argnames=("swap_red_and_blue",))
def encode_dxt1_hq_image(image: jax.Array,
                         swap_red_and_blue: bool = False) -> jax.Array:
    """(H, W, 3) uint8 (H, W multiples of 4) -> (N, 8) uint8 HQ DXT1
    blocks — byte-identical to encode_dxt1_hq_blocks(image_to_blocks(im))
    but the block extraction runs as pack-to-u32 + one 2-D 32-bit
    transpose instead of the generic 5-D int32 transpose XLA lowers
    image_to_blocks to (~8 ms fused at 1024^2,
    tools/profile_etc_hq_scale.py). For BGR pass the raw BGR image plus
    ``swap_red_and_blue=True`` (pack swaps to RGB channel order)."""
    from texcomp.blocks import blocks_from_packed_words
    from texcomp.ops.dxt_pallas import pack_rgb_image

    words = pack_rgb_image(image, swap=swap_red_and_blue)  # (16, N)
    rgb = blocks_from_packed_words(words, 3)
    return _encode_dxt1_hq(rgb, swap_red_and_blue, pixel_words=words)


# Alpha ramp interpolation weights of entry k as (w0, w1) per scheme.
# Interp scheme (a0 > a1): ramp[k] = ((7-k+1)*a0 + (k-1)*a1)/7 for k>=2.
_ALPHA_W0_INTERP = np.asarray([1, 0, 6 / 7, 5 / 7, 4 / 7, 3 / 7, 2 / 7, 1 / 7],
                               dtype=np.float32)
# Explicit scheme (a0 <= a1): entries 6, 7 are the constants 0 and 255.
_ALPHA_W0_EXPL = np.asarray([1, 0, 4 / 5, 3 / 5, 2 / 5, 1 / 5, 0, 0],
                             dtype=np.float32)
_ALPHA_FREE_EXPL = np.asarray([1, 1, 1, 1, 1, 1, 0, 0], dtype=np.float32)


def _alpha_decode_ramp(a0, a1):
    """Exact decode ramp (DecodeAlphaValues, dxtc_compressor.cc:195-217):
    a0 > a1 -> 6-interpolant scheme, else explicit 0/255. (N, 8) int32."""
    comb = lambda s0, s1: dxt_ref.cc.combine_int_fast(s0, s1, a0, a1)
    interp = jnp.stack([a0, a1, comb(6, 1), comb(5, 2), comb(4, 3),
                        comb(3, 4), comb(2, 5), comb(1, 6)], axis=-1)
    expl = jnp.stack([a0, a1, comb(4, 1), comb(3, 2), comb(2, 3),
                      comb(1, 4), jnp.zeros_like(a0),
                      jnp.full_like(a0, 255)], axis=-1)
    return jnp.where((a0 > a1)[:, None], interp, expl)


def _alpha_assign(a, a0, a1):
    """Nearest decode-ramp code per pixel + exact block error."""
    ramp = _alpha_decode_ramp(a0, a1)  # (N, 8)
    d = a[:, :, None] - ramp[:, None, :]
    codes = jnp.argmin(d * d, axis=-1)
    err = jnp.sum(jnp.min(d * d, axis=-1), axis=-1)
    return codes, err


def _tab8(codes, tab):
    """tab[codes] for an 8-entry float table as compare+selects (gathers
    cost ~10 ns/element however expressed; see _tab4)."""
    out = jnp.full(codes.shape, float(tab[0]), jnp.float32)
    for k in range(1, 8):
        out = jnp.where(codes == k, float(tab[k]), out)
    return out


# Integer-scaled (x7 interp, x5 explicit — the free 0/255 entries already
# folded in as zeros) alpha LS weights; see _least_squares_endpoints for
# why integer summands are required (exact, backend-independent sums).
_ALPHA_U0_INTERP = np.asarray([7, 0, 6, 5, 4, 3, 2, 1], dtype=np.float32)
_ALPHA_U1_INTERP = 7.0 - _ALPHA_U0_INTERP
_ALPHA_U0_EXPL = np.asarray([5, 0, 4, 3, 2, 1, 0, 0], dtype=np.float32)
_ALPHA_U1_EXPL = np.asarray([0, 5, 1, 2, 3, 4, 0, 0], dtype=np.float32)


def _alpha_ls(a, codes, interp: bool):
    """Least-squares alpha endpoints for fixed codes under one scheme
    (integer-scaled exact solve; see _least_squares_endpoints)."""
    ai = a.astype(jnp.int32)
    if interp:
        w0 = _tab8(codes, _ALPHA_U0_INTERP).astype(jnp.int32)
        w1 = _tab8(codes, _ALPHA_U1_INTERP).astype(jnp.int32)
        free = jnp.ones_like(w0)
        s = 7.0
    else:
        w0 = _tab8(codes, _ALPHA_U0_EXPL).astype(jnp.int32)
        w1 = _tab8(codes, _ALPHA_U1_EXPL).astype(jnp.int32)
        free = _tab8(codes, _ALPHA_FREE_EXPL).astype(jnp.int32)
        s = 5.0
    a00 = jnp.sum(w0 * w0, axis=1)
    a01 = jnp.sum(w0 * w1, axis=1)
    a11 = jnp.sum(w1 * w1, axis=1)
    b0 = jnp.sum(w0 * ai, axis=1)
    b1 = jnp.sum(w1 * ai, axis=1)
    det = a00 * a11 - a01 * a01  # exact int32
    safe = det != 0
    det_f = jnp.where(safe, det, 1).astype(jnp.float32)
    # int32 numerators (|.| <= 49*16 * 7*255*16 ~ 2.3e7 < 2^31); divides
    # via the deterministic Newton reciprocal (see _det_recip).
    _nc = jax.lax.optimization_barrier
    rdet = _det_recip(det_f)
    x0 = _nc(_nc(s * (a11 * b0 - a01 * b1).astype(jnp.float32)) * rdet)
    x1 = _nc(_nc(s * (a00 * b1 - a01 * b0).astype(jnp.float32)) * rdet)
    mean = _nc(jnp.sum(ai * free, axis=1).astype(jnp.float32) * _det_recip(
        jnp.maximum(jnp.sum(free, axis=1), 1).astype(jnp.float32)))
    x0 = jnp.where(safe, x0, mean)
    x1 = jnp.where(safe, x1, mean)
    r = lambda v: jnp.clip(jnp.round(v), 0, 255).astype(jnp.int32)
    return r(x0), r(x1)


def _hq_alpha(a, ref_a0, ref_a1, ref_codes_err):
    """HQ alpha endpoints: LS-refined candidates in both schemes plus the
    seed families below, best-of with the reference encoding. a: (N, 16).
    Returns (a0, a1, codes).

    Every candidate is scored with _alpha_assign against the exact decode
    ramp of its actual ordering (the scheme is derived from a0 vs a1), so
    any integer pair is decodable and no validity gates are needed.

    The Lloyd-style LS loop alone converges to poor local minima: an
    exhaustive 256x256 endpoint enumeration on photo-statistics alpha
    planes measured a +0.44-0.59 dB gap, with ~40% of the true optima in
    the explicit scheme (free 0/255 entries) that extreme-seeded LS almost
    never reaches. Three measured-complementary families close most of it
    (smooth +0.24, random +0.45, bimodal +0.77 dB):
      (a) explicit-scheme seeds from interior extremes — pixels within
          ``margin`` of 0/255 ride the free constant entries, so the
          6-level ramp is fit to the rest;
      (b) shrunk-spread interp seeds — the optimal 8-level uniform
          quantizer pulls endpoints inside the data extremes;
      (c) a +-3 joint endpoint grid instead of +-1 (the gains keep
          coming out to r~8, but past 3 the grid is the wrong tool —
          the seed families cover the distant optima).
    """
    best_a0, best_a1 = ref_a0, ref_a1
    best_codes, best_err = ref_codes_err

    def consider(a0, a1, st):
        b0, b1, bc, be = st
        codes, err = _alpha_assign(a, a0, a1)
        better = err < be
        return (codes, (jnp.where(better, a0, b0), jnp.where(better, a1, b1),
                        jnp.where(better[:, None], codes, bc),
                        jnp.minimum(err, be)))

    def polish(a0, a1, st, interp, iters=2):
        """LS iterations under one scheme's weights, every step scored
        exactly and folded into the running best."""
        codes, st = consider(a0, a1, st)
        for _ in range(iters):
            a0, a1 = _alpha_ls(a, codes, interp)
            # Keep the iterate in the intended scheme after rounding (the
            # candidate itself is scored on its actual ordering anyway).
            if interp:
                a0, a1 = jnp.maximum(a0, a1), jnp.minimum(a0, a1)
            else:
                a0, a1 = jnp.minimum(a0, a1), jnp.maximum(a0, a1)
            codes, st = consider(a0, a1, st)
        return st

    st = (best_a0, best_a1, best_codes, best_err)
    hi = jnp.max(a, axis=1)
    lo = jnp.min(a, axis=1)

    # Extreme-seeded LS in both schemes (the original round-2 search).
    st = polish(hi, lo, st, interp=True)
    st = polish(lo, hi, st, interp=False)

    # (a) Interior-extreme explicit seeds.
    for margin in (16, 32, 48, 64):
        ilo = jnp.clip(jnp.min(jnp.where(a >= margin, a, 256), axis=1), 0, 255)
        ihi = jnp.clip(jnp.max(jnp.where(a <= 255 - margin, a, -1), axis=1),
                       0, 255)
        st = polish(ilo, ihi, st, interp=False)

    # (b) Shrunk-spread interp seeds.
    c = (lo + hi).astype(jnp.float32) / 2.0
    r = (hi - lo).astype(jnp.float32) / 2.0
    for s in (0.75, 0.875):
        s_lo = jnp.clip(jnp.round(c - r * s), 0, 255).astype(jnp.int32)
        s_hi = jnp.clip(jnp.round(c + r * s), 0, 255).astype(jnp.int32)
        st = polish(s_hi, s_lo, st, interp=True)

    # (c) ±3 joint neighborhood of the best endpoints so far, TWICE —
    # the second pass re-centers on the first pass's winner, following
    # drift beyond the radius (measured +0.04 dB over one pass for the
    # same per-pass cost; an r=5 ring was worse per assign). The LS
    # optimum rounds each endpoint independently; the best joint pair
    # often sits a few steps off. lax.scan over the 48 offsets: one
    # compiled body per pass instead of a 48x-unrolled select chain.
    offs = np.array([(d0, d1)
                     for d0 in range(-3, 4)
                     for d1 in range(-3, 4)
                     if (d0, d1) != (0, 0)], np.int32)

    for _ in range(2):
        ca0, ca1 = st[0], st[1]

        def grid_step(carry, d, ca0=ca0, ca1=ca1):
            b0, b1, bc, be = carry
            a0 = jnp.clip(ca0 + d[0], 0, 255)
            a1 = jnp.clip(ca1 + d[1], 0, 255)
            codes, err = _alpha_assign(a, a0, a1)
            better = err < be
            return (jnp.where(better, a0, b0), jnp.where(better, a1, b1),
                    jnp.where(better[:, None], codes, bc),
                    jnp.minimum(err, be)), None

        st, _ = jax.lax.scan(grid_step, st, jnp.asarray(offs))
    return st[0], st[1], st[2]


def _ref_dxt5_blockbytes(rgb, full_outside, swap: bool, pixel_words=None):
    """The reference DXT5 encoding as (N, 16) int32 block bytes: Pallas
    word kernel on accelerators (bit-identical, test_pallas.py), jnp
    reference path on CPU. ``pixel_words``: optional (16, N) uint32
    packed RGBA pixels (pack_rgba_image layout) to skip the repack."""
    from texcomp import ops as _ops

    if _ops.use_pallas():
        from texcomp.ops import dxt_pallas

        if pixel_words is None:
            px = (rgb[:, :, 0].astype(jnp.uint32)
                  | (rgb[:, :, 1].astype(jnp.uint32) << 8)
                  | (rgb[:, :, 2].astype(jnp.uint32) << 16)
                  | (rgb[:, :, 3].astype(jnp.uint32) << 24))  # (N, 16)
            pixel_words = px.T
        w17 = jnp.concatenate(
            [pixel_words, full_outside.astype(jnp.uint32)[None, :]], axis=0)
        words = dxt_pallas.encode_dxt5_words(w17, swap=swap)  # (4, N)
        return jnp.stack(
            [((words[k // 4] >> (8 * (k % 4))) & jnp.uint32(255))
             .astype(jnp.int32) for k in range(16)], axis=-1)  # (N, 16)
    return dxt_ref.encode_dxt5_blocks(
        rgb, full_outside, swap_red_and_blue=swap).astype(jnp.int32)


def _encode_dxt5_hq(rgb, full_outside, swap_red_and_blue: bool,
                    pixel_words=None):
    """Shared body of encode_dxt5_hq_blocks / encode_dxt5_hq_image:
    (N, 16, 4) int32 -> (N, 16) uint8 — HQ color endpoints AND HQ alpha
    endpoints, each per-block best-of vs the reference encoder (never
    worse); payloads remain standard DXT5. For BGRA pass pre-swapped
    blocks + ``swap_red_and_blue=True`` (see encode_dxt1_hq_blocks)."""
    ref_full = _ref_dxt5_blockbytes(rgb, full_outside, swap_red_and_blue,
                                    pixel_words)

    # --- color half (always-4-color decode rule) ---
    rgb3 = rgb[:, :, :3]
    rgb3_f = rgb3.astype(jnp.float32)
    c0, c1, rows, err_hq = _hq_color_words(rgb3)
    hq = dxt_ref._dxt1_bytes(c0, c1, rows)
    # err_hq is exact under always4 too: c0 > c1 is enforced, and equal
    # endpoints collapse the palette identically in both rules.
    ref_c0 = ref_full[:, 8] + ref_full[:, 9] * 256
    ref_c1 = ref_full[:, 10] + ref_full[:, 11] * 256
    shifts = jnp.arange(4, dtype=jnp.int32) * 2
    ref_codes = ((ref_full[:, 12:16][:, :, None] >> shifts[None, None, :])
                 & 3).reshape(-1, 16)
    err_ref = _block_error_from_words(rgb3_f, ref_c0, ref_c1, ref_codes,
                                      True)
    ref_color = ref_full[:, 8:16].astype(jnp.uint8)
    pick_hq = err_hq <= err_ref
    color = jnp.where(pick_hq[:, None], hq, ref_color).astype(jnp.int32)

    # --- alpha half ---
    a = rgb[:, :, 3]
    ref_a0 = ref_full[:, 0]
    ref_a1 = ref_full[:, 1]
    ref_codes = dxt_ref._unpack_alpha_codes(ref_full[:, 2:8])
    ramp = _alpha_decode_ramp(ref_a0, ref_a1)
    # ramp[codes] as an 8-way select chain (gather-free; see _tab4).
    ref_vals = ramp[:, 0:1]
    for k in range(1, 8):
        ref_vals = jnp.where(ref_codes == k, ramp[:, k:k + 1], ref_vals)
    ref_err = jnp.sum((ref_vals - a).astype(jnp.float32) ** 2, axis=-1)
    a0, a1, codes = _hq_alpha(a, ref_a0, ref_a1, (ref_codes, ref_err))
    alpha_bytes = dxt_ref._pack_alpha_codes(codes)

    out = jnp.concatenate(
        [a0[:, None], a1[:, None], alpha_bytes, color], axis=-1
    )
    return out.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("swap_red_and_blue",))
def encode_dxt5_hq_blocks(rgb: jax.Array, full_outside: jax.Array,
                          swap_red_and_blue: bool = False) -> jax.Array:
    """(N, 16, 4) int32 -> (N, 16) uint8 HQ DXT5 blocks
    (see :func:`_encode_dxt5_hq`)."""
    return _encode_dxt5_hq(rgb, full_outside, swap_red_and_blue)


@partial(jax.jit, static_argnames=("swap_red_and_blue",))
def encode_dxt5_hq_image(image: jax.Array,
                         swap_red_and_blue: bool = False) -> jax.Array:
    """(H, W, 4) uint8 (H, W multiples of 4; no outside blocks) ->
    (N, 16) uint8 HQ DXT5 blocks via the packed-word block extraction
    (see encode_dxt1_hq_image). For BGRA pass the raw BGRA image plus
    ``swap_red_and_blue=True``."""
    from texcomp.blocks import blocks_from_packed_words
    from texcomp.ops.dxt_pallas import pack_rgba_image

    words = pack_rgba_image(image, swap=swap_red_and_blue)  # (16, N)
    rgba = blocks_from_packed_words(words, 4)
    outside = jnp.zeros((rgba.shape[0],), dtype=bool)
    return _encode_dxt5_hq(rgba, outside, swap_red_and_blue,
                           pixel_words=words)
