"""Stage-level attribution for the HQ encoders (VERDICT r4 #1).

BENCH_r04: dxt1_hq 5.0 Mpix/s, etc1_hq 0.4 Mpix/s at 1024^2 — three to
four orders below the reference-mode paths. This tool times each candidate
family / stage with the tunnel-safe scan-differencing timer so the attack
order is measured, not guessed (the PVRTC-HQ 11x followed the same recipe,
PERF.md "round 3").

    python tools/profile_hq_stages.py dxt1 [size]
    python tools/profile_hq_stages.py etc1 [size]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from texcomp.utils.profiling import time_op

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _blocks(size, ch=3):
    rng = np.random.default_rng(0)
    n = (size // 4) * (size // 4)
    return jax.device_put(
        rng.integers(0, 256, (n, 16, ch), dtype=np.int32))


def _report(name, dt, pix):
    print(f"  {name:34s}: {dt*1e3:9.2f} ms {pix/dt/1e6:9.1f} Mpix/s",
          flush=True)


def profile_dxt1(size=1024):
    from texcomp.codecs import dxt as dxt_ref
    from texcomp.codecs import dxt_hq as hq

    rgb = _blocks(size)
    pix = size * size
    rgb_f = rgb.astype(jnp.float32)
    print(f"DXT1-HQ stages at {size}^2 ({rgb.shape[0]} blocks)")

    s32 = lambda x: x.astype(jnp.int32).sum()[None].astype(jnp.uint8)

    def full(x):
        return hq.encode_dxt1_hq_blocks(x)

    def ref_only(x):
        return dxt_ref._dxt1_bytes(
            *dxt_ref._encode_dxt1_words(x, False, False))

    def pca_only(x):
        xf = x.astype(jnp.float32)
        mean, v, t = hq._pca_project(xf)
        return s32(t)

    def seed_assign(x):
        xf = x.astype(jnp.float32)
        proj = hq._pca_project(xf)
        e0, e1 = hq._pca_endpoints(xf, proj)
        c0, c1 = hq._quantize_endpoints(e0, e1)
        codes, err = hq._assign_codes(xf, c0, c1)
        return s32(codes) + s32(err)

    def refine3(x):
        xf = x.astype(jnp.float32)
        proj = hq._pca_project(xf)
        e0, e1 = hq._pca_endpoints(xf, proj)
        c0, c1 = hq._quantize_endpoints(e0, e1)
        codes, err = hq._assign_codes(xf, c0, c1)
        for _ in range(hq._REFINE_ITERS):
            e0, e1 = hq._least_squares_endpoints(xf, codes)
            c0, c1 = hq._quantize_endpoints(e0, e1)
            codes, err2 = hq._assign_codes(xf, c0, c1)
        return s32(codes) + s32(err2)

    def one_assign(x):
        xf = x.astype(jnp.float32)
        c0 = x[:, 0, 0] * 0 + 31
        c1 = x[:, 0, 0] * 0 + 77
        codes, err = hq._assign_codes(xf, c0, c1)
        return s32(codes) + s32(err)

    def one_ls(x):
        xf = x.astype(jnp.float32)
        codes = (x[:, :, 0] & 3)
        e0, e1 = hq._least_squares_endpoints(xf, codes)
        return s32(e0[0]) + s32(e1[2])

    def cluster_fit(x):
        xf = x.astype(jnp.float32)
        _, _, t = hq._pca_project(xf)
        cands = hq._cluster_fit_candidates(xf, t)
        acc = None
        for c0, c1 in cands:
            v = s32(c0) + s32(c1)
            acc = v if acc is None else acc + v
        return acc

    def cf_sort_only(x):
        xf = x.astype(jnp.float32)
        _, _, t = hq._pca_project(xf)
        order = jnp.argsort(-t, axis=1)
        sp = jnp.take_along_axis(xf, order[:, :, None], axis=1)
        return s32(sp)

    def cf_rank_prefix(x):
        """The CURRENT _cluster_fit_chunk front half: stable-rank masked
        prefix sums (no sort, no gather)."""
        xf = x.astype(jnp.float32)
        _, _, t = hq._pca_project(xf)
        ii = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 16), 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 16), 2)
        tj = t[:, None, :]
        ti = t[:, :, None]
        rank = jnp.sum(
            ((tj > ti) | ((tj == ti) & (jj < ii))).astype(jnp.int32), axis=2)
        p = jnp.stack(
            [jnp.sum(jnp.where((rank < r)[:, :, None], xf, 0.0), axis=1)
             for r in range(17)], axis=1)
        return s32(p)

    def _cur_prefix(x):
        xf = x.astype(jnp.float32)
        _, _, t = hq._pca_project(xf)
        ii = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 16), 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 16), 2)
        tj = t[:, None, :]
        ti = t[:, :, None]
        rank = jnp.sum(
            ((tj > ti) | ((tj == ti) & (jj < ii))).astype(jnp.int32), axis=2)
        p = jnp.stack(
            [jnp.sum(jnp.where((rank < r)[:, :, None], xf, 0.0), axis=1)
             for r in range(17)], axis=1)
        return p

    def cf_score_cur(x):
        """rank+prefix + the CURRENT score loop (barriered), summed
        instead of top-k'd — isolates score materialization cost."""
        n = x.shape[0]
        p = jax.lax.optimization_barrier(_cur_prefix(x))
        pt = p[:, 16, :]
        sel = jnp.asarray(hq._CF_SEL)
        score = jnp.zeros((n, hq._CF_SEL.shape[1]), jnp.float32)
        quu, qut = jnp.asarray(hq._CF_QUU), jnp.asarray(hq._CF_QUT)
        _nc = jax.lax.optimization_barrier
        for c in range(3):
            uc = jnp.matmul(p[:, :, c], sel, precision=hq._F32)
            score = score + _nc(
                (_nc(quu[None, :] * uc) + _nc(qut[None, :] * pt[:, c, None]))
                * uc)
        score = score + _nc(
            jnp.asarray(hq._CF_QTT)[None, :] * jnp.sum(pt * pt, -1)[:, None])
        score = jax.lax.optimization_barrier(score)
        return s32(jnp.max(score, axis=1))

    def cf_top4_cur(x):
        """rank+prefix + score + the CURRENT iterated-argmax top-4 picks
        (no LS/quantize tail): the full candidate-selection front end."""
        n = x.shape[0]
        p = jax.lax.optimization_barrier(_cur_prefix(x))
        pt = p[:, 16, :]
        sel = jnp.asarray(hq._CF_SEL)
        score = jnp.zeros((n, hq._CF_SEL.shape[1]), jnp.float32)
        quu, qut = jnp.asarray(hq._CF_QUU), jnp.asarray(hq._CF_QUT)
        _nc = jax.lax.optimization_barrier
        for c in range(3):
            uc = jnp.matmul(p[:, :, c], sel, precision=hq._F32)
            score = score + _nc(
                (_nc(quu[None, :] * uc) + _nc(qut[None, :] * pt[:, c, None]))
                * uc)
        score = score + _nc(
            jnp.asarray(hq._CF_QTT)[None, :] * jnp.sum(pt * pt, -1)[:, None])
        score = jax.lax.optimization_barrier(score)
        npart = hq._CF_SEL.shape[1]
        pick_tab = jnp.asarray(hq._CF_PICK)
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, npart), 1)
        acc = None
        for k in range(4):
            kidx = jnp.argmax(score, axis=1)
            onehot = (kidx[:, None] == iota_p).astype(jnp.float32)
            if k + 1 < 4:
                score = jax.lax.optimization_barrier(
                    jnp.where(onehot != 0.0, -jnp.inf, score))
            picked = jnp.matmul(onehot, pick_tab, precision=hq._F32)
            v = s32(picked)
            acc = v if acc is None else acc + v
        return acc

    def cf_score_topk(x):
        xf = x.astype(jnp.float32)
        _, _, t = hq._pca_project(xf)
        n = xf.shape[0]
        order = jnp.argsort(-t, axis=1)
        sp = jnp.take_along_axis(xf, order[:, :, None], axis=1)
        p = jnp.concatenate(
            [jnp.zeros((n, 1, 3), jnp.float32), jnp.cumsum(sp, axis=1)],
            axis=1)
        p = jax.lax.optimization_barrier(p)
        pt = p[:, 16, :]
        sel = jnp.asarray(hq._CF_SEL)
        score = jnp.zeros((n, hq._CF_SEL.shape[1]), jnp.float32)
        quu, qut = jnp.asarray(hq._CF_QUU), jnp.asarray(hq._CF_QUT)
        for c in range(3):
            uc = jnp.matmul(p[:, :, c], sel, precision=hq._F32)
            score = score + (quu[None] * uc + qut[None] * pt[:, c, None]) * uc
        score = score + (jnp.asarray(hq._CF_QTT)[None]
                         * jnp.sum(pt * pt, -1)[:, None])
        score = jax.lax.optimization_barrier(score)
        _, idx = jax.lax.top_k(score, hq._CLUSTER_TOPK)
        return s32(idx)

    def true_err3(x):
        data = dxt_ref._dxt1_bytes(
            *dxt_ref._encode_dxt1_words(x, False, False))
        e = hq._true_block_error(data, x, False)
        return s32(e)

    stages = [
        ("FULL encode_dxt1_hq_blocks", full),
        ("reference encoder (baseline)", ref_only),
        ("pca_project", pca_only),
        ("pca + seed assign", seed_assign),
        ("refine loop (3x LS+assign)", refine3),
        ("one _assign_codes", one_assign),
        ("one _least_squares_endpoints", one_ls),
        ("cluster_fit (full)", cluster_fit),
        ("cluster sort+gather", cf_sort_only),
        ("cluster score+topk", cf_score_topk),
        ("cur rank+prefix", cf_rank_prefix),
        ("cur +score", cf_score_cur),
        ("cur +top4 picks", cf_top4_cur),
        ("one _true_block_error(+ref enc)", true_err3),
    ]
    for name, fn in stages:
        try:
            dt = time_op(fn, rgb, iters=5, reps=3)
            _report(name, dt, pix)
        except Exception as e:  # pragma: no cover
            print(f"  {name:34s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


def profile_etc1(size=512):
    from texcomp.codecs import etc

    rgb = _blocks(size)
    pix = size * size
    print(f"ETC1-HQ stages at {size}^2 ({rgb.shape[0]} blocks)")

    s32 = lambda x: x.astype(jnp.int32).sum()[None].astype(jnp.uint8)

    def full(x):
        return etc.encode_etc1_hq_blocks(x)

    def ref_only(x):
        return etc.encode_etc1_blocks(x, etc.SMALLER_ERROR)

    def one_finish(x):
        mask0f = jnp.asarray(etc._subblock_mask(False)).astype(
            jnp.int32)[None, :]
        avg1, avg2 = [], []
        for ch in range(3):
            c = x[:, :, ch]
            avg1.append(jnp.sum(c * mask0f, axis=1) // 8)
            avg2.append(jnp.sum(c * (1 - mask0f), axis=1) // 8)
        hi, lo, err = etc._finish_flip(
            x, False, etc.SMALLER_ERROR,
            [a >> 3 for a in avg1], [a >> 3 for a in avg2],
            [a >> 4 for a in avg1], [a >> 4 for a in avg2])
        return s32(hi) + s32(err)

    def cf_enum(x):
        qs, real = etc._cluster_fit_enum_bases(x, False)
        acc = None
        for q in qs:
            v = s32(q[0][0]) + s32(q[1][1])
            acc = v if acc is None else acc + v
        return acc

    def cf_bases(x):
        qs = etc._cluster_fit_bases(x, False)
        acc = None
        for q in qs:
            v = s32(q[0][0]) + s32(q[1][1])
            acc = v if acc is None else acc + v
        return acc

    def refit(x):
        hi, lo, err = etc._encode_one_flip(x, False, etc.SMALLER_ERROR)
        q = etc._refit_bases(x, False, hi, lo)
        return s32(q[0][0]) + s32(q[3][2])

    stages = [
        ("FULL encode_etc1_hq_blocks", full),
        ("reference encoder (baseline)", ref_only),
        ("one _finish_flip (XLA)", one_finish),
        ("_cluster_fit_enum_bases", cf_enum),
        ("_cluster_fit_bases (8cw x 2seed)", cf_bases),
        ("_refit_bases (+1 encode)", refit),
    ]
    for name, fn in stages:
        try:
            dt = time_op(fn, rgb, iters=5, reps=3)
            _report(name, dt, pix)
        except Exception as e:  # pragma: no cover
            print(f"  {name:34s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "dxt1"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else (
        1024 if which == "dxt1" else 512)
    if which == "dxt1":
        profile_dxt1(size)
    else:
        profile_etc1(size)
