"""EXPERIMENT (parity-proven, perf-unmeasured): dot-form ETC1 search.

A candidate reformulation of ops/etc_pallas._subblock_search. The key
observation: q_{cw,m,c} = clamp(base_c + v_{cw,m}) is PER-SUBBLOCK (the
base is constant across the 8 member pixels), so the per-pixel candidate
error collapses to

    e = |q - p|^2 = Q2 - 2<q, p> + |p|^2

where Q2 = |q|^2 and q are per-subblock scalars, and |p|^2 is constant
across every candidate AND across both flips' subblock partitions (the
same 16 pixels), so it cancels from every comparison the kernel makes.
With CODEWORDS on sublanes, all 8 codewords' shifted errors for one
(pixel, modifier) cost 3 fma ops on (8, T) — ~1.4-1.5x fewer vector ops
than the shipped clamp-per-candidate form by static count. Unlike the
+-pair algebra rejected in docs/PERF.md, clamping here leaves the pixel
loop entirely (no per-pixel correction).

Status: byte-parity PROVEN on all 4 strategies in interpret mode
(including clamp-heavy bright/dark content); TPU A/B MEASURED AND
REJECTED (v5e, 2026-08-18): 5722 -> 5803 Mpix/s at 2048^2 and
3774 -> 3812 at 4096^2 (+1.0-1.4%, within tunnel noise) — the sublane
broadcasts and the codeword-sublane lex argmin eat the static op-count
saving, as this repo's history predicted. Kept as the parity-proven
harness; see docs/PERF.md "ETC1 encode (kSmallerError)".

    python tools/etc_dot_experiment.py            # CPU parity gate
    python tools/etc_dot_experiment.py --tpu-ab   # on TPU: A/B throughput
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if "--tpu-ab" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from texcomp.core.constants import ETC1_CODEBOOK, ETC1_HEURISTIC_THRESHOLDS
from texcomp.ops import etc_pallas as ep


def _subblock_search_dot(pg, base, heuristic: bool):
    """Drop-in for ep._subblock_search. Returned err is shifted by
    -sum(|p|^2) over the subblock's 8 pixels — comparison-invariant for
    every use the kernel makes (flip choice compares the same 16 pixels;
    the absolute value is never emitted)."""
    cb = ETC1_CODEBOOK
    pgf = [ch.astype(jnp.float32) for ch in pg]
    basef = [bs.astype(jnp.float32) for bs in base]

    if heuristic:
        dev = None
        for ch, bs in zip(pg, base):
            ad = jnp.sum(jnp.abs(bs - ch), axis=0, keepdims=True) >> 3
            dev = ad if dev is None else jnp.maximum(dev, ad)
        cw = jnp.zeros_like(dev)
        for t in ETC1_HEURISTIC_THRESHOLDS.tolist():
            cw = cw + (dev > t)
        err = None
    else:
        # Codebook column m across the 8 codewords as an (8, 1) vector,
        # built from iota (Mosaic: no captured array constants).
        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        cbcol = []
        for m in range(4):
            col = jnp.full_like(r8, int(cb[0, m]))
            for k in range(1, 8):
                col = jnp.where(r8 == k, int(cb[k, m]), col)
            cbcol.append(col.astype(jnp.float32))

        # Per-candidate scalars on codeword sublanes: Q2 = |q|^2 and
        # qn = -2q. Positive modifier columns only need the upper clamp,
        # negative only the lower (base in [0, 255], codebook has no 0).
        Q2, QN = [], []
        for m in range(4):
            qs = []
            for c in range(3):
                t = basef[c] + cbcol[m]  # (1, T) + (8, 1) -> (8, T)
                q = jnp.minimum(t, 255.0) if m < 2 else jnp.maximum(t, 0.0)
                qs.append(q)
            Q2.append(qs[0] * qs[0] + qs[1] * qs[1] + qs[2] * qs[2])
            QN.append([q * -2.0 for q in qs])

        # Pixel loop: all 8 codewords at once per (pixel, modifier).
        # fp32 stays exact: |e'| <= 2*3*255^2 per pixel, < 2^22 summed.
        acc = None
        for j in range(8):
            pj = [pgf[c][j:j + 1] for c in range(3)]  # (1, T)
            best = None
            for m in range(4):
                e = Q2[m] + QN[m][0] * pj[0] + QN[m][1] * pj[1] \
                    + QN[m][2] * pj[2]
                best = e if best is None else jnp.minimum(best, e)
            acc = best if acc is None else acc + best

        # First-occurrence argmin over the codeword sublanes: lex
        # (error, index) tree so equal error keeps the SMALLEST codeword
        # (the reference's strictly-less scan, etc_compressor.cc:391-409).
        e = acc
        i = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
        for half in (4, 2, 1):
            lo_e, hi_e = e[:half], e[half:2 * half]
            lo_i, hi_i = i[:half], i[half:2 * half]
            better = (hi_e < lo_e) | ((hi_e == lo_e) & (hi_i < lo_i))
            e = jnp.where(better, hi_e, lo_e)
            i = jnp.where(better, hi_i, lo_i)
        cw = i
        err = e

    # Per-pixel best-modifier recompute for the chosen codeword —
    # unchanged from the incumbent (pixel-sublane space).
    D = [bs - ch for ch, bs in zip(pgf, basef)]
    U = [255.0 - ch for ch in pgf]
    L = [-ch for ch in pgf]
    va = ep._codeword_select(cw, cb[:, 0]).astype(jnp.float32)
    vb = ep._codeword_select(cw, cb[:, 1]).astype(jnp.float32)
    best_e = None
    best_m = None
    for m, vm in enumerate((va, vb, va, vb)):
        e2 = None
        for dc, uc, lc in zip(D, U, L):
            t = dc + vm if m < 2 else dc - vm
            d = jnp.minimum(t, uc) if m < 2 else jnp.maximum(t, lc)
            e2 = d * d if e2 is None else e2 + d * d
        if best_e is None:
            best_e = e2
            best_m = jnp.zeros(e2.shape, jnp.int32)
        else:
            better = e2 < best_e
            best_m = jnp.where(better, m, best_m)
            best_e = jnp.where(better, e2, best_e)
    return cw, err, best_m


def _test_blocks(rng, n):
    rgb = rng.integers(0, 256, (n, 16, 3), dtype=np.int64).astype(np.int32)
    rgb[:200] = np.clip(rgb[:200] + 200, 0, 255)        # upper clamps
    rgb[200:400] = np.clip(rgb[200:400] - 200, 0, 255)  # lower clamps
    rgb[400:420] = rgb[400:401, 0:1]                    # solid
    return rgb


def _to_words(rgb):
    px = (rgb[:, :, 0].astype(np.uint32)
          | (rgb[:, :, 1].astype(np.uint32) << 8)
          | (rgb[:, :, 2].astype(np.uint32) << 16))
    return jnp.asarray(px.T.copy())  # (16, N)


def parity_gate() -> None:
    from texcomp.codecs import etc

    rng = np.random.default_rng(42)
    n = ep.LANE_TILE + 600  # 2 grid steps + ragged tail
    rgb = _test_blocks(rng, n)
    orig = ep._subblock_search
    ep._subblock_search = _subblock_search_dot
    try:
        for strategy in (0, 1, 2, 3):
            ref = np.asarray(etc.encode_etc1_blocks(jnp.asarray(rgb),
                                                    strategy))
            out = np.asarray(
                ep.encode_etc1_packed(_to_words(rgb), strategy,
                                      interpret=True)).T
            np.testing.assert_array_equal(out, ref,
                                          err_msg=f"strategy {strategy}")
            print(f"strategy {strategy}: parity OK ({n} blocks)")
    finally:
        ep._subblock_search = orig
    print("DOT-FORM PARITY: ALL STRATEGIES BYTE-IDENTICAL")


def tpu_ab() -> None:
    """A/B encode throughput, incumbent vs dot-form, on the live backend."""
    from texcomp.utils.profiling import throughput

    rng = np.random.default_rng(0)
    for size in (2048, 4096):
        words = jnp.asarray(rng.integers(
            0, 2 ** 32, (16, (size // 4) ** 2), dtype=np.uint64
        ).astype(np.uint32))
        for label, fn in (("incumbent", None),
                          ("dot-form", _subblock_search_dot)):
            orig = ep._subblock_search
            if fn is not None:
                ep._subblock_search = fn
            try:
                mpix = throughput(
                    lambda w: ep.encode_etc1_packed(w, ep.SMALLER_ERROR),
                    words, pixels=size * size)
                print(f"{size}^2 {label}: {mpix:.0f} Mpix/s", flush=True)
            finally:
                ep._subblock_search = orig


if __name__ == "__main__":
    if "--tpu-ab" in sys.argv:
        tpu_ab()
    else:
        parity_gate()
