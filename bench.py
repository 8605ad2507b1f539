"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

Headline: DXT1 encode throughput in Mpixels/sec/chip (device-resident
image -> packed blocks, including block extraction). Baseline bar is
1 Gpixel/sec/chip on TPU v5e (BASELINE.json north_star). "extras" carries
the per-codec suite covering BASELINE configs 2-5 (Mpixels/s/chip each),
so every perf bar is recorded in the single driver-visible line.

`--headline-only` skips the extras; `--all` additionally prints one JSON
line per extra metric to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from texcomp.utils.profiling import time_op as _time_op

BASELINE_MPIX_S = 1000.0  # 1 Gpixel/sec/chip


def _rand_image(h, w, c):
    rng = np.random.default_rng(0)
    return jax.device_put(rng.integers(0, 256, (h, w, c), dtype=np.uint8))


def bench_dxt1_encode(h: int = 4096, w: int = 4096) -> float:
    """DXT1 encode Mpixels/sec on the first device.

    The headline metric gets longer scans and more repetitions: tunnel
    latency noise in the short-run measurement otherwise swings the
    differenced estimate by ±30% run to run."""
    from texcomp.ops import dxt1_encode_image_op

    dt = _time_op(dxt1_encode_image_op, _rand_image(h, w, 3),
                  iters=16, reps=8)
    return (h * w) / dt / 1e6


def bench_dxt5_encode(h: int = 4096, w: int = 4096) -> float:
    """4096^2: the 2048^2 workload is sub-ms and floor-bound through the
    tunnel (readings swung 5-37 Gpix/s run to run)."""
    from texcomp.ops import dxt5_encode_image_op

    dt = _time_op(dxt5_encode_image_op, _rand_image(h, w, 4))
    return (h * w) / dt / 1e6


def bench_dxt1_decode(h: int = 4096, w: int = 4096) -> float:
    from texcomp.ops import dxt1_decode_image_op

    rng = np.random.default_rng(0)
    data = jax.device_put(
        rng.integers(0, 256, ((h // 4) * (w // 4), 8), dtype=np.uint8)
    )
    # Decode is fast (~1 ms at 4096^2): longer scans keep the differenced
    # estimate out of the tunnel-noise floor.
    dt = _time_op(lambda d: dxt1_decode_image_op(d, h, w), data, iters=16)
    return (h * w) / dt / 1e6


def bench_etc1_decode(h: int = 4096, w: int = 4096) -> float:
    from texcomp.ops import etc1_decode_image_op

    rng = np.random.default_rng(0)
    data = jax.device_put(
        rng.integers(0, 256, ((h // 4) * (w // 4), 8), dtype=np.uint8)
    )
    dt = _time_op(lambda d: etc1_decode_image_op(d, h, w), data, iters=16)
    return (h * w) / dt / 1e6


def bench_etc1_encode(h: int = 2048, w: int = 2048) -> float:
    from texcomp.ops import etc1_encode_image_op

    dt = _time_op(etc1_encode_image_op, _rand_image(h, w, 3))
    return (h * w) / dt / 1e6


def bench_pvrtc_encode(h: int = 2048, w: int = 2048) -> float:
    from texcomp.ops import pvrtc_encode_image_op

    dt = _time_op(pvrtc_encode_image_op, _rand_image(h, w, 4))
    return (h * w) / dt / 1e6


def bench_pvrtc4_encode(h: int = 2048, w: int = 2048) -> float:
    """4bpp extension codec — BASELINE config 4 names PVRTC 4bpp."""
    from texcomp.codecs.pvrtc4 import encode_pvrtc_4bpp_device

    dt = _time_op(encode_pvrtc_4bpp_device, _rand_image(h, w, 4))
    return (h * w) / dt / 1e6


def bench_mipmap_chain(size: int = 2048) -> float:
    """Full DXT5 mipmap chain from a size^2 level-0 payload — BASELINE
    config 2's workload — as ONE fused device program. Throughput counts
    the pixels decoded across all levels."""
    from texcomp.ops import dxt5_encode_image_op
    from texcomp.ops.mipmap import dxtc_mipmap_chain, num_chain_levels

    img = _rand_image(size, size, 4)
    data = jax.block_until_ready(dxt5_encode_image_op(img))
    levels = num_chain_levels(size, size)
    src_pixels = sum((size // (2 ** k)) ** 2 for k in range(levels))

    def op(d):
        outs = dxtc_mipmap_chain(d, height=size, width=size, is_dxt1=False,
                                 levels=levels)
        return jnp.concatenate([o.reshape(1, -1).astype(jnp.uint32).sum(
            axis=1, keepdims=True) for o in outs], axis=1)

    dt = _time_op(op, data, iters=5)
    return src_pixels / dt / 1e6


def bench_transcode(h: int = 4096, w: int = 4096) -> float:
    """DXT1 -> ETC1 in-place transcode (fused device decode -> heuristic
    re-encode, dxtc_to_etc_transcoder.cc:29-40)."""
    from texcomp.ops import dxt_pallas, etc_pallas

    rng = np.random.default_rng(0)
    data = jax.device_put(
        rng.integers(0, 256, ((h // 4) * (w // 4), 8), dtype=np.uint8))

    def op(d):
        words = dxt_pallas.blocks_to_words(d, 2)
        return etc_pallas.transcode_dxt1_to_etc1_packed(words)

    dt = _time_op(op, data)
    return (h * w) / dt / 1e6


def bench_pipeline(n_textures: int = 256, size: int = 256) -> float:
    """Mixed-codec asset-pipeline throughput (textures of size^2, Mpix/s):
    the single-chip slice of BASELINE config 5."""
    from texcomp.dist.pipeline import _batch_encode

    rng = np.random.default_rng(0)
    per = n_textures // 4
    imgs3 = jax.device_put(
        rng.integers(0, 256, (per, size, size, 3), dtype=np.uint8))
    imgs4 = jax.device_put(
        rng.integers(0, 256, (per, size, size, 4), dtype=np.uint8))

    def op3(x):
        a = _batch_encode(x, "dxt1", 2)
        b = _batch_encode(x, "etc1", 2)
        return a.astype(jnp.uint32).sum() + b.astype(jnp.uint32).sum()

    def op4(x):
        a = _batch_encode(x, "dxt5", 2)
        b = _batch_encode(x, "pvrtc", 2)
        return a.astype(jnp.uint32).sum() + b.astype(jnp.uint32).sum()

    dt3 = _time_op(lambda x: op3(x)[None], imgs3, iters=5)
    dt4 = _time_op(lambda x: op4(x)[None], imgs4, iters=5)
    total_pix = n_textures * size * size
    return total_pix / (dt3 + dt4) / 1e6


_EXTRA_BENCHES = {
    "dxt5_encode": bench_dxt5_encode,       # BASELINE config 2
    "dxt5_mipmap": bench_mipmap_chain,      # BASELINE config 2 (chain)
    "etc1_encode": bench_etc1_encode,       # BASELINE config 3
    "pvrtc_encode": bench_pvrtc_encode,     # BASELINE config 4 (2bpp parity bar)
    "pvrtc4_encode": bench_pvrtc4_encode,   # BASELINE config 4 (4bpp extension)
    "pipeline_mixed": bench_pipeline,       # BASELINE config 5 (1-chip slice)
    "transcode_dxt1_etc1": bench_transcode,
    "dxt1_decode": bench_dxt1_decode,
    "etc1_decode": bench_etc1_decode,
}


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--all", action="store_true",
                        help="also print one JSON line per extra to stderr")
    parser.add_argument("--headline-only", action="store_true",
                        help="skip the per-codec extras")
    parser.add_argument("--size", type=int, default=4096)
    args = parser.parse_args()

    mpix = bench_dxt1_encode(args.size, args.size)
    line = {
        "metric": "dxt1_encode_throughput",
        "value": round(mpix, 1),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(mpix / BASELINE_MPIX_S, 3),
    }

    if not args.headline_only:
        extras = {}
        for name, fn in _EXTRA_BENCHES.items():
            try:
                extras[name] = round(fn(), 1)
            except Exception as e:
                extras[name] = None
                print(json.dumps({"metric": name + "_throughput",
                                  "error": str(e)[:200]}), file=sys.stderr)
                continue
            if args.all:
                print(json.dumps({
                    "metric": name + "_throughput",
                    "value": extras[name],
                    "unit": "Mpixels/s/chip",
                    "vs_baseline": round(extras[name] / BASELINE_MPIX_S, 3),
                }), file=sys.stderr)
        line["extras"] = extras

    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
