"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: DXT1 encode throughput in Mpixels/sec/chip (device-resident
image -> packed blocks, including block extraction). Baseline bar is
1 Gpixel/sec/chip on TPU v5e (BASELINE.json north_star).

Run `python bench.py --all` for the full per-codec suite (extra JSON lines
after the headline one).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MPIX_S = 1000.0  # 1 Gpixel/sec/chip


def _time_op(op, arg, iters: int = 9, reps: int = 4) -> float:
    """Honest per-call seconds for ``op(arg) -> array``.

    Remote-tunneled platforms (and async dispatch generally) can make
    block_until_ready return before the device finishes, so instead we run
    K data-dependent iterations of the op inside one jitted lax.scan,
    fetch a 4-byte checksum to host (forcing completion), and difference
    two K values to cancel fixed dispatch/tunnel overhead. Tunnel latency
    is noisy; if the difference is implausibly small (short run slower
    than the long run), fall back to the conservative per-iteration time
    of the long run, which includes the fixed overhead and therefore only
    understates throughput.
    """

    @partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(carry, _):
            out = op(x ^ (carry & jnp.uint32(0xFF)).astype(jnp.uint8))
            return out.astype(jnp.uint32).sum(), None

        final, _ = jax.lax.scan(body, jnp.uint32(0), None, length=n)
        return final

    def run(n):
        np.asarray(loop(arg, n))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(arg, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = run(1)
    t_long = run(1 + iters)
    dt = (t_long - t_short) / iters
    floor = t_long / (1 + iters) * 0.02  # differencing noise guard
    if dt <= floor:
        return t_long / (1 + iters)
    return dt


def _rand_image(h, w, c):
    rng = np.random.default_rng(0)
    return jax.device_put(rng.integers(0, 256, (h, w, c), dtype=np.uint8))


def bench_dxt1_encode(h: int = 4096, w: int = 4096) -> float:
    """DXT1 encode Mpixels/sec on the first device."""
    from texcomp.ops import dxt1_encode_image_op

    dt = _time_op(dxt1_encode_image_op, _rand_image(h, w, 3))
    return (h * w) / dt / 1e6


def bench_dxt5_encode(h: int = 2048, w: int = 2048) -> float:
    from texcomp.ops import dxt5_encode_image_op

    dt = _time_op(dxt5_encode_image_op, _rand_image(h, w, 4))
    return (h * w) / dt / 1e6


def bench_dxt1_decode(h: int = 4096, w: int = 4096) -> float:
    from texcomp.ops import dxt1_decode_image_op

    rng = np.random.default_rng(0)
    data = jax.device_put(
        rng.integers(0, 256, ((h // 4) * (w // 4), 8), dtype=np.uint8)
    )
    dt = _time_op(lambda d: dxt1_decode_image_op(d, h, w), data)
    return (h * w) / dt / 1e6


def bench_etc1_decode(h: int = 4096, w: int = 4096) -> float:
    from texcomp.ops import etc1_decode_image_op

    rng = np.random.default_rng(0)
    data = jax.device_put(
        rng.integers(0, 256, ((h // 4) * (w // 4), 8), dtype=np.uint8)
    )
    dt = _time_op(lambda d: etc1_decode_image_op(d, h, w), data)
    return (h * w) / dt / 1e6


def bench_etc1_encode(h: int = 2048, w: int = 2048) -> float:
    from texcomp.ops import etc1_encode_image_op

    dt = _time_op(etc1_encode_image_op, _rand_image(h, w, 3))
    return (h * w) / dt / 1e6


def bench_pvrtc_encode(h: int = 1024, w: int = 1024) -> float:
    from texcomp.ops import pvrtc_encode_image_op

    dt = _time_op(pvrtc_encode_image_op, _rand_image(h, w, 4))
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


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--all", action="store_true",
                        help="run the full per-codec suite")
    parser.add_argument("--size", type=int, default=4096)
    args = parser.parse_args()

    mpix = bench_dxt1_encode(args.size, args.size)
    print(json.dumps({
        "metric": "dxt1_encode_throughput",
        "value": round(mpix, 1),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(mpix / BASELINE_MPIX_S, 3),
    }))

    if args.all:
        extras = {
            "dxt5_encode_throughput": bench_dxt5_encode,
            "dxt1_decode_throughput": bench_dxt1_decode,
            "etc1_encode_throughput": bench_etc1_encode,
            "etc1_decode_throughput": bench_etc1_decode,
            "pvrtc_encode_throughput": bench_pvrtc_encode,
            "pipeline_mixed_throughput": bench_pipeline,
        }
        for name, fn in extras.items():
            try:
                v = fn()
            except Exception as e:  # codec not yet implemented
                print(json.dumps({"metric": name, "error": str(e)[:200]}),
                      file=sys.stderr)
                continue
            print(json.dumps({
                "metric": name, "value": round(v, 1),
                "unit": "Mpixels/s/chip",
                "vs_baseline": round(v / BASELINE_MPIX_S, 3),
            }), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
