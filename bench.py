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

# Persistent compilation cache: remote (tunneled) TPU compiles of the big
# pipelines take minutes and are flaky under load; cached reruns are
# instant. Harmless on CPU.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BASELINE_MPIX_S = 1000.0  # 1 Gpixel/sec/chip


def _rand_image(h, w, c):
    rng = np.random.default_rng(0)
    return jax.device_put(rng.integers(0, 256, (h, w, c), dtype=np.uint8))


def _rand_image_words(h, w):
    """(h, w) uint32 — an RGBA image as packed words. RGBA benches pass
    words and bitcast to (h, w, 4) uint8 inside the op: a u8[H,W,4] jit
    argument gets copied into the timing loop with the size-4 minor axis
    lane-padded 4->128 (32x HBM; OOMs at 8192^2)."""
    rng = np.random.default_rng(0)
    return jax.device_put(
        rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        .view(np.uint32).reshape(h, w))


def _words_to_image(w32):
    return jax.lax.bitcast_convert_type(w32, jnp.uint8)


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


def bench_etc1_encode(h: int = 4096, w: int = 4096) -> float:
    """4096^2: at 2048^2 the ~4ms kernel is within the per-scan-iteration
    floor's noise band; 4096^2 gives a stable differenced reading."""
    from texcomp.ops import etc1_encode_image_op

    dt = _time_op(etc1_encode_image_op, _rand_image(h, w, 3))
    return (h * w) / dt / 1e6


def bench_pvrtc_encode(h: int = 2048, w: int = 2048) -> float:
    """iters=48: the ~1 ms 2048^2 op sits inside the per-scan-iteration
    floor at the default scan length — r03 recorded a floor-inflated
    8.3 Gpix/s here while a 48-iteration scan and a 32-image sequential
    loop both converge on the honest per-image cost (PERF.md round 4,
    tools/profile_pvrtc_single_vs_batched.py)."""
    from texcomp.ops import pvrtc_encode_image_op

    dt = _time_op(lambda w32: pvrtc_encode_image_op(_words_to_image(w32)),
                  _rand_image_words(h, w), iters=48)
    return (h * w) / dt / 1e6


def bench_pvrtc4_encode(h: int = 2048, w: int = 2048) -> float:
    """4bpp extension codec — BASELINE config 4 names PVRTC 4bpp.

    iters=48: the ~1.2 ms op sits inside the per-scan-iteration floor at
    the default scan length, the same artifact class bench_pvrtc_encode
    was floor-proofed against in round 4 (VERDICT r4 #2/#3; the r3->r4
    5003->3559 swing was adjudicated with this treatment, PERF.md
    "round 5 measurement")."""
    from texcomp.codecs.pvrtc4 import encode_pvrtc_4bpp_device

    dt = _time_op(lambda w32: encode_pvrtc_4bpp_device(_words_to_image(w32)),
                  _rand_image_words(h, w), iters=48)
    return (h * w) / dt / 1e6


def bench_etc1_mipmap_chain(size: int = 2048,
                            interpret: bool = False) -> float:
    """Full ETC1 mipmap chain (fused per-level downsample+encode kernels),
    same accounting as bench_mipmap_chain."""
    from texcomp.ops import etc_pallas
    from texcomp.ops.mipmap import mipmap_chain, num_chain_levels

    img = _rand_image(size, size, 3)
    data = jax.block_until_ready(
        etc_pallas.etc1_encode_image(img, interpret=interpret))
    levels = num_chain_levels(size, size)
    src_pixels = sum((size // (2 ** k)) ** 2 for k in range(levels))

    def op(d):
        outs = mipmap_chain(d, height=size, width=size, codec="etc1",
                            levels=levels, interpret=interpret)
        return jnp.concatenate([o.reshape(1, -1).astype(jnp.uint32).sum(
            axis=1, keepdims=True) for o in outs], axis=1)

    # iters=48: the whole chain is ~1.3 ms — floor-proofed like
    # bench_pvrtc_encode (VERDICT r4 #3).
    dt = _time_op(op, data, iters=48)
    return src_pixels / dt / 1e6


def bench_pvrtc_hq_encode(h: int = 1024, w: int = 1024) -> float:
    """quality="high" 2bpp encode incl. the never-worse best-of — the
    fleet-viability bar for HQ in the asset pipeline (~46-49 Mpix/s)."""
    from texcomp.codecs.pvrtc_hq import encode_pvrtc_2bpp_hq_device

    dt = _time_op(
        lambda w32: encode_pvrtc_2bpp_hq_device(_words_to_image(w32)),
        _rand_image_words(h, w))
    return (h * w) / dt / 1e6


def bench_dxt1_hq_encode(h: int = 1024, w: int = 1024) -> float:
    """quality="high" DXT1 (PCA + cluster-fit + never-worse best-of) —
    fleet-viability number for the flagship quality extension
    (VERDICT r3 #3). Same accounting as pvrtc_hq: image in, blocks out
    (encode_dxt1_hq_image is byte-identical to
    encode_dxt1_hq_blocks(image_to_blocks(im)), tests/test_dxt_hq.py)."""
    from texcomp.codecs.dxt_hq import encode_dxt1_hq_image

    dt = _time_op(encode_dxt1_hq_image, _rand_image(h, w, 3))
    return (h * w) / dt / 1e6


def bench_etc1_hq_encode(h: int = 1024, w: int = 1024) -> float:
    """quality="high" ETC1 (extended search, never-worse); image in,
    blocks out via the packed-word block extraction."""
    from texcomp.codecs.etc import encode_etc1_hq_image

    dt = _time_op(encode_etc1_hq_image, _rand_image(h, w, 3))
    return (h * w) / dt / 1e6


def bench_pvrtc_encode_8192() -> float:
    """Scale-probe regression guard for the 8192^2 PVRTC cliff fix
    (PERF.md "the cliff is dead": 1.5 -> 4.1 Gpix/s; VERDICT r3 #5)."""
    return bench_pvrtc_encode(8192, 8192)


def bench_etc1_encode_2048() -> float:
    """Scale-probe companion to etc1_encode@4096^2: pins the certified
    scale-flat per-block cost (PERF.md round-4 falloff closure)."""
    return bench_etc1_encode(2048, 2048)


def bench_mipmap_chain(size: int = 2048, interpret: bool = False) -> float:
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
                                 levels=levels, interpret=interpret)
        return jnp.concatenate([o.reshape(1, -1).astype(jnp.uint32).sum(
            axis=1, keepdims=True) for o in outs], axis=1)

    # iters=48: the whole chain is ~0.7 ms — floor-proofed like
    # bench_pvrtc_encode (VERDICT r4 #3).
    dt = _time_op(op, data, iters=48)
    return src_pixels / dt / 1e6


def bench_transcode(h: int = 4096, w: int = 4096,
                    interpret: bool = False) -> float:
    """DXT1 -> ETC1 in-place transcode (fused device decode -> heuristic
    re-encode, dxtc_to_etc_transcoder.cc:29-40)."""
    from texcomp.ops import dxt_pallas, etc_pallas

    rng = np.random.default_rng(0)
    data = jax.device_put(
        rng.integers(0, 256, ((h // 4) * (w // 4), 8), dtype=np.uint8))

    def op(d):
        words = dxt_pallas.blocks_to_words(d, 2)
        return etc_pallas.etc1_words_to_blocks(
            etc_pallas.transcode_dxt1_to_etc1_packed(words,
                                                     interpret=interpret))

    # iters=24: ~2.4 ms op — floor-proofed (VERDICT r4 #3).
    dt = _time_op(op, data, iters=24)
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


# (size, count-per-codec): x4 codecs = 9984 assets, ~1.31 Gpix total —
# a realistically size-skewed O(10k) fleet (BASELINE config 5 shape).
_FLEET_DIST = [(64, 1024), (128, 768), (256, 384), (512, 192), (1024, 96),
               (2048, 32)]
_FLEET_CODECS = [("dxt1", 3), ("etc1", 3), ("dxt5", 4), ("pvrtc", 4)]


def bench_pipeline_fleet() -> float:
    """Chip fleet throughput over the realistic O(10k) size distribution:
    for each codec, ONE compiled program encodes that codec's whole
    per-size batch stack (2496 textures, 64^2-2048^2), scan-differenced
    like every other bench. This measures what the chip sustains on
    config 5's workload shape — compile bucketing and mixed batch shapes
    included, tunnel RPC excluded (see --fleet-e2e for the wall-clock
    pipeline.run variant; through the axon dev tunnel that one measures
    ~24 MB/s HTTP streaming, not the framework)."""
    from texcomp.dist.pipeline import _batch_encode

    rng = np.random.default_rng(0)
    total_dt = 0.0
    total_pix = 0
    for codec, ch in _FLEET_CODECS:
        def _put(size, count, ch=ch):
            arr = rng.integers(0, 256, (count, size, size, ch),
                               dtype=np.uint8)
            if ch == 4:
                # 4-channel sources ship as packed u32 words (free host
                # view) like the real pipeline: the device-side u8->u32
                # bitcast is a ~4 ms/134 Mpix relayout
                # (tools/profile_pvrtc_input_layout.py).
                arr = arr.view(np.uint32).reshape(count, size, size)
            return jax.device_put(arr)

        batches = tuple(_put(size, count) for size, count in _FLEET_DIST)

        def op(xs, codec=codec):
            outs = [_batch_encode(x, codec, 2) for x in xs]
            return jnp.stack([o.astype(jnp.uint32).sum() for o in outs])

        total_dt += _time_op(op, batches, iters=3, reps=4)
        total_pix += sum(count * size * size for size, count in _FLEET_DIST)
        del batches
    return total_pix / total_dt / 1e6


def bench_pipeline_fleet_hq() -> float:
    """Config-5 fleet with quality enabled on a realistic fraction: 10% of
    every (codec, size) cell re-encodes through the HQ extension encoders
    (hero assets), the rest through the reference-parity path. Same
    distribution and timing discipline as bench_pipeline_fleet; the
    number is the blended fleet throughput, so it is only fleet-viable if
    the HQ paths are fast (VERDICT r4 #6).

    One timed program per (codec, size) cell — NOT one per codec like
    bench_pipeline_fleet: a single program holding six HQ encoder
    instances plus six reference instances is a large enough HLO that
    the axon remote-compile helper gets OOM-killed (SIGKILL'd subprocess,
    observed 2026-08-20), and the real pipeline compiles per
    (codec, shape-bucket) programs anyway."""
    from texcomp.dist.pipeline import _batch_encode

    rng = np.random.default_rng(0)
    total_dt = 0.0
    total_pix = 0
    for codec, ch in _FLEET_CODECS:
        def _put(size, count, ch=ch):
            arr = rng.integers(0, 256, (count, size, size, ch),
                               dtype=np.uint8)
            if ch == 4:
                arr = arr.view(np.uint32).reshape(count, size, size)
            return jax.device_put(arr)

        def op(xs, codec=codec):
            std, hq = xs
            a = _batch_encode(std, codec, 2)
            b = _batch_encode(hq, codec, 2, quality="high")
            return (a.astype(jnp.uint32).sum()
                    + b.astype(jnp.uint32).sum())[None]

        for size, count in _FLEET_DIST:
            n_hq = max(1, count // 10)
            cell = (_put(size, count - n_hq), _put(size, n_hq))
            total_pix += count * size * size
            total_dt += _time_op(op, cell, iters=3, reps=2)
            del cell
    return total_pix / total_dt / 1e6


def bench_pipeline_fleet_e2e(scale: int = 1) -> float:
    """End-to-end wall clock of the REAL AssetPipeline.run() on the O(10k)
    mixed fleet: host stacking, H2D, sharded dispatch, D2H, container
    packing. First run warms every (shape, codec) program; the second is
    timed. On a direct-attached TPU-VM this is the deployment number; on
    the axon dev tunnel it is bounded by ~24 MB/s HTTP array streaming.
    Each size class reuses a 4-image pool: identical traffic/compute,
    bounded host RAM."""
    import time as _t

    from texcomp.dist.pipeline import AssetPipeline, TextureAsset

    rng = np.random.default_rng(0)
    assets = []
    total_pix = 0
    for size, count in _FLEET_DIST:
        count *= scale
        pools = {c: [rng.integers(0, 256, (size, size, ch), dtype=np.uint8)
                     for _ in range(4)] for c, ch in _FLEET_CODECS}
        for c, _ch in _FLEET_CODECS:
            for i in range(count):
                assets.append(TextureAsset(f"{c}_{size}_{i}",
                                           pools[c][i % 4], c))
                total_pix += size * size
    pipe = AssetPipeline(batch_size=32)
    pipe.run(assets)  # warm every (shape, codec) program
    t0 = _t.perf_counter()
    out = pipe.run(assets)
    dt = _t.perf_counter() - t0
    assert len(out) == len(assets)
    return total_pix / dt / 1e6


_EXTRA_BENCHES = {
    "dxt5_encode": bench_dxt5_encode,       # BASELINE config 2
    "dxt5_mipmap": bench_mipmap_chain,      # BASELINE config 2 (chain)
    "etc1_mipmap": bench_etc1_mipmap_chain,  # fused ETC1 chain
    "etc1_encode": bench_etc1_encode,       # BASELINE config 3
    "pvrtc_encode": bench_pvrtc_encode,     # BASELINE config 4 (2bpp parity bar)
    "pvrtc4_encode": bench_pvrtc4_encode,   # BASELINE config 4 (4bpp extension)
    "pvrtc_hq": bench_pvrtc_hq_encode,      # quality="high" fleet viability
    "dxt1_hq": bench_dxt1_hq_encode,        # quality="high" fleet viability
    "etc1_hq": bench_etc1_hq_encode,        # quality="high" fleet viability
    "pvrtc_encode_8192": bench_pvrtc_encode_8192,  # scale-probe guard
    "etc1_encode_2048": bench_etc1_encode_2048,    # scale-probe guard
    "pipeline_mixed": bench_pipeline,       # BASELINE config 5 (1-chip slice)
    "pipeline_fleet": bench_pipeline_fleet,  # BASELINE config 5 (10k fleet)
    "pipeline_fleet_hq": bench_pipeline_fleet_hq,  # config 5, 10% HQ assets
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
    parser.add_argument("--fleet-e2e", action="store_true",
                        help="also wall-clock the real pipeline.run() on "
                             "the O(10k) fleet (slow through the tunnel)")
    args = parser.parse_args()

    # Fail FAST with a parseable line when the tunneled backend is dead:
    # jax.devices() otherwise hangs in PJRT init until the driver's
    # timeout, recording nothing. 300 s covers a slow-but-alive tunnel
    # (normal init is seconds; first compile happens later).
    import threading

    devs: list = []
    t = threading.Thread(target=lambda: devs.extend(jax.devices()),
                         daemon=True)
    t.start()
    t.join(timeout=300)
    if not devs:
        print(json.dumps({
            "metric": "dxt1_encode_throughput",
            "error": "backend init timed out after 300s "
                     "(axon tunnel unreachable)",
        }))
        return 1

    if args.fleet_e2e:
        v = bench_pipeline_fleet_e2e()
        print(json.dumps({"metric": "pipeline_fleet_e2e_throughput",
                          "value": round(v, 1),
                          "unit": "Mpixels/s/chip"}), file=sys.stderr)

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
