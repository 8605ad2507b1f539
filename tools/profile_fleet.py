"""Per-(codec, size-class) profile of the fleet bench (bench_pipeline_fleet).

Times each cell of the _FLEET_DIST x _FLEET_CODECS grid separately with the
scan-differencing timer so the 4.3 Gpix/s aggregate can be attributed.

    python tools/profile_fleet.py            # all cells
    python tools/profile_fleet.py dxt1 etc1  # subset of codecs
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

FLEET_DIST = [(64, 1024), (128, 768), (256, 384), (512, 192), (1024, 96),
              (2048, 32)]
FLEET_CODECS = [("dxt1", 3), ("etc1", 3), ("dxt5", 4), ("pvrtc", 4)]


def main() -> int:
    from texcomp.dist.pipeline import _batch_encode

    codecs = sys.argv[1:] or [c for c, _ in FLEET_CODECS]
    rng = np.random.default_rng(0)
    grand_dt, grand_pix = 0.0, 0
    for codec, ch in FLEET_CODECS:
        if codec not in codecs:
            continue
        print(f"== {codec} ==", flush=True)
        codec_dt, codec_pix = 0.0, 0
        for size, count in FLEET_DIST:
            arr = rng.integers(0, 256, (count, size, size, ch),
                               dtype=np.uint8)
            if ch == 4:
                # match the shipped upload path: 4-channel sources go up
                # as packed u32 words (see bench.bench_pipeline_fleet)
                arr = arr.view(np.uint32).reshape(count, size, size)
            imgs = jax.device_put(arr)

            def op(x, codec=codec):
                o = _batch_encode(x, codec, 2)
                return o.astype(jnp.uint32).sum()[None]

            # Scale the scan length so one run is >=30 ms of device work
            # (estimated at 5 Gpix/s): sub-ms scans sit on the per-iteration
            # floor and the differencing fallback inflates them wildly
            # (CLAUDE.md "floor-bound lies").
            pix_est = count * size * size
            iters = int(min(48, max(4, 0.030 / (pix_est / 5e9))))
            dt = time_op(op, imgs, iters=iters, reps=5)
            pix = count * size * size
            codec_dt += dt
            codec_pix += pix
            print(f"  {size:5d}^2 x{count:5d}: {dt*1e3:8.2f} ms "
                  f"{pix/dt/1e6:8.1f} Mpix/s", flush=True)
            del imgs
        print(f"  TOTAL: {codec_dt*1e3:8.2f} ms "
              f"{codec_pix/codec_dt/1e6:8.1f} Mpix/s", flush=True)
        grand_dt += codec_dt
        grand_pix += codec_pix
    if grand_dt:
        print(f"GRAND: {grand_dt*1e3:.2f} ms "
              f"{grand_pix/grand_dt/1e6:.1f} Mpix/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
