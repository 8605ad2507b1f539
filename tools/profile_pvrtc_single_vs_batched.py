"""Is the single-image PVRTC rate (8.3 Gpix/s at 2048^2, BENCH_r03) real,
or a scan-floor artifact? Three measurements of the SAME 134M-pixel
workload (32 x 2048^2):

  single   : one 2048^2 image, long scan (iters=48) — the bench's shape
  loop32   : 32 sequential encode_pvrtc_2bpp_fast calls in ONE program
  batched  : shipped encode_pvrtc_2bpp_batched on the (32, ...) stack

If single >> loop32/32-images' rate, the 8.3 was floor-inflated
(per-scan-iteration pipelining); if loop32 >> batched, the batched path
leaves real throughput on the table.
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


def _row(name, dt, pix):
    print(f"  {name:10s}: {dt*1e3:8.2f} ms {pix/dt/1e6:8.1f} Mpix/s",
          flush=True)


def main() -> int:
    from texcomp.ops import pvrtc_fast as pf

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 256, (count, size, size, 4),
                                       dtype=np.uint8))
    one = imgs[0]

    def single(x):
        return pf.encode_pvrtc_2bpp_fast(x).astype(jnp.uint32).sum()[None]

    def loopn(x):
        s = jnp.uint32(0)
        for i in range(count):
            s = s + pf.encode_pvrtc_2bpp_fast(x[i]).astype(
                jnp.uint32).sum()
        return s[None]

    def batched(x):
        return pf.encode_pvrtc_2bpp_batched(x).astype(jnp.uint32).sum()[None]

    print(f"== pvrtc {size}^2, count={count} ==", flush=True)
    _row("single", time_op(single, one, iters=48, reps=5), size * size)
    _row("loopN", time_op(loopn, imgs, iters=4, reps=5),
         count * size * size)
    _row("batched", time_op(batched, imgs, iters=4, reps=5),
         count * size * size)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
