"""Long-scan (>=80 ms/run) attribution of the 1.57M-lane dxt1 dip and the
honest single-image PVRTC 2048^2 rate. Sub-ms scan runs through the axon
tunnel produce garbage (observed 205 Gpix/s phantoms); every row here
keeps the scan run long enough to swamp the floor."""

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
    print(f"  {name:32s}: {dt*1e3:8.3f} ms {pix/dt/1e6:8.1f} Mpix/s",
          flush=True)


def main():
    from texcomp.ops import dxt_pallas
    from texcomp.ops import pvrtc_fast as pf

    rng = np.random.default_rng(0)

    # --- dxt1 256^2 x384 dip ---
    b, hw = 384, 256
    n = (hw // 4) * (hw // 4)
    pix = b * hw * hw
    imgs = jax.device_put(rng.integers(0, 256, (b, hw, hw, 3),
                                       dtype=np.uint8))
    packed = jax.device_put(rng.integers(0, 1 << 24, (16, b * n),
                                         dtype=np.int64).astype(np.uint32))

    def full(x):
        tall = x.reshape(b * hw, hw, 3)
        words = dxt_pallas.pack_rgb_image(tall)
        out = dxt_pallas.encode_dxt1_packed(words)
        return out.astype(jnp.uint32).sum()[None]

    def kernel_only(w32):
        out = dxt_pallas.encode_dxt1_packed(w32)
        return out.astype(jnp.uint32).sum()[None]

    print("== dxt1 256^2 x384 (1.57M lanes), long scans ==", flush=True)
    _row("full (pack+kernel) it=16", time_op(full, imgs, iters=16, reps=5),
         pix)
    _row("kernel only it=48", time_op(kernel_only, packed, iters=48,
                                      reps=5), pix)

    big = jax.device_put(rng.integers(0, 256, (3072, 2048, 3),
                                      dtype=np.uint8))

    def full_one(x):
        words = dxt_pallas.pack_rgb_image(x)
        out = dxt_pallas.encode_dxt1_packed(words)
        return out.astype(jnp.uint32).sum()[None]

    _row("one 3072x2048 image it=192",
         time_op(full_one, big, iters=192, reps=5), 3072 * 2048)

    # --- honest single-image PVRTC 2048^2 ---
    words1 = jax.device_put(
        rng.integers(0, 256, (2048, 2048, 4), dtype=np.uint8)
        .view(np.uint32).reshape(2048, 2048))

    def pv_single(w32):
        img = jax.lax.bitcast_convert_type(w32, jnp.uint8)
        return pf.encode_pvrtc_2bpp_fast(img).astype(jnp.uint32).sum()[None]

    print("== pvrtc single 2048^2, long scan ==", flush=True)
    _row("words input it=96", time_op(pv_single, words1, iters=96, reps=5),
         2048 * 2048)
    _row("words input it=9 (bench form)",
         time_op(pv_single, words1, iters=9, reps=6), 2048 * 2048)


if __name__ == "__main__":
    main()
