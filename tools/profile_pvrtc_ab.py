"""A/B the PVRTC 2bpp encode measurement + batching forms at 2048^2.

Resolves the apparent 8.3 (bench single) vs 3.6 (batched fleet cell) vs
4.2 (4-image python loop) Gpix/s spread: input form (u32 words vs u8
slices), scan length, and batch form are varied independently.
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


def main():
    from texcomp.ops.pvrtc_fast import (encode_pvrtc_2bpp_batched,
                                        encode_pvrtc_2bpp_fast)

    h = w = 2048
    rng = np.random.default_rng(0)
    words1 = jax.device_put(rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
                            .view(np.uint32).reshape(h, w))
    img8 = jax.device_put(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
    imgs4 = jax.device_put(rng.integers(0, 256, (4, h, w, 4), dtype=np.uint8))

    def s(x):
        return x.astype(jnp.uint32).sum()[None]

    def from_words(w32):
        img = jax.lax.bitcast_convert_type(w32, jnp.uint8)
        return s(encode_pvrtc_2bpp_fast(img))

    def from_u8(x):
        return s(encode_pvrtc_2bpp_fast(x))

    def batched1(x):
        return s(encode_pvrtc_2bpp_batched(x[None]))

    def batched4(x):
        return s(encode_pvrtc_2bpp_batched(x))

    def loop4(x):
        return sum(s(encode_pvrtc_2bpp_fast(x[i])) for i in range(4))

    rows = [
        ("single words iters=9", from_words, words1, 9, h * w),
        ("single words iters=48", from_words, words1, 48, h * w),
        ("single u8 iters=48", from_u8, img8, 48, h * w),
        ("batched B=1 iters=48", batched1, img8, 48, h * w),
        ("batched B=4 iters=12", batched4, imgs4, 12, 4 * h * w),
        ("loop4 iters=12", loop4, imgs4, 12, 4 * h * w),
    ]
    for name, op, arg, iters, pix in rows:
        dt = time_op(op, arg, iters=iters, reps=5)
        print(f"  {name:24s}: {dt*1e3:8.2f} ms {pix/dt/1e6:8.1f} Mpix/s",
              flush=True)


if __name__ == "__main__":
    main()
