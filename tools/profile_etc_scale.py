"""Stage-profile etc1_encode_image_op at 2048^2 vs 4096^2 (VERDICT r3 #1).

Times CUMULATIVE prefixes of the pipeline (standalone stage timings lie:
XLA deletes transposes feeding the checksum reduction), then differences:

  P0: pack_rgb_image                      (image -> (16, N) words)
  P1: P0 + encode_etc1_words              (+ search kernel)
  P2: P1 + etc1_words_to_blocks           (+ LE word transpose/bitcast)

Run on the real TPU:  python tools/profile_etc_scale.py [sizes...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from texcomp.ops import dxt_pallas, etc_pallas
from texcomp.utils.profiling import time_op


def _img(size):
    rng = np.random.default_rng(0)
    return jax.device_put(
        rng.integers(0, 256, (size, size, 3), dtype=np.uint8))


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [2048, 4096]
    for size in sizes:
        img = _img(size)
        px = size * size

        def p0(x):
            return dxt_pallas.pack_rgb_image(x)

        def p1(x):
            return etc_pallas.encode_etc1_words(dxt_pallas.pack_rgb_image(x))

        def p2(x):
            return etc_pallas.etc1_words_to_blocks(
                etc_pallas.encode_etc1_words(dxt_pallas.pack_rgb_image(x)))

        t0 = time_op(p0, img, iters=16, reps=8)
        t1 = time_op(p1, img, iters=16, reps=8)
        t2 = time_op(p2, img, iters=16, reps=8)
        print(f"== {size}x{size} ==")
        print(f"  P0 pack            : {t0*1e3:8.3f} ms  "
              f"({px/t0/1e9:6.2f} Gpix/s)")
        print(f"  P1 +search         : {t1*1e3:8.3f} ms  "
              f"({px/t1/1e9:6.2f} Gpix/s)  d={1e3*(t1-t0):7.3f} ms")
        print(f"  P2 +words_to_blocks: {t2*1e3:8.3f} ms  "
              f"({px/t2/1e9:6.2f} Gpix/s)  d={1e3*(t2-t1):7.3f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
