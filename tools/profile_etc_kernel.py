"""Time encode_etc1_words alone on pre-packed (16, N) words across N.

Reconciles the r3 dot-experiment's 5.7 Gpix/s @2048^2 vs the driver's
3.34 Gpix/s @4096^2 (VERDICT r4 item 1). Prints ms/call and ns/block for
N in {2^16..2^20} with per-run spread so floor noise is visible.
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

from texcomp.ops import etc_pallas
from texcomp.utils.profiling import time_op


def main():
    rng = np.random.default_rng(0)
    for logn in (16, 18, 19, 20):
        n = 1 << logn
        words = jnp.asarray(rng.integers(
            0, 2 ** 32, (16, n), dtype=np.uint64).astype(np.uint32))
        ts = [time_op(lambda w: etc_pallas.encode_etc1_words(w), words,
                      iters=16, reps=4) for _ in range(3)]
        pix = n * 16
        msg = " ".join(f"{t*1e3:7.3f}" for t in ts)
        best = min(ts)
        print(f"N=2^{logn} ({pix/1e6:5.1f} Mpix): {msg} ms"
              f"  -> {best*1e9/n:6.2f} ns/blk, {pix/best/1e9:5.2f} Gpix/s",
              flush=True)


if __name__ == "__main__":
    main()
