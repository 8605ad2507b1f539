"""Upper bound for ETC1 codeword-search pruning (VERDICT r4 #5 / r5 task 5).

The proposed optimization: a conservative per-codeword lower bound (from
subblock deviation vs the codebook's modifier range,
etc_compressor.cc:350-409 semantics) that provably excludes codewords, so
the kSmallerError search evaluates only survivors.

On a lane-parallel TPU kernel, a skipped codeword saves time ONLY when
every lane in a grid tile agrees to skip it (Mosaic predication
evaluates both sides otherwise), and the bound itself costs VPU ops per
codeword per lane. So the *ceiling* for any such scheme is the kernel
with the codeword loop statically truncated — pruning as if it were
free and unanimously agreed. This tool measures that ceiling by
compiling the encode kernel at _N_CW_PROBE = 8 (parity baseline), 4,
and 2 evaluated codewords (parity-breaking, perf-only) and timing each
at 2048^2 and 4096^2 with the tunnel-safe scan timer.

Decision rule (VERDICT): ship a real pruning scheme only if it could
beat 1.3x — i.e. only if even the FREE-pruning ceiling at 4/8 codewords
clears 1.3x. Otherwise record the rejection in docs/PERF.md.

    python tools/probe_etc_prune_ceiling.py [size ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from texcomp.utils.profiling import time_op

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> None:
    from texcomp.ops import etc_pallas

    sizes = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    rng = np.random.default_rng(0)
    for size in sizes:
        img = jax.device_put(
            rng.integers(0, 256, (size, size, 3), dtype=np.uint8))
        pix = size * size
        base_dt = None
        for n_cw in (8, 4, 2):
            etc_pallas._N_CW_PROBE = n_cw
            jax.clear_caches()  # the knob is read at trace time
            try:
                dt = time_op(
                    lambda im: etc_pallas.etc1_encode_image(
                        im, strategy=etc_pallas.SMALLER_ERROR),
                    img, iters=16)
            finally:
                etc_pallas._N_CW_PROBE = 8
            if n_cw == 8:
                base_dt = dt
            print(f"  {size}^2 n_cw={n_cw}: {dt * 1e3:8.2f} ms "
                  f"{pix / dt / 1e6:8.1f} Mpix/s "
                  f"ceiling={base_dt / dt:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
