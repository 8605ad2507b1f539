"""Chunked batched-PVRTC A/B: process the lane-folded batch in chunks
small enough that the XLA morph stays fused (below its VMEM-spill regime)
instead of paying the Pallas morph boundary at full batch width.

Rows: shipped batched (pallas morph at >=2^20 lanes), chunked python-loop
variants at several chunk sizes, for the 2048^2 x32 and 512^2 x192 and
64^2 x1024 fleet cells. All scans >= 60 ms.
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
    print(f"  {name:28s}: {dt*1e3:8.2f} ms {pix/dt/1e6:8.1f} Mpix/s",
          flush=True)


def cell(size, count, chunks, iters):
    from texcomp.ops import pvrtc_fast as pf

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 256, (count, size, size, 4),
                                       dtype=np.uint8))
    pix = count * size * size

    def shipped(x):
        return pf.encode_pvrtc_2bpp_batched(x).astype(
            jnp.uint32).sum()[None]

    print(f"== pvrtc {size}^2 x{count} ==", flush=True)
    _row("shipped", time_op(shipped, imgs, iters=iters, reps=5), pix)
    for ch in chunks:
        if count % ch:
            continue

        def chunked(x, ch=ch):
            outs = [pf.encode_pvrtc_2bpp_batched(x[i:i + ch])
                    for i in range(0, count, ch)]
            return sum(o.astype(jnp.uint32).sum() for o in outs)[None]

        _row(f"chunk={ch}", time_op(chunked, imgs, iters=iters, reps=5),
             pix)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "2048"):
        cell(2048, 32, (4, 8, 16), 12)
    if which in ("all", "512"):
        cell(512, 192, (24, 48, 96), 12)
    if which in ("all", "64"):
        cell(64, 1024, (256, 512), 48)
