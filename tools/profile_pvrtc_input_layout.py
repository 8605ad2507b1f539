"""Where do the ~6 ms between the pure u32 pack transpose (5.8 ms) and
the batched encode's "upto pack" stage (11.9 ms) go at 2048^2 x32?

Rows:
  u32_plane   : input device-put as u32 (B, H, W) (host .view), bitcast-
                free pack
  u8_rgba     : input device-put as u8 (B, H, W, 4), bitcast on device
                (the shipped fleet path's input form)
Each row times pack-only and pack+morph, with the minor_then_major vs
shipped transpose forms.
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

BH, BW = 4, 8


def pack_shipped(px):
    h, w = px.shape
    t = px.reshape(h // BH, BH, w).transpose(1, 0, 2)
    t = t.reshape(BH, h // BH, w // BW, BW)
    return t.transpose(0, 3, 1, 2).reshape(32, -1)


def pack_minor_major(px):
    h, w = px.shape
    t = px.reshape(h, w // BW, BW).transpose(0, 2, 1)
    t = t.reshape(h // BH, BH, BW, w // BW)
    return t.transpose(1, 2, 0, 3).reshape(32, -1)


def main() -> int:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (count, size, size, 4), dtype=np.uint8)
    u8 = jax.device_put(raw)
    u32 = jax.device_put(raw.view(np.uint32).reshape(count, size, size))
    pix = count * size * size
    wrow = jnp.arange(32, dtype=jnp.uint32)[:, None]

    def fold(out):
        lane = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 1)
        return ((out * (wrow + 1) + (out ^ lane)).sum())[None]

    def u32_op(form):
        def op(x):
            px = x.reshape(count * size, size)
            return fold(form(px))
        return op

    def u8_op(form):
        def op(x):
            px = jax.lax.bitcast_convert_type(
                x.reshape(count * size, size, 4), jnp.uint32)
            return fold(form(px))
        return op

    rows = [
        ("u32 shipped", u32_op(pack_shipped), u32),
        ("u32 minor_major", u32_op(pack_minor_major), u32),
        ("u8  shipped", u8_op(pack_shipped), u8),
        ("u8  minor_major", u8_op(pack_minor_major), u8),
    ]
    print(f"== pack input-layout A/B {size}^2 x{count} ==", flush=True)
    for name, op, arg in rows:
        dt = time_op(op, arg, iters=12, reps=5)
        print(f"  {name:18s}: {dt*1e3:8.2f} ms {pix/dt/1e6:9.1f} Mpix/s",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
