"""A/B alternative XLA formulations of the PVRTC pack transpose
(_to_block_words) at the big fleet-cell shape.

Each form maps (H, W, 4) u8 -> (32, NB) u32 words identically (verified
on CPU in tests; here re-checked once on small data before timing). The
checksum is ORDER-DEPENDENT (iota-weighted sum) so XLA cannot delete the
transpose (CLAUDE.md gotcha).

    python tools/profile_pvrtc_pack_forms.py [H W]
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


def form_shipped(px):
    h, w = px.shape
    t = px.reshape(h // BH, BH, w).transpose(1, 0, 2)
    t = t.reshape(BH, h // BH, w // BW, BW)
    return t.transpose(0, 3, 1, 2).reshape(32, -1)


def form_one_transpose(px):
    h, w = px.shape
    t = px.reshape(h // BH, BH, w // BW, BW)
    return t.transpose(1, 3, 0, 2).reshape(32, -1)


def form_blockize_then_2d(px):
    h, w = px.shape
    t = px.reshape(h // BH, BH, w // BW, BW).transpose(0, 2, 1, 3)
    return t.reshape(-1, 32).T


def form_minor_swap_then_major(px):
    h, w = px.shape
    # minor swap first: (h, w/8, 8) -> (h, 8, w/8), then majors.
    t = px.reshape(h, w // BW, BW).transpose(0, 2, 1)
    t = t.reshape(h // BH, BH, BW, w // BW)
    return t.transpose(1, 2, 0, 3).reshape(32, -1)


FORMS = [("shipped", form_shipped), ("one_transpose", form_one_transpose),
         ("blockize_2d", form_blockize_then_2d),
         ("minor_then_major", form_minor_swap_then_major)]


def main() -> int:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    rng = np.random.default_rng(0)

    # Small-shape equivalence check (on-device, cheap).
    small = jnp.asarray(rng.integers(0, 2**32, (64, 64), dtype=np.uint32))
    base = np.asarray(jax.jit(form_shipped)(small))
    for name, fn in FORMS[1:]:
        np.testing.assert_array_equal(np.asarray(jax.jit(fn)(small)), base,
                                      err_msg=name)
    print("equivalence: OK", flush=True)

    px = jax.device_put(rng.integers(0, 2**32, (h, w), dtype=np.uint32))
    pix = h * w
    n = pix // 32
    wrow = jnp.arange(32, dtype=jnp.uint32)[:, None]

    def time_form(fn):
        def op(x):
            out = fn(x)
            # order-dependent fold: weight sublanes, then a lane-phase mix.
            lane = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 1)
            return ((out * (wrow + 1) + (out ^ lane)).sum())[None]

        return time_op(op, px, iters=12, reps=5)

    base_dt = None
    for name, fn in FORMS:
        dt = time_form(fn)
        note = "" if base_dt is None else f"  ({base_dt/dt:.2f}x)"
        if base_dt is None:
            base_dt = dt
        print(f"  {name:18s}: {dt*1e3:8.2f} ms "
              f"{pix/dt/1e6:8.1f} Mpix/s{note}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
