"""Healthy-window A/Bs for the two fleet attribution questions:

1. pvrtc batched 2048^2 x32: u8 image input vs pre-bitcast u32 words
   input; pallas per-lane-p00 morph vs XLA fused morph.
2. the 1.57M-lane dip (dxt1 256^2 x384): full path vs kernel-only on
   pre-packed words (difference = the pack transpose's true cost).

Starts with a health probe; refuses to print A/B rows in a degraded state.
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
    print(f"  {name:32s}: {dt*1e3:8.2f} ms {pix/dt/1e6:8.1f} Mpix/s",
          flush=True)


def health() -> bool:
    from texcomp.dist.pipeline import _batch_encode

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 256, (8, 1024, 1024, 3),
                                       dtype=np.uint8))

    def op(x):
        return _batch_encode(x, "dxt1", 2).astype(jnp.uint32).sum()[None]

    dt = time_op(op, imgs, iters=12, reps=3)
    mpix = 8 * 1024 * 1024 / dt / 1e6
    print(f"health: {mpix:.0f} Mpix/s", flush=True)
    return mpix >= 3000


def ab_pvrtc():
    from texcomp.ops import pvrtc_fast as pf

    b, hw = 32, 2048
    pix = b * hw * hw
    rng = np.random.default_rng(0)
    imgs8 = jax.device_put(rng.integers(0, 256, (b, hw, hw, 4),
                                        dtype=np.uint8))
    words = jax.device_put(
        rng.integers(0, 256, (b, hw, hw, 4), dtype=np.uint8)
        .view(np.uint32).reshape(b, hw, hw))

    def from_u8(x):
        return pf.encode_pvrtc_2bpp_batched(x).astype(jnp.uint32).sum()[None]

    def from_words(w32):
        img = jax.lax.bitcast_convert_type(w32, jnp.uint8)
        return pf.encode_pvrtc_2bpp_batched(img).astype(
            jnp.uint32).sum()[None]

    def xla_morph(x):
        # encode_pvrtc_2bpp_batched with the XLA morph form forced (the
        # batched path picks pallas at >=2^20 lanes; single-image at this
        # size would have used the fused XLA form).
        bb, h, w = x.shape[0], x.shape[1], x.shape[2]
        nby, nbx = h // pf.BLOCK_H, w // pf.BLOCK_W
        nb = nby * nbx
        barrier = jax.lax.optimization_barrier
        words32 = barrier(pf._to_block_words(x.reshape(bb * h, w, 4)))
        p00 = jnp.broadcast_to(
            words32[0:1, ::nb].reshape(1, bb, 1), (1, bb, nb)
        ).reshape(1, bb * nb).astype(jnp.int32)
        ab = barrier(pf._morph_words(words32, p00))
        va9 = pf._make_var_words_batched(ab[0:1], bb, nby, nbx)
        vb9 = pf._make_var_words_batched(ab[1:2], bb, nby, nbx)
        mod = barrier(pf.upscale_modulate_packed(
            words32, jnp.concatenate([va9, vb9], axis=0)))
        nh_edge, nv_edge = pf._mode_edges_batched(mod, bb, nby, nbx)
        w2 = pf.modes_pack_colors_packed(mod, nh_edge, nv_edge, ab)
        zw = pf._zorder_words_batched(w2, bb, nbx, nby)
        both = jnp.stack([zw[0].reshape(bb, nb), zw[1].reshape(bb, nb)],
                         axis=-1)
        out = jax.lax.bitcast_convert_type(both, jnp.uint8).reshape(
            bb, nb, 8)
        return out.astype(jnp.uint32).sum()[None]

    print("== pvrtc batched 2048^2 x32 ==", flush=True)
    _row("u8 input (shipped)", time_op(from_u8, imgs8, iters=12, reps=5),
         pix)
    _row("u32 words input", time_op(from_words, words, iters=12, reps=5),
         pix)
    _row("u8 + XLA morph", time_op(xla_morph, imgs8, iters=12, reps=5),
         pix)


def ab_dip():
    from texcomp.ops import dxt_pallas

    b, hw = 384, 256
    n = (hw // 4) * (hw // 4)
    pix = b * hw * hw
    rng = np.random.default_rng(0)
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

    print("== dxt1 256^2 x384 (1.57M lanes) ==", flush=True)
    _row("full (pack+kernel)", time_op(full, imgs, iters=8, reps=5), pix)
    _row("kernel only (pre-packed)", time_op(kernel_only, packed, iters=8,
                                             reps=5), pix)

    # Same lane count, one big image: isolates "tall aspect" from "count".
    big = jax.device_put(rng.integers(0, 256, (3072, 2048, 3),
                                      dtype=np.uint8))

    def full_one(x):
        words = dxt_pallas.pack_rgb_image(x)
        out = dxt_pallas.encode_dxt1_packed(words)
        return out.astype(jnp.uint32).sum()[None]

    _row("one 3072x2048 image", time_op(full_one, big, iters=8, reps=5),
         3072 * 2048)


if __name__ == "__main__":
    if not health():
        print("DEGRADED - aborting A/B", flush=True)
        raise SystemExit(1)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "pvrtc"):
        ab_pvrtc()
    if which in ("all", "dip"):
        ab_dip()
    raise SystemExit(0)
