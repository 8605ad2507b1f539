"""Cumulative-prefix stage profile of encode_pvrtc_2bpp_batched.

Times the pipeline truncated after each stage (each prefix consumes its
result into a checksum so XLA cannot delete work); the difference between
consecutive rows is that stage's true end-to-end cost, fusion included.

    python tools/profile_pvrtc_batched_stages.py 512 192
    python tools/profile_pvrtc_batched_stages.py 2048 32
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


def main() -> int:
    from texcomp.ops import pvrtc_fast as pf

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 256, (count, size, size, 4),
                                       dtype=np.uint8))
    pix = count * size * size
    b, h, w = count, size, size
    nby, nbx = h // pf.BLOCK_H, w // pf.BLOCK_W
    nb = nby * nbx
    use_pallas = True
    barrier = jax.lax.optimization_barrier

    gc = pf._pvrtc_mosaic_cols(b, w)
    gr = b // gc
    print(f"mosaic grid: gr={gr} gc={gc}", flush=True)

    def upto(stage):
        def op(images):
            if gc > 1:
                m = images.reshape(gr, gc, h, w, 4).transpose(0, 2, 1, 3, 4)
                m = m.reshape(gr * h, gc * w, 4)
            else:
                m = images.reshape(b * h, w, 4)
            words32 = barrier(pf._to_block_words(m))
            if stage == "pack":
                return words32.sum()[None]
            w0 = words32[0:1].reshape(gr, nby, gc, nbx)
            p00 = jnp.broadcast_to(w0[:, 0:1, :, 0:1], (gr, nby, gc, nbx)
                                   ).reshape(1, b * nb).astype(jnp.int32)
            if use_pallas and words32.shape[1] >= (1 << 20):
                ab = pf.morph_packed_batched(words32, p00)
            else:
                ab = pf._morph_words(words32, p00)
            ab = barrier(ab)
            if stage == "morph":
                return ab.sum()[None]
            va9 = pf._make_var_words_batched(ab[0:1], gr, nby, gc, nbx)
            vb9 = pf._make_var_words_batched(ab[1:2], gr, nby, gc, nbx)
            if stage == "varwords":
                return (va9.sum() + vb9.sum())[None]
            if use_pallas:
                mod = pf.upscale_modulate_packed(
                    words32, jnp.concatenate([va9, vb9], axis=0))
            else:
                mod = pf._upscale_modulate_body(words32, va9, vb9)
            mod = barrier(mod)
            if stage == "modulate":
                return mod.sum()[None]
            nh_edge, nv_edge = pf._mode_edges_batched(mod, gr, nby, gc, nbx)
            if stage == "edges":
                return (nh_edge.sum() + nv_edge.sum())[None]
            if use_pallas:
                words = pf.modes_pack_colors_packed(mod, nh_edge, nv_edge, ab)
            else:
                words = pf._modes_pack_colors_body(mod, nh_edge, nv_edge, ab)
            if stage == "pack_colors":
                return words.sum()[None]
            if gc > 1:
                words = words.reshape(2, gr, nby, gc, nbx).transpose(
                    0, 1, 3, 2, 4).reshape(2, b * nb)
            if stage == "unmosaic":
                return words.sum()[None]
            zw = pf._zorder_words_batched(words, b, nbx, nby)
            both = jnp.stack([zw[0].reshape(b, nb), zw[1].reshape(b, nb)],
                             axis=-1)
            out = jax.lax.bitcast_convert_type(both, jnp.uint8)
            return out.astype(jnp.uint32).sum()[None]

        return op

    iters = int(min(48, max(4, 0.060 / (pix / 5e9))))
    print(f"== pvrtc batched {size}^2 x{count} (iters={iters}) ==",
          flush=True)
    prev = 0.0
    for stage in ("pack", "morph", "varwords", "modulate", "edges",
                  "pack_colors", "unmosaic", "full"):
        dt = time_op(upto(stage), imgs, iters=iters, reps=5)
        print(f"  upto {stage:12s}: {dt*1e3:8.2f} ms "
              f"(+{(dt-prev)*1e3:7.2f})  {pix/dt/1e6:8.1f} Mpix/s",
              flush=True)
        prev = dt
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
