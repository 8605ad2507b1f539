"""Stage-level attribution for the two slow fleet cells found by
tools/profile_fleet.py: dxt5@64^2x1024 (0.5 Gpix/s) and the batched PVRTC
classes >=128^2 (2-3 Gpix/s vs 8.3 single-image).

    python tools/profile_fleet_stages.py dxt5
    python tools/profile_fleet_stages.py pvrtc [size count]
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


def _imgs(count, size, ch):
    rng = np.random.default_rng(0)
    return jax.device_put(rng.integers(
        0, 256, (count, size, size, ch), dtype=np.uint8))


def _report(name, dt, pix):
    print(f"  {name:28s}: {dt*1e3:8.2f} ms {pix/dt/1e6:8.1f} Mpix/s",
          flush=True)


def profile_dxt5(size=64, count=1024):
    from texcomp.ops import dxt_pallas

    imgs = _imgs(count, size, 4)
    b, h, w = count, size, size
    n = (h // 4) * (w // 4)
    pix = count * size * size

    def pack_only(x):
        tall = x.reshape(b * h, w, 4)
        return dxt_pallas.pack_rgba_image(tall).astype(jnp.uint32).sum()[None]

    def pack_concat(x):
        tall = x.reshape(b * h, w, 4)
        words = dxt_pallas.pack_rgba_image(tall)
        flag = jnp.zeros((1, b * n), dtype=jnp.uint32)
        w17 = jnp.concatenate([words, flag], axis=0)
        return w17.astype(jnp.uint32).sum()[None]

    def full(x):
        tall = x.reshape(b * h, w, 4)
        words = dxt_pallas.pack_rgba_image(tall)
        flag = jnp.zeros((1, b * n), dtype=jnp.uint32)
        out = dxt_pallas.encode_dxt5_packed(
            jnp.concatenate([words, flag], axis=0))
        return out.astype(jnp.uint32).sum()[None]

    def dxt1_on_same(x):
        tall = x.reshape(b * h, w, 4)
        words = dxt_pallas.pack_rgba_image(tall)
        out = dxt_pallas.encode_dxt1_packed(words)
        return out.astype(jnp.uint32).sum()[None]

    print(f"== dxt5 {size}^2 x{count} stages ==", flush=True)
    for name, op in [("pack", pack_only), ("pack+concat", pack_concat),
                     ("full dxt5", full), ("dxt1 on same input", dxt1_on_same)]:
        _report(name, time_op(op, imgs, iters=12, reps=5), pix)


def profile_pvrtc(size=512, count=192):
    from texcomp.ops import pvrtc_fast as pf

    imgs = _imgs(count, size, 4)
    b, h, w = count, size, size
    nby, nbx = h // pf.BLOCK_H, w // pf.BLOCK_W
    nb = nby * nbx
    pix = count * size * size
    barrier = jax.lax.optimization_barrier

    def s(x):
        return x.astype(jnp.uint32).sum()[None]

    def words_only(x):
        return s(pf._to_block_words(x.reshape(b * h, w, 4)))

    def through_morph(x):
        words32 = barrier(pf._to_block_words(x.reshape(b * h, w, 4)))
        p00 = jnp.broadcast_to(
            words32[0:1, ::nb].reshape(1, b, 1), (1, b, nb)
        ).reshape(1, b * nb).astype(jnp.int32)
        if words32.shape[1] >= (1 << 20):
            ab = pf.morph_packed_batched(words32, p00)
        else:
            ab = pf._morph_words(words32, p00)
        return s(ab)

    def through_var(x):
        words32 = barrier(pf._to_block_words(x.reshape(b * h, w, 4)))
        p00 = jnp.broadcast_to(
            words32[0:1, ::nb].reshape(1, b, 1), (1, b, nb)
        ).reshape(1, b * nb).astype(jnp.int32)
        if words32.shape[1] >= (1 << 20):
            ab = pf.morph_packed_batched(words32, p00)
        else:
            ab = pf._morph_words(words32, p00)
        ab = barrier(ab)
        va9 = pf._make_var_words_batched(ab[0:1], b, nby, nbx)
        vb9 = pf._make_var_words_batched(ab[1:2], b, nby, nbx)
        return s(va9) + s(vb9)

    def through_mod(x):
        words32 = barrier(pf._to_block_words(x.reshape(b * h, w, 4)))
        p00 = jnp.broadcast_to(
            words32[0:1, ::nb].reshape(1, b, 1), (1, b, nb)
        ).reshape(1, b * nb).astype(jnp.int32)
        if words32.shape[1] >= (1 << 20):
            ab = pf.morph_packed_batched(words32, p00)
        else:
            ab = pf._morph_words(words32, p00)
        ab = barrier(ab)
        va9 = pf._make_var_words_batched(ab[0:1], b, nby, nbx)
        vb9 = pf._make_var_words_batched(ab[1:2], b, nby, nbx)
        mod = pf.upscale_modulate_packed(
            words32, jnp.concatenate([va9, vb9], axis=0))
        return s(mod)

    def full(x):
        return s(pf.encode_pvrtc_2bpp_batched(x))

    def single_loop(x):
        # The pre-round-4 per-image alternative, for the honest A/B.
        outs = [pf.encode_pvrtc_2bpp_fast(x[i]) for i in range(4)]
        return sum(s(o) for o in outs)

    print(f"== pvrtc {size}^2 x{count} stages ==", flush=True)
    for name, op in [("to_block_words", words_only),
                     ("..+morph", through_morph),
                     ("..+var_words", through_var),
                     ("..+upscale_mod", through_mod),
                     ("full batched", full)]:
        _report(name, time_op(op, imgs, iters=12, reps=5), pix)
    small = jax.device_put(np.asarray(imgs[:4]))
    _report("4-image python loop", time_op(single_loop, small, iters=12,
                                           reps=5), 4 * size * size)


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "dxt5"
    if kind == "dxt5":
        args = [int(a) for a in sys.argv[2:4]]
        profile_dxt5(*args)
    else:
        args = [int(a) for a in sys.argv[2:4]]
        profile_pvrtc(*args)
    raise SystemExit(0)
