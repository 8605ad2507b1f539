"""A/B the shipped grid-mosaic batched encode (_folded_encode) against the
old tall-fold form at the fleet dip cells (long scans only).

    python tools/profile_pack_forms.py [dxt1|dxt5|etc1] ...
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


def _tall_encode(images, codec, strategy, swap):
    """The pre-mosaic round-4 form, kept for the A/B."""
    from texcomp.ops import dxt_pallas, etc_pallas

    b, h, w, ch = images.shape
    n = (h // 4) * (w // 4)
    tall = images.reshape(b * h, w, ch)
    if codec == "dxt5":
        words = dxt_pallas.pack_rgba_image(tall, swap=swap)
    else:
        words = dxt_pallas.pack_rgb_image(tall, swap=swap)
    if codec == "dxt1":
        wv = dxt_pallas.encode_dxt1_words(words, swap=swap)
    elif codec == "dxt5":
        flag = jnp.zeros((1, b * n), dtype=jnp.uint32)
        wv = dxt_pallas.encode_dxt5_words(
            jnp.concatenate([words, flag], axis=0), swap=swap)
    else:
        wv = etc_pallas.encode_etc1_words(words, strategy)
    wpb = wv.shape[0]
    return jax.lax.bitcast_convert_type(
        wv.reshape(wpb, b, n).transpose(1, 2, 0), jnp.uint8
    ).reshape(b, n, 4 * wpb)


CELLS = [(64, 1024), (128, 768), (256, 384), (512, 192)]


def main():
    from texcomp.dist.pipeline import _folded_encode, _mosaic_cols

    codecs = sys.argv[1:] or ["dxt1"]
    rng = np.random.default_rng(0)
    for codec in codecs:
        ch = 4 if codec == "dxt5" else 3
        for size, count in CELLS:
            imgs = jax.device_put(rng.integers(
                0, 256, (count, size, size, ch), dtype=np.uint8))
            pix = count * size * size
            iters = int(min(48, max(6, 0.060 / (pix / 5e9))))

            def tall(x, codec=codec):
                return _tall_encode(x, codec, 2, False).astype(
                    jnp.uint32).sum()[None]

            def mosaic(x, codec=codec):
                return _folded_encode(x, codec, 2, False).astype(
                    jnp.uint32).sum()[None]

            gc = _mosaic_cols(count, size)
            print(f"== {codec} {size}^2 x{count} (gc={gc}) ==", flush=True)
            _row("tall (old)", time_op(tall, imgs, iters=iters, reps=5),
                 pix)
            _row("mosaic (shipped)", time_op(mosaic, imgs, iters=iters,
                                             reps=5), pix)
            del imgs


if __name__ == "__main__":
    main()
