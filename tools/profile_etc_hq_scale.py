"""ETC1-HQ 1024^2 scaling attribution: the 512^2 blocks-level rate is
~27 Mpix/s but the 1024^2 bench reads ~8 — this splits candidate
generation (XLA) from the Pallas search kernel and from the image->blocks
input prep at both sizes so the cliff's owner is measured, not guessed.

    python tools/profile_etc_hq_scale.py [size ...]
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


def _report(name, dt, pix):
    print(f"  {name:34s}: {dt*1e3:9.2f} ms {pix/dt/1e6:9.1f} Mpix/s",
          flush=True)


def profile(size):
    from texcomp.blocks import image_to_blocks
    from texcomp.codecs import etc
    from texcomp.ops import etc_pallas as ep

    rng = np.random.default_rng(0)
    n = (size // 4) * (size // 4)
    pix = size * size
    rgb = jax.device_put(rng.integers(0, 256, (n, 16, 3), dtype=np.int32))
    img = jax.device_put(rng.integers(0, 256, (size, size, 3),
                                      dtype=np.uint8))
    print(f"ETC1-HQ scale stages at {size}^2 ({n} blocks)", flush=True)

    s32 = lambda x: x.astype(jnp.int32).sum()[None].astype(jnp.uint8)

    def full_blocks(x):
        return etc.encode_etc1_hq_blocks(x)

    def full_image(x):
        return etc.encode_etc1_hq_blocks(image_to_blocks(x))

    def blocks_only(x):
        return s32(image_to_blocks(x))

    def cand_gen(x):
        acc = None
        for flip in (False, True):
            qs = etc._hq_base_candidates(x, flip)
            cands = jnp.stack(
                [jnp.stack([ep._pack_q_word(q[0], q[2]),
                            ep._pack_q_word(q[1], q[3])])
                 for q in qs], axis=0)
            v = s32(cands)
            acc = v if acc is None else acc + v
        return acc

    def words_prep(x):
        px = (x[:, :, 0].astype(jnp.uint32)
              | (x[:, :, 1].astype(jnp.uint32) << 8)
              | (x[:, :, 2].astype(jnp.uint32) << 16))
        words_nat = px.T
        words_perm = words_nat[np.asarray(ep._PERM_F), :]
        return s32(words_nat) + s32(words_perm)

    stages = [
        ("FULL (image input)", full_image, img),
        ("FULL (blocks input)", full_blocks, rgb),
        ("image_to_blocks only", blocks_only, img),
        ("candidate gen + pack (XLA)", cand_gen, rgb),
        ("words prep (pack + perm)", words_prep, rgb),
    ]
    for name, fn, arg in stages:
        try:
            dt = time_op(fn, arg, iters=5, reps=3)
            _report(name, dt, pix)
        except Exception as e:  # pragma: no cover
            print(f"  {name:34s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024]
    for s in sizes:
        profile(s)
