"""Fused on-device mipmap chains (EXTENSION — TPU-first answer to the
"1024x1024 + full mipmap chain" workload, BASELINE config 2).

The reference computes each mip level with a separate Downsample call
(decode 2x2 blocks -> truncating average -> re-encode one block,
compressor4x4_helper.h:264-391). The API path here mirrors that per-level
structure, which costs one host<->device round trip per level. This module
runs the WHOLE chain as one jit program: every level's payload is produced
on device from the previous level's payload — decode, 2x2 truncating
average (color_util.h:335-380 semantics: non-negative sum // 4), re-encode
— with no intermediate host transfer.

Byte-exactness: each level equals what repeated Compressor.downsample calls
produce (tested in tests/test_mipmap.py), which are themselves
oracle-verified; levels are chained from the *encoded payloads* (not the
pre-encode pixels), exactly like repeated Downsample.

Covers the clean case: RGB/RGBA (no swap — downsample re-encodes with
swap_red_and_blue=false anyway, compressor4x4_helper.h:602-607), reference
quality, and even block counts at every produced level (sizes that are
multiples of 4 with >= 2x2 blocks). The API tail (4x4 -> 2x2 -> 1x1 and
ragged sizes) stays on the per-level path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from texcomp.ops import dxt_pallas, etc_pallas


def num_chain_levels(height: int, width: int) -> int:
    """How many chained levels the fused op can produce: downsampling a
    level requires an even block count in both dims (i.e. extents that are
    multiples of 8); the chain stops at the first level that isn't."""
    levels = 0
    h, w = height, width
    while h % 8 == 0 and w % 8 == 0:
        h //= 2
        w //= 2
        levels += 1
    return levels


@partial(jax.jit, static_argnames=("height", "width", "codec", "strategy",
                                   "levels", "interpret"))
def mipmap_chain(data: jax.Array, *, height: int, width: int, codec: str,
                 levels: int, strategy: int = 2,
                 interpret: bool = False) -> tuple[jax.Array, ...]:
    """(N, block_size) uint8 level-0 payload -> tuple of payloads for
    levels 1..levels, all computed on device in one compiled program.

    codec: "dxt1" | "dxt5" | "etc1" (strategy applies to etc1 only).
    height/width are level 0's uncompressed extent (multiples of 4, with
    even block counts through all requested levels — see num_chain_levels).
    """
    outs = []
    cur = data
    h, w = height, width

    # Fast path: one fused decode->average->encode kernel per level,
    # chained through LE uint32 block words (dxtc_downsample_encode_words /
    # etc1_downsample_encode_words) — no intermediate image, no
    # blocks<->image transposes, half the kernel launches. Bit-identical
    # to the generic loop below (tested in tests/test_mipmap.py).
    if codec in ("dxt1", "dxt5", "etc1"):
        is_dxt1 = codec == "dxt1"
        cur_words = dxt_pallas.blocks_to_words(
            data, 4 if codec == "dxt5" else 2)
        while len(outs) < levels and (h // 2) * (w // 2) >= _SMALL_LEVEL:
            if codec == "etc1":
                cur_words = etc_pallas.etc1_downsample_encode_words(
                    cur_words, nby=h // 4, nbx=w // 4, strategy=strategy,
                    interpret=interpret)
            else:
                cur_words = dxt_pallas.dxtc_downsample_encode_words(
                    cur_words, nby=h // 4, nbx=w // 4, is_dxt1=is_dxt1,
                    interpret=interpret)
            cur = dxt_pallas.words_to_blocks(cur_words)
            outs.append(cur)
            h //= 2
            w //= 2

    for _ in range(levels - len(outs)):
        img = _decode_level(cur, codec, h, w, interpret)
        h //= 2
        w //= 2
        c = img.shape[-1]
        # Truncating 2x2 average (ComputeAveragePixel2x2 semantics:
        # non-negative sum // 4 == the reference's truncating divide).
        # >> 2 == // 4 on the nonneg sum (XLA doesn't strength-reduce
        # signed integer division; see CLAUDE.md playbook).
        avg = (img.astype(jnp.int32).reshape(h, 2, w, 2, c).sum(axis=(1, 3))
               >> 2).astype(jnp.uint8)
        cur = _encode_level(avg, codec, strategy, interpret)
        outs.append(cur)
    return tuple(outs)


# Below this pixel count a level runs on the jnp reference codecs (which
# the Pallas kernels are bit-identical to): a chain's smallest tail
# levels are bound by pallas_call invocation overhead (~0.15-0.2 ms each
# inside the program), not compute — pure-XLA tails fuse into the
# program for free. TPU A/B on the 2048^2 DXT5 chain: threshold 512^2
# was a 1.9x REGRESSION (the jnp codecs recompute too much at mid
# sizes); 64^2 measured neutral-to-+10% vs no fold (1291-1327 ->
# 1327-1497 Mpix/s) while saving 4 launches per chain.
_SMALL_LEVEL = 64 * 64


def _decode_level(cur, codec, h, w, interpret):
    if h * w >= _SMALL_LEVEL:
        if codec == "dxt1":
            return dxt_pallas.dxt1_decode_image(
                cur, height=h, width=w, interpret=interpret)[:, :, :3]
        if codec == "dxt5":
            return dxt_pallas.dxt5_decode_image(
                cur, height=h, width=w, interpret=interpret)
        return etc_pallas.etc1_decode_image(
            cur, height=h, width=w, interpret=interpret)[:, :, :3]
    from texcomp.codecs import dxt, etc

    if codec == "dxt1":
        blocks = dxt.decode_dxt1_blocks(cur)
    elif codec == "dxt5":
        blocks = dxt.decode_dxt5_blocks(cur)
    else:
        blocks = etc.decode_etc1_blocks(cur)
    c = blocks.shape[-1]
    return (blocks.reshape(h // 4, w // 4, 4, 4, c)
            .transpose(0, 2, 1, 3, 4).reshape(h, w, c).astype(jnp.uint8))


def _encode_level(avg, codec, strategy, interpret):
    h, w = avg.shape[0], avg.shape[1]
    if h * w >= _SMALL_LEVEL:
        if codec == "dxt1":
            return dxt_pallas.dxt1_encode_image(avg, interpret=interpret)
        if codec == "dxt5":
            return dxt_pallas.dxt5_encode_image(avg, interpret=interpret)
        return etc_pallas.etc1_encode_image(avg, strategy,
                                            interpret=interpret)
    from texcomp.blocks import image_to_blocks
    from texcomp.codecs import dxt, etc

    blocks = image_to_blocks(avg)
    if codec == "dxt1":
        return dxt.encode_dxt1_blocks(blocks)
    if codec == "dxt5":
        return dxt.encode_dxt5_blocks(
            blocks, jnp.zeros((blocks.shape[0],), dtype=bool))
    return etc.encode_etc1_blocks(blocks, strategy)


def dxtc_mipmap_chain(data: jax.Array, *, height: int, width: int,
                      is_dxt1: bool, levels: int,
                      interpret: bool = False) -> tuple[jax.Array, ...]:
    """DXTC-only wrapper kept for the DxtcCompressor call site."""
    return mipmap_chain(data, height=height, width=width,
                        codec="dxt1" if is_dxt1 else "dxt5",
                        levels=levels, interpret=interpret)
