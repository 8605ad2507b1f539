"""Batched block gather/scatter.

The reference gathers one 4x4 window at a time into a ``Pixel4x4`` with
clamp-to-edge replication for windows overhanging the image
(pixel4x4.cc:23-59), inside a serial double loop
(compressor4x4_helper.h:202-214). Here the whole image is padded once with
edge replication and reshaped to a (num_blocks, 16) block batch — the same
pixels in the same scan order, produced in one XLA op pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def num_blocks(num_pixels: int) -> int:
    """Blocks needed to cover num_pixels (compressor4x4_helper.h:86-88)."""
    return (int(num_pixels) + 3) // 4


@partial(jax.jit, static_argnames=("height", "width", "grid_height", "grid_width"))
def extract_blocks(
    image: jax.Array,
    *,
    height: int,
    width: int,
    grid_height: int | None = None,
    grid_width: int | None = None,
) -> jax.Array:
    """Gather an image into a batch of 4x4 blocks.

    Args:
      image: (height, width, C) uint8 array, C in {3, 4}.
      height, width: the valid image extent (static).
      grid_height, grid_width: pixel extent of the block grid; defaults to
        the image extent rounded up to multiples of 4. Passing a larger grid
        reproduces CompressAndPad's encode-over-the-padded-grid behavior
        (compressor4x4_helper.h:479-520), where blocks fully outside the
        image replicate the nearest edge/corner pixel.

    Returns:
      (num_block_rows * num_block_cols, 16, C) int32, blocks in row-major
      order, pixels within a block in row-major order (y*4 + x) — matching
      the reference's scan order (pixel4x4.h:54-61).
    """
    gh = 4 * num_blocks(grid_height if grid_height is not None else height)
    gw = 4 * num_blocks(grid_width if grid_width is not None else width)
    c = image.shape[-1]
    img = image[:height, :width].astype(jnp.int32)
    # Edge replication == Pixel4x4's min(row+y, height-1)/min(col+x, width-1)
    # clamping (pixel4x4.cc:44-53).
    img = jnp.pad(img, ((0, gh - height), (0, gw - width), (0, 0)), mode="edge")
    blocks = img.reshape(gh // 4, 4, gw // 4, 4, c)
    blocks = blocks.transpose(0, 2, 1, 3, 4)  # (br, bc, y, x, C)
    return blocks.reshape(-1, 16, c)


def image_to_blocks(image: jax.Array) -> jax.Array:
    """(H, W, C) uint8 -> (N, 16, C) int32 for ALIGNED images (H and W
    multiples of 4): the zero-padding fast path used by batched/sharded
    pipelines. Ragged sizes go through :func:`extract_blocks`.

    Device-path callers should prefer pack_rgb_image/pack_rgba_image +
    :func:`blocks_from_packed_words`: XLA lowers this 5-D int32 transpose
    (minor dims (4, 4, C)) as a generic element-wise transpose — ~8-18 ms
    fused into the HQ encoders at 1024^2 vs ~0.3 ms for the packed-word
    route (tools/profile_etc_hq_scale.py)."""
    h, w, c = image.shape
    blk = image.astype(jnp.int32).reshape(h // 4, 4, w // 4, 4, c)
    return blk.transpose(0, 2, 1, 3, 4).reshape(-1, 16, c)


def blocks_from_packed_words(words: jax.Array, channels: int) -> jax.Array:
    """(16, N) uint32 packed pixel words (pack_rgb_image/pack_rgba_image
    layout: pixel y*4+x on sublanes, blocks row-major on lanes) ->
    (N, 16, C) int32 blocks, byte-identical to :func:`image_to_blocks` on
    the packing's source image. 32-bit lane math only: one 2-D u32
    transpose + byte unpack instead of the slow generic 5-D transpose."""
    wt = words.T  # (N, 16) uint32 — fast 32-bit transpose
    chs = [((wt >> jnp.uint32(8 * c)) & jnp.uint32(255)).astype(jnp.int32)
           for c in range(channels)]
    return jnp.stack(chs, axis=-1)


def full_outside_mask(
    height: int, width: int, grid_height: int, grid_width: int
) -> np.ndarray:
    """Per-block ``has_one_pixel`` flag (pixel4x4.cc:56-58): True iff the
    block's 4x4 window lies fully outside the valid image in BOTH dimensions,
    i.e. every gathered pixel is the replicated bottom-right corner pixel.

    Returns (num_block_rows * num_block_cols,) bool, row-major block order.
    """
    nbr = num_blocks(grid_height)
    nbc = num_blocks(grid_width)
    row_out = (np.arange(nbr) * 4) >= height
    col_out = (np.arange(nbc) * 4) >= width
    return (row_out[:, None] & col_out[None, :]).reshape(-1)


@partial(jax.jit, static_argnames=("height", "width"))
def scatter_blocks(blocks: jax.Array, *, height: int, width: int) -> jax.Array:
    """Inverse of :func:`extract_blocks`: write a block batch into an image,
    clipping blocks that overhang the uncompressed extent — the decode
    write-back of compressor4x4_helper.h:241-259.

    Args:
      blocks: (num_block_rows * num_block_cols, 16, C) int32.
      height, width: the uncompressed image extent to produce. The block
        grid is inferred from the block count and must equal
        num_blocks(height) x num_blocks(width).

    Returns:
      (height, width, C) uint8.
    """
    nbr = num_blocks(height)
    nbc = num_blocks(width)
    c = blocks.shape[-1]
    img = blocks.reshape(nbr, nbc, 4, 4, c).transpose(0, 2, 1, 3, 4)
    img = img.reshape(nbr * 4, nbc * 4, c)
    return img[:height, :width].astype(jnp.uint8)
