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
    pipelines. Ragged sizes go through :func:`extract_blocks`."""
    h, w, c = image.shape
    blk = image.astype(jnp.int32).reshape(h // 4, 4, w // 4, 4, c)
    return blk.transpose(0, 2, 1, 3, 4).reshape(-1, 16, c)


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
