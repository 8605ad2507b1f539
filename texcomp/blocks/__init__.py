"""Block engine: batched 4x4 block gather/scatter and grid geometry.

TPU-native replacement for the reference's serial block iteration
(image_compression/internal/compressor4x4_helper.h:175-262, pixel4x4.{h,cc}):
instead of looping block-by-block, a whole image is turned into
structure-of-arrays tensors of shape (num_blocks, 16) per channel in one
pad+reshape, and codecs map over the block axis.
"""

from texcomp.blocks.grid import (
    extract_blocks,
    full_outside_mask,
    blocks_from_packed_words,
    image_to_blocks,
    num_blocks,
    scatter_blocks,
)

__all__ = ["blocks_from_packed_words", "extract_blocks",
           "full_outside_mask", "image_to_blocks", "num_blocks",
           "scatter_blocks"]
