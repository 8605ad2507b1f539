"""Block gather/scatter semantics vs Pixel4x4 / Compressor4x4Helper."""

import numpy as np

from texcomp.blocks import (
    extract_blocks,
    full_outside_mask,
    num_blocks,
    scatter_blocks,
)


def test_num_blocks():
    """(n+3)/4 (compressor4x4_helper.h:86-88)."""
    assert [num_blocks(n) for n in [0, 1, 3, 4, 5, 8, 9]] == [0, 1, 1, 1, 2, 2, 3]


def test_extract_edge_replication(rng):
    """Overhanging windows replicate edge pixels (pixel4x4.cc:23-59)."""
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    blocks = np.asarray(extract_blocks(img, height=5, width=6))
    assert blocks.shape == (2 * 2, 16, 3)
    # Block (1,1) covers rows 4-7, cols 4-7; rows 5-7 replicate row 4,
    # cols 6-7 replicate col 5.
    b = blocks[3].reshape(4, 4, 3)
    np.testing.assert_array_equal(b[0, 0], img[4, 4])
    np.testing.assert_array_equal(b[0, 2], img[4, 5])  # col 6 -> col 5
    np.testing.assert_array_equal(b[0, 3], img[4, 5])
    np.testing.assert_array_equal(b[2, 1], img[4, 5 - 0])  # row 6 -> row 4; col5
    np.testing.assert_array_equal(b[3, 3], img[4, 5])  # corner


def test_extract_pixel_scan_order(rng):
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    blocks = np.asarray(extract_blocks(img, height=8, width=8))
    # Pixel (y, x) of block (br, bc) is img[4br+y, 4bc+x] (pixel4x4.h:54-61).
    for br in range(2):
        for bc in range(2):
            blk = blocks[br * 2 + bc].reshape(4, 4, 3)
            np.testing.assert_array_equal(
                blk, img[4 * br : 4 * br + 4, 4 * bc : 4 * bc + 4]
            )


def test_full_outside_mask():
    """has_one_pixel iff fully outside in BOTH dims (pixel4x4.cc:56-58)."""
    m = full_outside_mask(5, 6, 12, 12)  # 3x3 block grid over 5x6 image
    m = m.reshape(3, 3)
    expected = np.zeros((3, 3), dtype=bool)
    expected[2, 2] = True  # rows 8-11 >= 5 and cols 8-11 >= 6
    # block (2,1): rows outside, cols 4-7 overlap width 6 -> not flagged
    np.testing.assert_array_equal(m, expected)


def test_scatter_roundtrip(rng):
    img = rng.integers(0, 256, size=(13, 9, 4), dtype=np.uint8)
    blocks = extract_blocks(img, height=13, width=9)
    out = np.asarray(scatter_blocks(blocks, height=13, width=9))
    np.testing.assert_array_equal(out, img)


def test_extract_larger_grid_for_compress_and_pad(rng):
    """Blocks beyond the image replicate the corner (CompressAndPad path)."""
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    blocks = np.asarray(
        extract_blocks(img, height=4, width=4, grid_height=8, grid_width=8)
    )
    assert blocks.shape == (4, 16, 3)
    corner = img[3, 3]
    np.testing.assert_array_equal(
        blocks[3], np.tile(corner, (16, 1))
    )  # block (1,1) is all corner pixel
    # block (0,1): each row y replicates img[y, 3]
    b01 = blocks[1].reshape(4, 4, 3)
    for y in range(4):
        np.testing.assert_array_equal(b01[y], np.tile(img[y, 3], (4, 1)))
