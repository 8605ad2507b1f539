"""Shared grid-level operations for 4x4-block codecs (DXTC, ETC).

TPU-native rebuild of Compressor4x4Helper (image_compression/internal/
compressor4x4_helper.h:81-640): instead of per-block serial loops, each
operation is one batched device call (codec kernels over a (N, 16, C) block
tensor) plus host-side block-grid bookkeeping (numpy byte ops for
pad/copy/solid, which are pure memcpy-shuffles in the reference too).

Codec adapters plug in via two callables:

  encode_fn(blocks, full_outside) -> (N, block_size) uint8
      blocks: (N, 16, C) int32 device array (channels pre-swapped for BGR*)
      full_outside: (N,) bool numpy has_one_pixel flags
  decode_fn(data) -> (N, 16, C) int32 device array
      data: (N, block_size) uint8
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from texcomp.api.container import (
    CompressedImage,
    Format,
    Metadata,
    num_format_components,
)
from texcomp.blocks import (
    extract_blocks,
    full_outside_mask,
    num_blocks,
    scatter_blocks,
)

EncodeFn = Callable[[np.ndarray, np.ndarray], np.ndarray]
DecodeFn = Callable[[np.ndarray], np.ndarray]


def setup_compressed_image(
    image: CompressedImage,
    compressor_name: str,
    block_size: int,
    fmt: Format,
    height: int,
    width: int,
    padding_bytes_per_row: int,
) -> bool:
    """SetUpCompressedImage (compressor4x4_helper.cc:22-43)."""
    nbr = num_blocks(height)
    nbc = num_blocks(width)
    data_size = nbr * nbc * block_size
    metadata = Metadata(
        format=fmt,
        compressor_name=compressor_name,
        uncompressed_height=height,
        uncompressed_width=width,
        compressed_height=4 * nbr,
        compressed_width=4 * nbc,
        padding_bytes_per_row=padding_bytes_per_row,
    )
    if image.owns_data():
        image.create_owned_data(metadata, data_size)
    else:
        if image.get_data_size() != data_size:
            return False
        image.set_metadata(metadata)
    return True


def downsample_chain_tail(compressor, cur: CompressedImage,
                          results: list, levels: int | None) -> list:
    """Extend ``results`` with repeated compressor.downsample() calls until
    ``levels`` are collected, downsample fails, or a 1x1 level is reached
    (a 1x1 image downsamples to itself forever). Shared by the
    downsample_chain extensions."""
    while levels is None or len(results) < levels:
        cm = cur.get_metadata()
        if max(cm.uncompressed_height, cm.uncompressed_width) <= 1:
            break
        nxt = CompressedImage()
        if not compressor.downsample(cur, nxt):
            break
        results.append(nxt)
        cur = nxt
    return results


def downsample_chain(compressor, image: CompressedImage, levels: int | None,
                     *, block_size: int, codec: str, strategy: int = 2,
                     fused_ok: bool = True) -> list:
    """Shared mipmap-chain driver (DxtcCompressor / EtcCompressor
    ``downsample_chain`` extensions): run the clean chain prefix as ONE
    fused device program (texcomp/ops/mipmap.py) when the backend and
    ``fused_ok`` gate allow it, then finish with per-level downsample."""
    if not compressor.is_valid_compressed_image(image):
        return []
    from texcomp.ops import use_pallas

    md = image.get_metadata()
    h, w = md.uncompressed_height, md.uncompressed_width
    results: list[CompressedImage] = []

    fused = 0
    if fused_ok and use_pallas() and h % 4 == 0 and w % 4 == 0:
        from texcomp.ops.mipmap import mipmap_chain, num_chain_levels

        fused = num_chain_levels(h, w)
        if levels is not None:
            fused = min(fused, levels)
    if fused > 0:
        import jax.numpy as jnp

        # Sequential block reads over the uncompressed grid: a padded
        # payload contributes only its first nbr*nbc blocks (same
        # convention as decompress; compressor4x4_helper.h:298-311).
        nblk = num_blocks(h) * num_blocks(w)
        data = jnp.asarray(
            np.ascontiguousarray(image.get_data())
            .reshape(-1, block_size)[:nblk])
        payloads = mipmap_chain(data, height=h, width=w, codec=codec,
                                levels=fused, strategy=strategy)
        lh, lw = h, w
        for p in payloads:
            lh //= 2
            lw //= 2
            ci = CompressedImage()
            if not setup_compressed_image(
                    ci, compressor.name, block_size, md.format, lh, lw, 0):
                return results
            ci.get_mutable_data()[:] = np.asarray(p).reshape(-1)
            results.append(ci)

    return downsample_chain_tail(
        compressor, results[-1] if results else image, results, levels)


def buffer_to_image_array(
    buffer, height: int, width: int, components: int, padding_bytes_per_row: int
) -> np.ndarray:
    """View a row-padded interleaved byte buffer as an (H, W, C) uint8 array
    (the input contract of compressor.h:19-26 / pixel4x4.h:45-67)."""
    flat = np.frombuffer(buffer, dtype=np.uint8) if not isinstance(
        buffer, np.ndarray
    ) else buffer.reshape(-1).view(np.uint8)
    bpr = width * components + padding_bytes_per_row
    needed = (height - 1) * bpr + width * components
    if flat.size < needed:
        raise ValueError(
            f"buffer has {flat.size} bytes; need {needed} for "
            f"{height}x{width}x{components} (+{padding_bytes_per_row}/row)"
        )
    rows = np.lib.stride_tricks.as_strided(
        flat, shape=(height, width * components), strides=(bpr, 1)
    )
    return rows.reshape(height, width, components)


def image_array_to_buffer(
    image: np.ndarray, padding_bytes_per_row: int
) -> np.ndarray:
    """(H, W, C) uint8 -> flat byte buffer with per-row padding (zeros in the
    padding gap). Size is (H-1)*stride + W*C: rows at the padded stride, with
    no trailing padding after the final row.

    Note: the reference's Decompress sizes its output H*W*C but writes rows
    at the padded stride (compressor4x4_helper.h:225-226 vs :238-239,
    color_util.h:455-466), which overflows for padding > 0; we size the
    buffer correctly instead. For padding == 0 (the only well-defined case)
    the bytes are identical.
    """
    from texcomp import native

    h, w, c = image.shape
    if padding_bytes_per_row == 0:
        return image.reshape(-1).copy()
    bpr = w * c + padding_bytes_per_row
    return native.strided_copy_rows(
        image, rows=h, row_bytes=w * c, src_stride=w * c, dst_stride=bpr,
        dst_size=(h - 1) * bpr + w * c,
    )


def _grid_view(image: CompressedImage, block_size: int) -> np.ndarray:
    """View a compressed payload as (num_block_rows, num_block_cols,
    block_size) using the *compressed* dimensions."""
    md = image.get_metadata()
    nbr = num_blocks(md.compressed_height)
    nbc = num_blocks(md.compressed_width)
    return image.get_mutable_data().reshape(nbr, nbc, block_size)


# ---------------------------------------------------------------------------
# Operations
# ---------------------------------------------------------------------------


def compress(
    encode_fn: EncodeFn,
    compressor_name: str,
    block_size: int,
    fmt: Format,
    height: int,
    width: int,
    padding_bytes_per_row: int,
    buffer,
    image: CompressedImage,
    *,
    padded_height: int = 0,
    padded_width: int = 0,
    encode_image_fn=None,
) -> bool:
    """Compress (+ optionally pad) an image in one batched encode.

    Covers both Compressor4x4Helper::Compress (compressor4x4_helper.h:175-216)
    and ::CompressAndPad (:479-520) — the fused variant simply encodes over a
    larger block grid, with overhanging blocks replicating edge pixels and
    fully-outside blocks flagged has_one_pixel.
    """
    final_height = max(height, padded_height)
    final_width = max(width, padded_width)
    if not setup_compressed_image(
        image, compressor_name, block_size, fmt, final_height, final_width,
        padding_bytes_per_row,
    ):
        return False

    components = num_format_components(fmt)
    img = buffer_to_image_array(
        buffer, height, width, components, padding_bytes_per_row
    )
    outside = full_outside_mask(height, width, final_height, final_width)
    if encode_image_fn is not None:
        # Fused image-level path (Pallas on TPU): extraction + encode in one
        # device pipeline.
        encoded = np.asarray(
            encode_image_fn(img, height, width, final_height, final_width,
                            outside)
        )
    else:
        blocks = extract_blocks(
            img, height=height, width=width,
            grid_height=final_height, grid_width=final_width,
        )
        encoded = np.asarray(encode_fn(blocks, outside))
    image.get_mutable_data()[:] = encoded.reshape(-1)
    return True


def decompress(
    decode_fn: DecodeFn,
    image: CompressedImage,
    decompressed_buffer: bytearray,
    block_size: int,
    decode_image_fn=None,
) -> bool:
    """Compressor4x4Helper::Decompress (compressor4x4_helper.h:218-262):
    batched block decode + clipped scatter into the uncompressed extent.

    The reference reads blocks *sequentially* over the uncompressed block
    grid (:241-245, `*block++`), so when the payload covers a larger
    (padded) grid, only the first nbr*nbc blocks are consumed — replicated
    here by slicing the flat block stream, not the 2-D grid.
    """
    md = image.get_metadata()
    components = num_format_components(md.format)
    nbr = num_blocks(md.uncompressed_height)
    nbc = num_blocks(md.uncompressed_width)
    data = image.get_data().reshape(-1, block_size)[: nbr * nbc]
    if decode_image_fn is not None:
        # Fused device path: blocks -> (4nbr, 4nbc, C') image; crop/strip.
        out_img = np.asarray(decode_image_fn(data, 4 * nbr, 4 * nbc))
        out_img = out_img[: md.uncompressed_height, : md.uncompressed_width,
                          :components]
    else:
        pixels = decode_fn(data)
        out_img = np.asarray(
            scatter_blocks(
                pixels, height=md.uncompressed_height,
                width=md.uncompressed_width,
            )
        )
    out = image_array_to_buffer(np.ascontiguousarray(out_img),
                                md.padding_bytes_per_row)
    decompressed_buffer[:] = out.tobytes()
    return True


def downsample(
    encode_fn: EncodeFn,
    decode_fn: DecodeFn,
    image: CompressedImage,
    downsampled_image: CompressedImage,
    block_size: int,
    downsample_image_fn=None,
) -> bool:
    """Compressor4x4Helper::Downsample (compressor4x4_helper.h:264-391).

    Batched as: decode the full block grid to an image, 2x2 truncating
    average, tile where a dimension has a single block (the reference stores
    each downsampled 2x2 at two positions, :357-379 and :618-633), then
    re-encode the half-size block grid.
    """
    md = image.get_metadata()
    nbr = num_blocks(md.uncompressed_height)
    nbc = num_blocks(md.uncompressed_width)
    # Even block counts required except the single-block special case
    # (compressor4x4_helper.h:281-284).
    if (nbr > 1 and nbr % 2 != 0) or (nbc > 1 and nbc % 2 != 0):
        return False

    orig_height = md.uncompressed_height
    orig_width = md.uncompressed_width
    down_height = (orig_height + 1) // 2
    down_width = (orig_width + 1) // 2
    if not setup_compressed_image(
        downsampled_image, md.compressor_name, block_size, md.format,
        down_height, down_width, 0,
    ):
        return False

    # Sequential block reads over the uncompressed grid (the reference
    # indexes orig_blocks with num_orig_block_cols strides regardless of
    # the payload's actual grid, compressor4x4_helper.h:296-311): a padded
    # payload contributes only its first nbr*nbc blocks, same convention
    # as decompress above.
    data = image.get_data().reshape(-1, block_size)[: nbr * nbc]
    if downsample_image_fn is not None and nbr > 1 and nbc > 1:
        # Device fast path (common case of even multi-block grids):
        # decode -> 2x2 truncating average -> re-encode fused into ONE
        # device program (ops/mipmap.mipmap_chain, levels=1) — no host
        # averaging hop between two separate device dispatches.
        encoded = np.asarray(downsample_image_fn(data, 4 * nbr, 4 * nbc))
        downsampled_image.get_mutable_data()[:] = encoded.reshape(-1)
        return True

    pixels = np.asarray(decode_fn(data))  # (N, 16, C)
    c = pixels.shape[-1]
    img = (
        pixels.reshape(nbr, nbc, 4, 4, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(nbr * 4, nbc * 4, c)
        .astype(np.int64)
    )

    if nbr == 1 and nbc == 1:
        # Single-block case (compressor4x4_helper.h:344-388): a 3-pixel
        # dimension cannot be downsampled; 1- and 2-pixel dimensions
        # replicate before averaging.
        if orig_height == 3 or orig_width == 3:
            return False
        if orig_width == 1:
            img[:, 1:4] = img[:, 0:1]
        elif orig_width == 2:
            img[:, 2:4] = img[:, 0:2]
        if orig_height == 1:
            img[1:4, :] = img[0:1, :]
        elif orig_height == 2:
            img[2:4, :] = img[0:2, :]

    # 2x2 truncating average (color_util.h:335-380).
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    avg = img.reshape(h2, 2, w2, 2, c).sum(axis=(1, 3)) // 4

    # Tile to fill 4x4 blocks where a grid dimension had one block: the
    # downsampled 2x2 is stored at two block positions in the reference
    # (DownsampleBlocks2x1/1x2, compressor4x4_helper.h:610-636, and the
    # quadrant loop :382-387).
    if avg.shape[1] < 4:
        avg = np.tile(avg, (1, 4 // avg.shape[1], 1))
    if avg.shape[0] < 4:
        avg = np.tile(avg, (4 // avg.shape[0], 1, 1))

    gh, gw = avg.shape[0], avg.shape[1]
    dblocks = (
        avg.reshape(gh // 4, 4, gw // 4, 4, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, 16, c)
        .astype(np.int32)
    )
    outside = np.zeros(dblocks.shape[0], dtype=bool)
    encoded = np.asarray(encode_fn(dblocks, outside))
    downsampled_image.get_mutable_data()[:] = encoded.reshape(-1)
    return True


def pad(
    column_pad_fn: Callable[[np.ndarray], np.ndarray],
    row_pad_fn: Callable[[np.ndarray], np.ndarray],
    corner_pad_fn: Callable[[np.ndarray], np.ndarray],
    image: CompressedImage,
    padded_height: int,
    padded_width: int,
    padded_image: CompressedImage,
    block_size: int,
) -> bool:
    """Compressor4x4Helper::Pad (compressor4x4_helper.h:393-477).

    The pad functors are batched: they map (M, block_size) uint8 arrays of
    last-column / last-row / corner blocks to their pad blocks.
    """
    md = image.get_metadata()
    if md.compressed_height >= padded_height and md.compressed_width >= padded_width:
        padded_image.duplicate(image)
        return True

    if not setup_compressed_image(
        padded_image, md.compressor_name, block_size, md.format,
        padded_height, padded_width, 0,
    ):
        return False

    from texcomp import native

    orig = _grid_view(image, block_size)
    out = _grid_view(padded_image, block_size)
    nbr, nbc = orig.shape[0], orig.shape[1]
    pbr, pbc = out.shape[0], out.shape[1]

    # Pad blocks are codec math (device/bit ops); grid assembly is the
    # native host runtime's job.
    col_pad = (column_pad_fn(orig[:, nbc - 1]) if nbc < pbc
               else np.zeros((nbr, block_size), np.uint8))
    if nbr < pbr:
        row_pad = row_pad_fn(orig[nbr - 1])
        corner = (corner_pad_fn(orig[nbr - 1 : nbr, nbc - 1])[0]
                  if nbc < pbc else np.zeros(block_size, np.uint8))
    else:
        row_pad = np.zeros((nbc, block_size), np.uint8)
        corner = np.zeros(block_size, np.uint8)
    out[:] = native.pad_block_grid(orig, pbr, pbc, col_pad, row_pad, corner)
    return True


def create_solid_image(
    compressor_name: str,
    fmt: Format,
    height: int,
    width: int,
    block_bytes: np.ndarray,
    image: CompressedImage,
) -> bool:
    """Compressor4x4Helper::CreateSolidImage (compressor4x4_helper.h:522-543)."""
    from texcomp import native

    block_size = int(block_bytes.size)
    if not setup_compressed_image(
        image, compressor_name, block_size, fmt, height, width, 0
    ):
        return False
    data = image.get_mutable_data()
    n = data.size // block_size
    data.reshape(-1, block_size)[:] = native.fill_blocks(n, block_bytes)
    return True


def copy_subimage(
    image: CompressedImage,
    start_row: int,
    start_column: int,
    height: int,
    width: int,
    subimage: CompressedImage,
    block_size: int,
) -> bool:
    """Compressor4x4Helper::CopySubimage (compressor4x4_helper.h:545-592)."""
    md = image.get_metadata()
    if (
        start_row % 4 != 0
        or start_column % 4 != 0
        or height % 4 != 0
        or width % 4 != 0
        or start_row > md.compressed_height
        or start_column > md.compressed_width
        or start_row + height > md.compressed_height
        or start_column + width > md.compressed_width
    ):
        return False
    if not setup_compressed_image(
        subimage, md.compressor_name, block_size, md.format, height, width, 0
    ):
        return False
    from texcomp import native

    orig = _grid_view(image, block_size)
    sub = _grid_view(subimage, block_size)
    r0 = num_blocks(start_row)
    c0 = num_blocks(start_column)
    sub[:] = native.copy_subgrid(orig, r0, c0, sub.shape[0], sub.shape[1])
    return True
