"""DxtcCompressor: DXT1 (RGB/BGR) and DXT5 (RGBA/BGRA).

Public behavior mirrors image_compression/public/dxtc_compressor.h:52-83 and
the dispatch logic of internal/dxtc_compressor.cc:704-855: 3-component
formats use DXT1 (8-byte blocks), 4-component formats DXT5 (16-byte blocks).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from texcomp.api import helper4x4 as h4
from texcomp.api.compressor import Compressor
from texcomp.api.container import (
    CompressedImage,
    Format,
    needs_red_and_blue_swapped,
    num_format_components,
)
from texcomp.blocks import num_blocks
from texcomp.codecs import dxt

_DXT1_BLOCK_SIZE = 8
_DXT5_BLOCK_SIZE = 16


def _bucket(n: int) -> int:
    """Pad block counts to coarse buckets to bound jit recompilation."""
    if n <= 256:
        return 256
    return 1 << (n - 1).bit_length()


def _pad_batch(blocks, outside, n_padded: int):
    n = blocks.shape[0]
    if n == n_padded:
        return blocks, outside
    blocks = jnp.pad(blocks, ((0, n_padded - n), (0, 0), (0, 0)))
    outside = np.pad(outside, (0, n_padded - n))
    return blocks, outside


def _encode_dxt1(blocks, outside, swap: bool) -> np.ndarray:
    n = blocks.shape[0]
    blocks, _ = _pad_batch(blocks, outside, _bucket(n))
    if swap:
        blocks = blocks[:, :, ::-1]
    out = dxt.encode_dxt1_blocks(blocks, always_4_color=False,
                                 swap_red_and_blue=swap)
    return np.asarray(out)[:n]


def _encode_dxt5(blocks, outside, swap: bool) -> np.ndarray:
    n = blocks.shape[0]
    blocks, outside = _pad_batch(blocks, outside, _bucket(n))
    if swap:
        blocks = jnp.concatenate([blocks[:, :, 2::-1], blocks[:, :, 3:]], axis=-1)
    out = dxt.encode_dxt5_blocks(blocks, jnp.asarray(outside),
                                 swap_red_and_blue=swap)
    return np.asarray(out)[:n]


def _decode_dxt1(data, swap: bool) -> np.ndarray:
    n = data.shape[0]
    padded = _bucket(n)
    if padded != n:
        data = np.pad(data, ((0, padded - n), (0, 0)))
    out = dxt.decode_dxt1_blocks(jnp.asarray(data))
    out = np.asarray(out)[:n]
    # DecodeColors swaps the endpoint colors before interpolation
    # (dxtc_compressor.cc:178-181); interpolation is channelwise, so swapping
    # the decoded output channels is equivalent.
    return out[:, :, ::-1] if swap else out


def _decode_dxt5(data, swap: bool) -> np.ndarray:
    n = data.shape[0]
    padded = _bucket(n)
    if padded != n:
        data = np.pad(data, ((0, padded - n), (0, 0)))
    out = dxt.decode_dxt5_blocks(jnp.asarray(data))
    out = np.asarray(out)[:n]
    if swap:
        out = np.concatenate([out[:, :, 2::-1], out[:, :, 3:]], axis=-1)
    return out


class DxtcCompressor(Compressor):
    """DXT1/DXT5 compressor (dxtc_compressor.h:52-83).

    ``quality``:
      * "reference" (default) — byte-identical to the C++ reference.
      * "high" — EXTENSION: PCA + least-squares endpoint refinement with
        true decoded-RGB error, per-block best-of vs the reference encoder
        (never worse, typically +2-4 dB); payloads remain standard DXT.
        Covers all four formats (RGB/BGR/RGBA/BGRA), encode ops only.
    """

    name = "dxtc"

    def __init__(self, quality: str = "reference"):
        if quality not in ("reference", "high"):
            raise ValueError(f"unknown quality {quality!r}")
        self._quality = quality

    def _is_dxt1(self, fmt: Format) -> bool:
        return num_format_components(fmt) == 3

    def _block_size(self, fmt: Format) -> int:
        return _DXT1_BLOCK_SIZE if self._is_dxt1(fmt) else _DXT5_BLOCK_SIZE

    def _codec_fns(self, fmt: Format):
        swap = needs_red_and_blue_swapped(fmt)
        if self._quality == "high":
            from texcomp.codecs import dxt_hq

            if self._is_dxt1(fmt):
                def enc(blocks, outside):
                    n = blocks.shape[0]
                    blocks, _ = _pad_batch(jnp.asarray(blocks), outside,
                                           _bucket(n))
                    if swap:
                        blocks = blocks[:, :, ::-1]
                    return np.asarray(
                        dxt_hq.encode_dxt1_hq_blocks(
                            blocks, swap_red_and_blue=swap))[:n]
            else:
                def enc(blocks, outside):
                    n = blocks.shape[0]
                    blocks, outside = _pad_batch(jnp.asarray(blocks),
                                                 outside, _bucket(n))
                    if swap:
                        blocks = jnp.concatenate(
                            [blocks[:, :, 2::-1], blocks[:, :, 3:]], axis=-1)
                    return np.asarray(
                        dxt_hq.encode_dxt5_hq_blocks(
                            blocks, jnp.asarray(outside),
                            swap_red_and_blue=swap))[:n]
            dec = (lambda data: _decode_dxt1(data, swap)) if self._is_dxt1(
                fmt) else (lambda data: _decode_dxt5(data, swap))
            return enc, dec
        if self._is_dxt1(fmt):
            return (
                lambda blocks, outside: _encode_dxt1(blocks, outside, swap),
                lambda data: _decode_dxt1(data, swap),
            )
        return (
            lambda blocks, outside: _encode_dxt5(blocks, outside, swap),
            lambda data: _decode_dxt5(data, swap),
        )

    # -- Compressor interface -------------------------------------------------

    def supports_format(self, fmt: Format) -> bool:
        """DXTC supports all formats (dxtc_compressor.cc:707-710)."""
        return True

    def is_valid_compressed_image(self, image: CompressedImage) -> bool:
        """dxtc_compressor.cc:712-723."""
        md = image.get_metadata()
        return (
            md.compressor_name == self.name
            and md.uncompressed_height > 0
            and md.uncompressed_width > 0
            and md.compressed_height >= md.uncompressed_height
            and md.compressed_width >= md.uncompressed_width
            and image.get_data_size()
            == self.compute_compressed_data_size(
                md.format, md.compressed_height, md.compressed_width
            )
        )

    def compute_compressed_data_size(self, fmt: Format, height: int,
                                     width: int) -> int:
        """dxtc_compressor.cc:725-733."""
        if height == 0 or width == 0:
            return 0
        return (
            max(1, num_blocks(height))
            * max(1, num_blocks(width))
            * self._block_size(fmt)
        )

    def _encode_image_fn(self, fmt: Format, force_no_swap: bool = False):
        """Fused Pallas image-level encode (TPU); None on CPU backends or
        in high-quality mode (which has its own block-level path)."""
        from texcomp.ops import use_pallas

        if not use_pallas() or self._quality == "high":
            return None
        from texcomp.ops import dxt_pallas

        swap = needs_red_and_blue_swapped(fmt) and not force_no_swap
        is_dxt1 = self._is_dxt1(fmt)

        def fn(img, height, width, grid_height, grid_width, outside):
            import jax.numpy as jnp

            gh = 4 * num_blocks(grid_height)
            gw = 4 * num_blocks(grid_width)
            return dxt_pallas.dxtc_encode_padded_image(
                jnp.asarray(img), jnp.asarray(outside), gh, gw, swap, is_dxt1
            )

        return fn

    def compress(self, fmt, height, width, padding_bytes_per_row, buffer,
                 image) -> bool:
        if buffer is None or image is None or height == 0 or width == 0:
            return False
        encode_fn, _ = self._codec_fns(fmt)
        return h4.compress(
            encode_fn, self.name, self._block_size(fmt), fmt, height, width,
            padding_bytes_per_row, buffer, image,
            encode_image_fn=self._encode_image_fn(fmt),
        )

    def _decode_image_fn(self, fmt: Format, force_no_swap: bool = False):
        """Fused Pallas image-level decode (TPU); None on CPU backends."""
        from texcomp.ops import use_pallas

        if not use_pallas():
            return None
        from texcomp.ops import dxt_pallas

        swap = needs_red_and_blue_swapped(fmt) and not force_no_swap
        is_dxt1 = self._is_dxt1(fmt)

        def fn(data, grid_height, grid_width):
            d = jnp.asarray(np.ascontiguousarray(data))
            if is_dxt1:
                return dxt_pallas.dxt1_decode_image(
                    d, height=grid_height, width=grid_width, swap=swap)
            return dxt_pallas.dxt5_decode_image(
                d, height=grid_height, width=grid_width, swap=swap)

        return fn

    def decompress(self, image, decompressed_buffer) -> bool:
        if not self.is_valid_compressed_image(image) or decompressed_buffer is None:
            return False
        fmt = image.get_metadata().format
        _, decode_fn = self._codec_fns(fmt)
        return h4.decompress(decode_fn, image, decompressed_buffer,
                             self._block_size(fmt),
                             decode_image_fn=self._decode_image_fn(fmt))

    def downsample(self, image, downsampled_image) -> bool:
        if not self.is_valid_compressed_image(image) or downsampled_image is None:
            return False
        fmt = image.get_metadata().format
        # Downsample re-encodes with swap_red_and_blue=false
        # (compressor4x4_helper.h:602-607: decode/encode called with false),
        # so the HQ re-encode path always runs swap-free regardless of the
        # source format.
        if self._quality == "high":
            enc, _ = self._codec_fns(Format.RGB if self._is_dxt1(fmt)
                                     else Format.RGBA)
            dec = (lambda data: _decode_dxt1(data, False)) if self._is_dxt1(
                fmt) else (lambda data: _decode_dxt5(data, False))
        elif self._is_dxt1(fmt):
            enc = lambda blocks, outside: _encode_dxt1(blocks, outside, False)
            dec = lambda data: _decode_dxt1(data, False)
        else:
            enc = lambda blocks, outside: _encode_dxt5(blocks, outside, False)
            dec = lambda data: _decode_dxt5(data, False)
        return h4.downsample(
            enc, dec, image, downsampled_image, self._block_size(fmt),
            downsample_image_fn=self._downsample_image_fn(fmt),
        )

    def _downsample_image_fn(self, fmt: Format):
        """One fused device program for decode -> 2x2 truncating average ->
        re-encode (ops/mipmap.mipmap_chain, levels=1); None on CPU backends
        or in high-quality mode (block-level path). Downsample re-encodes
        swap-free (compressor4x4_helper.h:602-607), matching the chain."""
        from texcomp.ops import use_pallas

        if not use_pallas() or self._quality == "high":
            return None
        from texcomp.ops.mipmap import mipmap_chain

        codec = "dxt1" if self._is_dxt1(fmt) else "dxt5"

        def fn(data, grid_height, grid_width):
            d = jnp.asarray(np.ascontiguousarray(data))
            return mipmap_chain(d, height=grid_height, width=grid_width,
                                codec=codec, levels=1)[0]

        return fn

    def downsample_chain(self, image, levels: int | None = None) -> list:
        """EXTENSION: the full mipmap chain in one call.

        Returns [level1, level2, ...] CompressedImages, byte-identical to
        repeated :meth:`downsample` calls. On TPU (reference quality,
        unswapped formats, multiple-of-4 extents) the clean prefix of the
        chain runs as ONE fused device program with no per-level host
        round trips (texcomp/ops/mipmap.py); the ragged tail (and every
        level on other configurations) uses the per-level path.
        """
        if not self.is_valid_compressed_image(image):
            return []
        fmt = image.get_metadata().format
        return h4.downsample_chain(
            self, image, levels,
            block_size=self._block_size(fmt),
            codec="dxt1" if self._is_dxt1(fmt) else "dxt5",
            fused_ok=(self._quality == "reference"
                      and not needs_red_and_blue_swapped(fmt)),
        )

    def pad(self, image, padded_height, padded_width, padded_image) -> bool:
        if not self.is_valid_compressed_image(image) or padded_image is None:
            return False
        fmt = image.get_metadata().format
        if self._is_dxt1(fmt):
            fns = (dxt.dxt1_column_pad_blocks, dxt.dxt1_row_pad_blocks,
                   dxt.dxt1_corner_pad_blocks)
        else:
            fns = (dxt.dxt5_column_pad_blocks, dxt.dxt5_row_pad_blocks,
                   dxt.dxt5_corner_pad_blocks)
        return h4.pad(*fns, image, padded_height, padded_width, padded_image,
                      self._block_size(fmt))

    def compress_and_pad(self, fmt, height, width, padded_height, padded_width,
                         padding_bytes_per_row, buffer, padded_image) -> bool:
        if buffer is None or padded_image is None or height == 0 or width == 0:
            return False
        encode_fn, _ = self._codec_fns(fmt)
        return h4.compress(
            encode_fn, self.name, self._block_size(fmt), fmt, height, width,
            padding_bytes_per_row, buffer, padded_image,
            padded_height=padded_height, padded_width=padded_width,
            encode_image_fn=self._encode_image_fn(fmt),
        )

    def create_solid_image(self, fmt, height, width, color, image) -> bool:
        """dxtc_compressor.cc:820-839: the solid block stores the quantized
        565 color twice with zero index bits; DXT5 adds equal base alphas and
        zero alpha codes. Note: no red/blue swap is applied (matching the
        reference, which passes color[0..2] straight through)."""
        if image is None:
            return False
        color = np.frombuffer(bytes(color), dtype=np.uint8) if not isinstance(
            color, np.ndarray
        ) else color
        r, g, b = int(color[0]), int(color[1]), int(color[2])
        q565 = int(
            np.asarray(
                dxt._pack565(*dxt._quantize565(jnp.int32(r), jnp.int32(g),
                                               jnp.int32(b)))
            )
        )
        dxt1 = np.array(
            [q565 & 0xFF, q565 >> 8, q565 & 0xFF, q565 >> 8, 0, 0, 0, 0],
            dtype=np.uint8,
        )
        if self._is_dxt1(fmt):
            block = dxt1
        else:
            a = int(color[3])
            block = np.concatenate(
                [np.array([a, a, 0, 0, 0, 0, 0, 0], dtype=np.uint8), dxt1]
            )
        return h4.create_solid_image(self.name, fmt, height, width, block, image)

    def copy_subimage(self, image, start_row, start_column, height, width,
                      subimage) -> bool:
        if not self.is_valid_compressed_image(image) or subimage is None:
            return False
        fmt = image.get_metadata().format
        return h4.copy_subimage(image, start_row, start_column, height, width,
                                subimage, self._block_size(fmt))
