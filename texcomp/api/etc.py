"""EtcCompressor: ETC1 (RGB only).

Public behavior mirrors image_compression/public/etc_compressor.h:53-109 and
internal/etc_compressor.cc:706-824: RGB-only, 8-byte (uint64) blocks, a
per-instance compression strategy knob (the reference's only runtime config,
etc_compressor.h:71-76, default kSmallerError).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from texcomp.api import helper4x4 as h4
from texcomp.api.compressor import Compressor
from texcomp.api.container import CompressedImage, Format
from texcomp.blocks import num_blocks
from texcomp.codecs import etc

_BLOCK_SIZE = 8


class CompressionStrategy(enum.IntEnum):
    """ETC encode strategies (etc_compressor.h:57-66)."""

    SPLIT_HORIZONTALLY = etc.SPLIT_HORIZONTALLY
    SPLIT_VERTICALLY = etc.SPLIT_VERTICALLY
    SMALLER_ERROR = etc.SMALLER_ERROR
    HEURISTIC = etc.HEURISTIC


def _bucket(n: int) -> int:
    if n <= 256:
        return 256
    return 1 << (n - 1).bit_length()


def _encode(blocks, strategy: int, quality: str = "reference") -> np.ndarray:
    n = blocks.shape[0]
    padded = _bucket(n)
    if padded != n:
        blocks = jnp.pad(blocks, ((0, padded - n), (0, 0), (0, 0)))
    if quality == "high":
        return np.asarray(etc.encode_etc1_hq_blocks(blocks))[:n]
    return np.asarray(etc.encode_etc1_blocks(blocks, strategy))[:n]


def _decode(data) -> np.ndarray:
    n = data.shape[0]
    padded = _bucket(n)
    if padded != n:
        data = np.pad(data, ((0, padded - n), (0, 0)))
    return np.asarray(etc.decode_etc1_blocks(jnp.asarray(data)))[:n]


class EtcCompressor(Compressor):
    """ETC1 compressor (etc_compressor.h:53-109).

    ``quality``:
      * "reference" (default) — byte-identical to the C++ reference under
        the selected strategy.
      * "high" — EXTENSION: evaluates truncated and round-exact base-color
        quantization for both flips, a ±1 code-point neighborhood, and
        alternating least-squares base refits, all through the exhaustive
        codeword search, keeping the minimum true-error encoding (provably
        never worse than the reference's kSmallerError). Payloads remain
        standard ETC1.
    """

    name = "etc"

    def __init__(
        self, strategy: CompressionStrategy = CompressionStrategy.SMALLER_ERROR,
        quality: str = "reference",
    ):
        if quality not in ("reference", "high"):
            raise ValueError(f"unknown quality {quality!r}")
        self._strategy = int(strategy)
        self._quality = quality

    def set_compression_strategy(self, strategy: CompressionStrategy) -> None:
        """etc_compressor.h:71-76."""
        self._strategy = int(strategy)

    def get_compression_strategy(self) -> CompressionStrategy:
        return CompressionStrategy(self._strategy)

    # -- Compressor interface --------------------------------------------------

    def supports_format(self, fmt: Format) -> bool:
        """ETC is RGB-only (etc_compressor.cc:713-717)."""
        return fmt == Format.RGB

    def is_valid_compressed_image(self, image: CompressedImage) -> bool:
        """etc_compressor.cc:719-732."""
        md = image.get_metadata()
        return (
            md.format == Format.RGB
            and md.compressor_name == self.name
            and md.uncompressed_height > 0
            and md.uncompressed_width > 0
            and md.compressed_height >= md.uncompressed_height
            and md.compressed_width >= md.uncompressed_width
            and image.get_data_size()
            == num_blocks(md.compressed_height)
            * num_blocks(md.compressed_width)
            * _BLOCK_SIZE
        )

    def compute_compressed_data_size(self, fmt, height, width) -> int:
        """etc_compressor.cc:734-745."""
        if height == 0 or width == 0:
            return 0
        if fmt != Format.RGB:
            return 0
        return (
            max(1, num_blocks(height)) * max(1, num_blocks(width)) * _BLOCK_SIZE
        )

    def _encode_image_fn(self):
        from texcomp.ops import use_pallas

        if not use_pallas() or self._quality == "high":
            return None
        from texcomp.ops import etc_pallas

        strategy = self._strategy

        def fn(img, height, width, grid_height, grid_width, outside):
            import jax.numpy as jnp

            gh = 4 * num_blocks(grid_height)
            gw = 4 * num_blocks(grid_width)
            return etc_pallas.etc1_encode_padded_image(
                jnp.asarray(img), gh, gw, strategy
            )

        return fn

    def _decode_image_fn(self):
        from texcomp.ops import use_pallas

        if not use_pallas():
            return None
        from texcomp.ops import etc_pallas

        def fn(data, grid_height, grid_width):
            import jax.numpy as jnp
            import numpy as np

            d = jnp.asarray(np.ascontiguousarray(data))
            return etc_pallas.etc1_decode_image(
                d, height=grid_height, width=grid_width
            )

        return fn

    def compress(self, fmt, height, width, padding_bytes_per_row, buffer,
                 image) -> bool:
        if (buffer is None or image is None or height == 0 or width == 0
                or fmt != Format.RGB):
            return False
        strategy = self._strategy
        quality = self._quality
        return h4.compress(
            lambda blocks, outside: _encode(blocks, strategy, quality),
            self.name, _BLOCK_SIZE, fmt, height, width,
            padding_bytes_per_row, buffer, image,
            encode_image_fn=self._encode_image_fn(),
        )

    def decompress(self, image, decompressed_buffer) -> bool:
        if not self.is_valid_compressed_image(image) or decompressed_buffer is None:
            return False
        return h4.decompress(lambda data: _decode(data), image,
                             decompressed_buffer, _BLOCK_SIZE,
                             decode_image_fn=self._decode_image_fn())

    def downsample(self, image, downsampled_image) -> bool:
        if not self.is_valid_compressed_image(image) or downsampled_image is None:
            return False
        strategy = self._strategy
        quality = self._quality
        return h4.downsample(
            lambda blocks, outside: _encode(blocks, strategy, quality),
            lambda data: _decode(data),
            image, downsampled_image, _BLOCK_SIZE,
            downsample_image_fn=self._downsample_image_fn(),
        )

    def _downsample_image_fn(self):
        """One fused device program for decode -> 2x2 truncating average ->
        re-encode (ops/mipmap.mipmap_chain, levels=1); None on CPU backends
        or in high-quality mode (block-level path)."""
        from texcomp.ops import use_pallas

        if not use_pallas() or self._quality == "high":
            return None
        from texcomp.ops.mipmap import mipmap_chain

        strategy = self._strategy

        def fn(data, grid_height, grid_width):
            d = jnp.asarray(np.ascontiguousarray(data))
            return mipmap_chain(d, height=grid_height, width=grid_width,
                                codec="etc1", strategy=strategy,
                                levels=1)[0]

        return fn

    def downsample_chain(self, image, levels: int | None = None) -> list:
        """EXTENSION: the full mipmap chain in one call — byte-identical to
        repeated :meth:`downsample`; on TPU (reference quality, /8-aligned
        extents) the clean prefix runs as one fused device program (see
        texcomp/ops/mipmap.py and DxtcCompressor.downsample_chain)."""
        return h4.downsample_chain(
            self, image, levels,
            block_size=_BLOCK_SIZE, codec="etc1", strategy=self._strategy,
            fused_ok=(self._quality == "reference"),
        )

    def pad(self, image, padded_height, padded_width, padded_image) -> bool:
        if not self.is_valid_compressed_image(image) or padded_image is None:
            return False
        strategy = self._strategy
        return h4.pad(
            lambda d: etc.etc_column_pad_blocks(d, strategy),
            lambda d: etc.etc_row_pad_blocks(d, strategy),
            etc.etc_corner_pad_blocks,
            image, padded_height, padded_width, padded_image, _BLOCK_SIZE,
        )

    def compress_and_pad(self, fmt, height, width, padded_height, padded_width,
                         padding_bytes_per_row, buffer, padded_image) -> bool:
        if (buffer is None or padded_image is None or height == 0 or width == 0
                or fmt != Format.RGB):
            return False
        strategy = self._strategy
        quality = self._quality
        return h4.compress(
            lambda blocks, outside: _encode(blocks, strategy, quality),
            self.name, _BLOCK_SIZE, fmt, height, width,
            padding_bytes_per_row, buffer, padded_image,
            padded_height=padded_height, padded_width=padded_width,
            encode_image_fn=self._encode_image_fn(),
        )

    def create_solid_image(self, fmt, height, width, color, image) -> bool:
        """etc_compressor.cc:802-813."""
        if image is None or fmt != Format.RGB:
            return False
        color = np.frombuffer(bytes(color), dtype=np.uint8) if not isinstance(
            color, np.ndarray
        ) else color
        block = etc.create_solid_block_bytes(int(color[0]), int(color[1]),
                                             int(color[2]))
        return h4.create_solid_image(self.name, fmt, height, width, block,
                                     image)

    def copy_subimage(self, image, start_row, start_column, height, width,
                      subimage) -> bool:
        if not self.is_valid_compressed_image(image) or subimage is None:
            return False
        return h4.copy_subimage(image, start_row, start_column, height, width,
                                subimage, _BLOCK_SIZE)
