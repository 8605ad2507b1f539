"""EtcCompressor: ETC1 (RGB only).

Mirrors image_compression/public/etc_compressor.h:53-109. Full
implementation lands with the ETC codec kernels.
"""

from __future__ import annotations

import enum

from texcomp.api.compressor import Compressor
from texcomp.api.container import CompressedImage, Format


class CompressionStrategy(enum.IntEnum):
    """ETC encode strategies (etc_compressor.h:57-66)."""

    SPLIT_HORIZONTALLY = 0  # flipped subblocks only
    SPLIT_VERTICALLY = 1  # unflipped subblocks only
    SMALLER_ERROR = 2  # try both, keep the smaller error (default)
    HEURISTIC = 3  # pick split direction + codeword by heuristic


class EtcCompressor(Compressor):
    """Placeholder; full ETC1 implementation follows in texcomp.codecs.etc."""

    name = "etc"

    def __init__(self,
                 strategy: CompressionStrategy = CompressionStrategy.SMALLER_ERROR):
        self._strategy = strategy

    def set_compression_strategy(self, strategy: CompressionStrategy) -> None:
        self._strategy = strategy

    def supports_format(self, fmt: Format) -> bool:
        return fmt == Format.RGB

    def is_valid_compressed_image(self, image: CompressedImage) -> bool:
        raise NotImplementedError

    def compute_compressed_data_size(self, fmt, height, width) -> int:
        raise NotImplementedError

    def compress(self, fmt, height, width, padding_bytes_per_row, buffer,
                 image) -> bool:
        raise NotImplementedError

    def decompress(self, image, decompressed_buffer) -> bool:
        raise NotImplementedError

    def downsample(self, image, downsampled_image) -> bool:
        raise NotImplementedError

    def pad(self, image, padded_height, padded_width, padded_image) -> bool:
        raise NotImplementedError

    def compress_and_pad(self, fmt, height, width, padded_height, padded_width,
                         padding_bytes_per_row, buffer, padded_image) -> bool:
        raise NotImplementedError

    def create_solid_image(self, fmt, height, width, color, image) -> bool:
        raise NotImplementedError

    def copy_subimage(self, image, start_row, start_column, height, width,
                      subimage) -> bool:
        raise NotImplementedError
