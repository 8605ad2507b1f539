"""PvrtcCompressor: PVRTC v1 2BPP RGBA (encode only in the reference).

Mirrors image_compression/public/pvrtc_compressor.h:71-104. Full
implementation lands with the PVRTC codec kernels.
"""

from __future__ import annotations

from texcomp.api.compressor import Compressor
from texcomp.api.container import CompressedImage, Format


class PvrtcCompressor(Compressor):
    """Placeholder; full PVRTC implementation follows in texcomp.codecs.pvrtc."""

    name = "pvrtc"

    def supports_format(self, fmt: Format) -> bool:
        return fmt == Format.RGBA

    def is_valid_compressed_image(self, image: CompressedImage) -> bool:
        raise NotImplementedError

    def compute_compressed_data_size(self, fmt, height, width) -> int:
        return width * height // 4

    def compress(self, fmt, height, width, padding_bytes_per_row, buffer,
                 image) -> bool:
        raise NotImplementedError

    def decompress(self, image, decompressed_buffer) -> bool:
        return False

    def downsample(self, image, downsampled_image) -> bool:
        return False

    def pad(self, image, padded_height, padded_width, padded_image) -> bool:
        return False

    def compress_and_pad(self, fmt, height, width, padded_height, padded_width,
                         padding_bytes_per_row, buffer, padded_image) -> bool:
        return False

    def create_solid_image(self, fmt, height, width, color, image) -> bool:
        return False

    def copy_subimage(self, image, start_row, start_column, height, width,
                      subimage) -> bool:
        return False
