"""texcomp — a TPU-native block texture compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
google/image-compression (a pure-C++ serial per-block codec library):

  * DXT1 (BC1) / DXT5 (BC3) encode + decode
  * ETC1 encode + decode, 4 compression strategies
  * PVRTC v1 2-bits-per-pixel RGBA encode (plus a 4bpp extension)
  * DXT1 -> ETC1 transcoding
  * Compressed-domain operations: mipmap downsampling, padding by edge
    replication, solid-color synthesis, subimage copy, fused compress+pad
  * A ``Compressor`` API and ``CompressedImage`` container with semantics
    matching the reference (image_compression/public/compressor.h:48-138,
    compressed_image.h:32-185), with bit-exact payloads.

Architecture (TPU-first, not a translation):

  * ``texcomp.core``   — integer color/bit math as jnp ops on int32 lanes
  * ``texcomp.blocks`` — batched block gather/scatter (the Pixel4x4 /
    Compressor4x4Helper analog): image -> (num_blocks, 16) SoA tensors
  * ``texcomp.codecs`` — pure-function ``encode_blocks``/``decode_blocks``
    kernels per codec, jit-compiled over the block-batch axis
  * ``texcomp.ops``    — Pallas TPU kernels for the hot encode paths
  * ``texcomp.api``    — the reference-compatible public API
  * ``texcomp.dist``   — multi-chip sharding (jax.sharding.Mesh) and the
    batched asset pipeline
  * ``texcomp.native`` — C++ host-side runtime (bit packing, Z-order,
    block-grid ops) with pure-numpy fallbacks
"""

from texcomp.api.container import CompressedImage, Format, Metadata
from texcomp.api.compressor import Compressor
from texcomp.api.dxtc import DxtcCompressor
from texcomp.api.etc import EtcCompressor, CompressionStrategy
from texcomp.api.pvrtc import Pvrtc4bppCompressor, PvrtcCompressor
from texcomp.api.transcode import transcode_dxt1_to_etc1

__version__ = "0.2.0"

__all__ = [
    "CompressedImage",
    "Format",
    "Metadata",
    "Compressor",
    "DxtcCompressor",
    "EtcCompressor",
    "CompressionStrategy",
    "PvrtcCompressor",
    "Pvrtc4bppCompressor",
    "transcode_dxt1_to_etc1",
    "__version__",
]
