"""DXT1 -> ETC1 in-place transcoding (dxtc_to_etc_transcoder.cc:29-40)."""

from __future__ import annotations

from texcomp.api.container import CompressedImage


def transcode_dxt1_to_etc1(image: CompressedImage) -> None:
    """Re-encode each 8-byte DXT1 block as an 8-byte ETC1 block in place,
    using the heuristic ETC strategy (dxtc_to_etc_transcoder.cc:29-40)."""
    raise NotImplementedError  # lands with the ETC codec kernels
