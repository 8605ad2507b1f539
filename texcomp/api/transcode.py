"""DXT1 -> ETC1 in-place transcoding.

Batched equivalent of TranscodeDxt1ToEtc1 (image_compression/internal/
dxtc_to_etc_transcoder.cc:29-40): every 8-byte DXT1 block in the payload is
decoded and re-encoded as an 8-byte ETC1 block using the heuristic strategy,
in place. One fused device call: decode and encode compose through the
(N, 16, 3) pixel tensor with no host round-trip in between.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from texcomp.api.container import CompressedImage
from texcomp.codecs import dxt, etc


@jax.jit
def transcode_dxt1_to_etc1_blocks(data: jax.Array) -> jax.Array:
    """(N, 8) uint8 DXT1 blocks -> (N, 8) uint8 ETC1 blocks (heuristic
    strategy, dxtc_to_etc_transcoder.cc:37)."""
    pixels = dxt.decode_dxt1_blocks(data)
    return etc.encode_etc1_blocks(pixels, etc.HEURISTIC)


@jax.jit
def transcode_dxt1_to_etc1_blocks_hq(data: jax.Array) -> jax.Array:
    """HQ variant (EXTENSION): re-encode the decoded DXT1 pixels with the
    full HQ ETC1 search instead of the reference's heuristic strategy.
    Provably never worse in decoded error vs the DXT1 pixels: the HQ
    candidate set includes the truncating bases of both flips under the
    exhaustive codeword search, which dominates the heuristic's
    same-bases heuristic-codeword choice."""
    pixels = dxt.decode_dxt1_blocks(data)
    return etc.encode_etc1_hq_blocks(pixels)


def transcode_dxt1_to_etc1(image: CompressedImage,
                           quality: str = "reference") -> None:
    """Re-encode every 8-byte DXT1 block of ``image`` as ETC1 in place.

    Like the reference, this rewrites only the payload: metadata (including
    compressor_name) is left untouched (dxtc_to_etc_transcoder.h:20-24 notes
    the operation is in-place on the data).

    ``quality="high"`` (EXTENSION) re-encodes with the HQ ETC1 search
    (never worse than the reference transcoder's heuristic output vs the
    decoded DXT1 pixels)."""
    from texcomp.ops import use_pallas

    if quality not in ("reference", "high"):
        raise ValueError(f"unknown quality {quality!r}")
    data = image.get_mutable_data()
    blocks = data.reshape(-1, 8)
    if quality == "high":
        out = np.asarray(transcode_dxt1_to_etc1_blocks_hq(jnp.asarray(blocks)))
    elif use_pallas():
        from texcomp.ops import dxt_pallas, etc_pallas

        words = dxt_pallas.blocks_to_words(jnp.asarray(blocks.copy()), 2)
        out = np.asarray(etc_pallas.etc1_words_to_blocks(
            etc_pallas.transcode_dxt1_to_etc1_packed(words)))
    else:
        out = np.asarray(transcode_dxt1_to_etc1_blocks(jnp.asarray(blocks)))
    blocks[:] = out
