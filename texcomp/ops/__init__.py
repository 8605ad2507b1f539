"""Fused image-level encode ops — the performance path.

Each op maps a device-resident (H, W, C) uint8 image (H, W multiples of 4)
straight to packed blocks on device. Backend dispatch: Pallas TPU kernels on
accelerators, the reference-parity jnp kernels on CPU (same bytes either
way — the Pallas kernels are tested bit-identical against the jnp kernels,
which are tested bit-identical against the C++ reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from texcomp.blocks import image_to_blocks as _image_to_blocks


def use_pallas() -> bool:
    """Pallas TPU kernels on any non-CPU backend."""
    return jax.default_backend() != "cpu"


def dxt1_encode_image_op(image):
    """(H, W, 3) uint8 -> (H/4*W/4, 8) uint8 DXT1 blocks."""
    if use_pallas():
        from texcomp.ops import dxt_pallas

        return dxt_pallas.dxt1_encode_image(image)
    from texcomp.codecs import dxt

    return dxt.encode_dxt1_blocks(_image_to_blocks(image))


def dxt5_encode_image_op(image):
    """(H, W, 4) uint8 -> (H/4*W/4, 16) uint8 DXT5 blocks."""
    if use_pallas():
        from texcomp.ops import dxt_pallas

        return dxt_pallas.dxt5_encode_image(image)
    from texcomp.codecs import dxt

    blocks = _image_to_blocks(image)
    outside = jnp.zeros((blocks.shape[0],), dtype=bool)
    return dxt.encode_dxt5_blocks(blocks, outside)


def etc1_encode_image_op(image, strategy: int = 2):
    """(H, W, 3) uint8 -> (H/4*W/4, 8) uint8 ETC1 blocks."""
    if use_pallas():
        from texcomp.ops import etc_pallas

        return etc_pallas.etc1_encode_image(image, strategy)
    from texcomp.codecs import etc

    return etc.encode_etc1_blocks(_image_to_blocks(image), strategy)


def dxt1_decode_image_op(data, height: int, width: int):
    """(N, 8) uint8 DXT1 blocks -> decoded image; RGBX (H, W, 4) on TPU,
    (N, 16, 3) pixel blocks on CPU."""
    if use_pallas():
        from texcomp.ops import dxt_pallas

        return dxt_pallas.dxt1_decode_image(data, height=height, width=width)
    from texcomp.codecs import dxt

    return dxt.decode_dxt1_blocks(data).astype(jnp.uint8)


def etc1_decode_image_op(data, height: int, width: int):
    """(N, 8) uint8 ETC1 blocks -> decoded image (see dxt1_decode_image_op)."""
    if use_pallas():
        from texcomp.ops import etc_pallas

        return etc_pallas.etc1_decode_image(data, height=height, width=width)
    from texcomp.codecs import etc

    return etc.decode_etc1_blocks(data).astype(jnp.uint8)


def pvrtc_encode_image_op(image):
    """(H, W, 4) uint8 -> (H*W/32, 8) uint8 PVRTC 2BPP block records in
    Z-order."""
    if use_pallas():
        from texcomp.ops import pvrtc_fast

        return pvrtc_fast.encode_pvrtc_2bpp_fast(image)
    from texcomp.codecs import pvrtc

    return pvrtc.encode_pvrtc_2bpp_device(image)
