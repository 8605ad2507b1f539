"""Core integer color / bit math shared by all codecs (L1 primitives).

jnp re-implementations of the reference's header-only color utilities
(image_compression/internal/color_util.h, bit_util.h). All functions are
elementwise over int32/uint32 lanes and trace cleanly under jax.jit.
"""

from texcomp.core.colors import (
    clamp8,
    combine_int_fast,
    compute_difference_luminance_fast,
    compute_luminance_fast,
    compute_squared_luminance_distance_fast,
    div_trunc,
    extend_4bit,
    extend_5bit,
    extend565_b,
    extend565_g,
    extend565_r,
    quantize8,
    quantize8_fast,
    to_uint16_565,
)
from texcomp.core.bits import get_bits, get_mask, set_bits, extend_sign_bit

__all__ = [
    "clamp8",
    "combine_int_fast",
    "compute_difference_luminance_fast",
    "compute_luminance_fast",
    "compute_squared_luminance_distance_fast",
    "div_trunc",
    "extend_4bit",
    "extend_5bit",
    "extend565_b",
    "extend565_g",
    "extend565_r",
    "quantize8",
    "quantize8_fast",
    "to_uint16_565",
    "get_bits",
    "get_mask",
    "set_bits",
    "extend_sign_bit",
]
