"""Bit-field helpers on 32-bit integer lanes.

Vectorized equivalents of image_compression/internal/bit_util.h:30-69.
Words are jnp uint32 arrays so that bit 31 is usable without sign trouble
(the PVRTC color packer sets bit 31, pvrtc_compressor.cc:374-379).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def get_mask(num_ones: int) -> int:
    """num_ones 1-bits in the LSBs (bit_util.h:30-32). Python int, static."""
    return (1 << num_ones) - 1


def get_bits(bits, start_bit: int, num_bits: int):
    """Extract num_bits starting at start_bit (bit_util.h:37-41) -> int32."""
    word = jnp.asarray(bits).astype(_U32)
    return ((word >> start_bit) & _U32(get_mask(num_bits))).astype(jnp.int32)


def set_bits(bits, start_bit: int, num_bits: int, value):
    """Return ``bits`` with the field [start_bit, start_bit+num_bits) replaced
    by ``value`` (bit_util.h:46-57). Negative values are masked to the field
    width, matching the unsigned cast in the reference (used for ETC's signed
    3-bit color deltas, etc_compressor.cc:334-336)."""
    mask = get_mask(num_bits)
    word = jnp.asarray(bits).astype(_U32)
    val = (jnp.asarray(value).astype(_U32) & _U32(mask)) << start_bit
    return (word & _U32(~(mask << start_bit) & 0xFFFFFFFF)) | val


def extend_sign_bit(value, num_bits: int):
    """Sign-extend a num_bits two's-complement field to int32
    (bit_util.h:61-69)."""
    value = jnp.asarray(value).astype(jnp.int32)
    shift = 32 - num_bits
    return (value << shift) >> shift
