"""Integer color math on int32 lanes.

Vectorized equivalents of the reference's inline color helpers
(image_compression/internal/color_util.h:37-423). Every function here is
bit-exactness-critical: the formulas (Blinn rounding, NVIDIA-style 565
expansion, truncating integer lerp) determine the exact output bytes of
every codec, so they replicate the reference's integer semantics rather
than "equivalent" float math.

All inputs/outputs are jnp int32 arrays (any shape); functions are pure and
jit-friendly. Colors are handled as separate channel arrays (structure of
arrays), which is the natural TPU layout — the reference's RgbInt/RgbaInt
structs (internal/color_types.h:33-113) become tuples of lanes.
"""

from __future__ import annotations

import jax.numpy as jnp


def div_trunc(n, d):
    """C-style truncating integer division (round toward zero).

    Python/jnp ``//`` floors, which differs from C's truncation for negative
    numerators. The reference relies on C semantics in CombineIntFast
    (color_util.h:282-286) and the /8 subblock averages (etc_compressor.cc
    :311, :431, :565-568). ``d`` must be positive.
    """
    n = jnp.asarray(n)
    return jnp.sign(n) * (jnp.abs(n) // d)


def quantize8_fast(v, num_bits: int):
    """Shift-quantize an 0-255 component to num_bits (color_util.h:142-148)."""
    return jnp.asarray(v) >> (8 - num_bits)


def quantize8(v, num_bits: int):
    """Round-exact 8-bit -> num_bits quantization (color_util.h:156-164).

    Jim Blinn's "Three Wrongs Make a Right" trick; equals
    round(v / 255 * ((1<<num_bits)-1)) for v in [0, 255].
    """
    max_val = (1 << num_bits) - 1
    i = jnp.asarray(v) * max_val + 128
    return (i + (i >> 8)) >> 8


def quantize_to_565(r, g, b):
    """RGB 0-255 -> (r5, g6, b5) via Quantize8 (color_util.h:185-189)."""
    return quantize8(r, 5), quantize8(g, 6), quantize8(b, 5)


def extend_4bit(bits):
    """4-bit -> 8-bit by replication: '1011' -> '10111011' (color_util.h:193-195)."""
    return (jnp.asarray(bits) << 4) | bits


def extend_5bit(bits):
    """5-bit -> 8-bit: '10110' -> '10110101' (color_util.h:200-202)."""
    bits = jnp.asarray(bits)
    return (bits << 3) | ((bits >> 2) & 7)


def extend565_r(r5):
    """NVIDIA-hardware-style 5-bit expansion (color_util.h:226-230).

    Off-by-one from float rounding for r5 in {3, 7, 24, 28} — intentional;
    see the table at color_util.h:209-225.
    """
    r5 = jnp.asarray(r5)
    return (r5 << 3) | (r5 >> 2)


def extend565_g(g6):
    """NVIDIA-hardware-style 6-bit expansion (color_util.h:226-230)."""
    g6 = jnp.asarray(g6)
    return (g6 << 2) | (g6 >> 4)


def extend565_b(b5):
    return extend565_r(b5)


def to_uint16_565(r5, g6, b5):
    """(r5, g6, b5) -> packed uint16 value as int32 (color_util.h:91-95)."""
    return (jnp.asarray(r5) << 11) | (jnp.asarray(g6) << 5) | b5


def from_uint16_565(p):
    """Packed 565 -> (r5, g6, b5) (color_util.h:98-102)."""
    p = jnp.asarray(p)
    return p >> 11, (p >> 5) & 0x3F, p & 0x1F


def clamp8(v):
    """Clamp to [0, 255] (color_util.h:248-265; the sign trick == clip)."""
    return jnp.clip(jnp.asarray(v), 0, 255)


def combine_int_fast(scale0: int, scale1: int, v0, v1):
    """Integer lerp: (s0*v0 + s1*v1) / (s0+s1), C truncating division
    (color_util.h:282-286)."""
    return div_trunc(scale0 * jnp.asarray(v0) + scale1 * jnp.asarray(v1),
                     scale0 + scale1)


def average4_fast(v0, v1, v2, v3):
    """Truncating average of 4 components (color_util.h:335-341)."""
    return (jnp.asarray(v0) + v1 + v2 + v3) // 4


def compute_luminance_fast(r, g, b):
    """Approximate luminance 4r + 8g + b (color_util.h:383-395)."""
    return jnp.asarray(r) * 4 + jnp.asarray(g) * 8 + b


def compute_squared_luminance_distance_fast(r0, g0, b0, r1, g1, b1):
    """(lum(c1) - lum(c0))^2 (color_util.h:399-403)."""
    diff = compute_luminance_fast(r1, g1, b1) - compute_luminance_fast(r0, g0, b0)
    return diff * diff


def compute_difference_luminance_fast(r0, g0, b0, r1, g1, b1):
    """lum(|c0 - c1|)^2 — chroma-aware distance (color_util.h:410-417)."""
    dl = compute_luminance_fast(
        jnp.abs(jnp.asarray(r0) - r1),
        jnp.abs(jnp.asarray(g0) - g1),
        jnp.abs(jnp.asarray(b0) - b1),
    )
    return dl * dl


def compute_squared_component_distance(c0, c1):
    """(c1 - c0)^2 (color_util.h:420-423)."""
    diff = jnp.asarray(c1) - c0
    return diff * diff
