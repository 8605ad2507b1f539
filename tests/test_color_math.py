"""Unit tests for core integer color math against documented reference
semantics (image_compression/internal/color_util.h)."""

import jax.numpy as jnp
import numpy as np

from texcomp.core import bits as cb
from texcomp.core import colors as cc
from texcomp.core.constants import DXTC_CONST_COLOR_TABLE, ETC1_CODEBOOK


def test_quantize8_matches_float_rounding():
    """Quantize8 == round(v/255 * max) for all v (color_util.h:151-164)."""
    v = jnp.arange(256)
    for bits in (4, 5, 6):
        max_val = (1 << bits) - 1
        expected = np.round(np.arange(256) / 255.0 * max_val).astype(int)
        np.testing.assert_array_equal(np.asarray(cc.quantize8(v, bits)), expected)


def test_quantize8_fast_is_shift():
    v = jnp.arange(256)
    np.testing.assert_array_equal(np.asarray(cc.quantize8_fast(v, 5)),
                                  np.arange(256) >> 3)


def test_extend565_off_by_one_table():
    """The NVIDIA-style expansion differs from float rounding exactly at the
    documented values (color_util.h:209-225)."""
    r5 = np.arange(32)
    fast = np.asarray(cc.extend565_r(jnp.asarray(r5)))
    flt = np.round(r5 / 31.0 * 255.0).astype(int)
    diff_at = set(np.nonzero(fast != flt)[0].tolist())
    assert diff_at == {3, 7, 24, 28}
    assert fast[3] == 24 and fast[7] == 57 and fast[24] == 198 and fast[28] == 231

    g6 = np.arange(64)
    fastg = np.asarray(cc.extend565_g(jnp.asarray(g6)))
    fltg = np.round(g6 / 63.0 * 255.0).astype(int)
    diffg = set(np.nonzero(fastg != fltg)[0].tolist())
    assert diffg == {11, 12, 13, 14, 15, 48, 49, 50, 51, 52}


def test_extend_bits():
    assert int(cc.extend_4bit(jnp.int32(0b1011))) == 0b10111011
    assert int(cc.extend_5bit(jnp.int32(0b10110))) == 0b10110101


def test_combine_int_fast_truncates():
    """CombineIntFast uses C truncating division (color_util.h:282-286)."""
    assert int(cc.combine_int_fast(2, 1, jnp.int32(0), jnp.int32(255))) == 85
    assert int(cc.combine_int_fast(1, 2, jnp.int32(0), jnp.int32(255))) == 170
    # Negative numerator: C truncates toward zero, Python floors.
    assert int(cc.div_trunc(jnp.int32(-7), 8)) == 0
    assert int(cc.div_trunc(jnp.int32(-9), 8)) == -1


def test_luminance_and_distances():
    assert int(cc.compute_luminance_fast(jnp.int32(1), jnp.int32(1), jnp.int32(1))) == 13
    d = cc.compute_squared_luminance_distance_fast(
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
        jnp.int32(255), jnp.int32(0), jnp.int32(0))
    assert int(d) == (255 * 4) ** 2
    # Difference luminance distinguishes iso-luminant colors
    # (color_util.h:405-417): lum(4,8,1)*(r=2,b=8) swap example.
    a = cc.compute_difference_luminance_fast(
        jnp.int32(2), jnp.int32(0), jnp.int32(0),
        jnp.int32(0), jnp.int32(0), jnp.int32(8))
    assert int(a) == (2 * 4 + 8 * 1) ** 2


def test_clamp8():
    v = jnp.asarray([-500, -1, 0, 128, 255, 256, 99999])
    np.testing.assert_array_equal(np.asarray(cc.clamp8(v)),
                                  [0, 0, 0, 128, 255, 255, 255])


def test_565_pack_roundtrip():
    r = jnp.arange(32)
    g = jnp.arange(32) * 2 % 64
    b = jnp.arange(32)[::-1]
    p = cc.to_uint16_565(r, g, b)
    r2, g2, b2 = cc.from_uint16_565(p)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r))
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g))
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(b))


def test_bit_utils():
    assert cb.get_mask(3) == 7
    w = jnp.uint32(0)
    w = cb.set_bits(w, 3, 2, 1)
    assert int(cb.get_bits(w, 3, 2)) == 1
    # Negative value masked (SetBits on signed deltas, bit_util.h:49-53).
    w = cb.set_bits(jnp.uint32(0), 8, 3, -4)
    assert int(cb.get_bits(w, 8, 3)) == 4
    assert int(cb.extend_sign_bit(jnp.int32(0b100), 3)) == -4
    assert int(cb.extend_sign_bit(jnp.int32(0b011), 3)) == 3
    # Bit 31 usable (PVRTC sets it, pvrtc_compressor.cc:374).
    w = cb.set_bits(jnp.uint32(0), 31, 1, 1)
    assert int(jnp.asarray(w).astype(jnp.uint32)) == 0x80000000


def test_dxtc_const_color_table_reference_rows():
    """Spot-check the regenerated LUT against rows transcribed from
    dxtc_const_color_table.cc:61-316."""
    expected = {
        0: [0, 0, 0, 0, 0, 0, 0, 0],
        1: [0, 0, 0, 0, 0, 1, 0, 0],
        30: [0, 11, 0, 7, 10, 2, 0, 15],
        86: [15, 1, 0, 21, 1, 62, 0, 42],
        139: [10, 31, 3, 31, 51, 1, 6, 63],
        187: [27, 14, 14, 31, 48, 43, 29, 63],
        230: [28, 28, 25, 31, 54, 62, 51, 63],
        243: [29, 31, 28, 31, 60, 60, 57, 63],
        255: [31, 31, 31, 31, 63, 63, 63, 63],
    }
    for row, exp in expected.items():
        assert DXTC_CONST_COLOR_TABLE[row].tolist() == exp, f"row {row}"


def test_etc_codebook():
    assert ETC1_CODEBOOK[0].tolist() == [2, 8, -2, -8]
    assert ETC1_CODEBOOK[7].tolist() == [47, 183, -47, -183]
