"""Native host runtime: C++ library vs numpy fallback equivalence."""

import numpy as np
import pytest

from texcomp import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


def _with_fallback(monkeypatch, fn, *args):
    """Run fn with the native lib disabled (numpy fallback)."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    try:
        return fn(*args)
    finally:
        monkeypatch.setattr(native, "_tried", False)


def test_native_builds(lib):
    assert lib is not None


def test_pad_block_grid_matches_fallback(lib, rng, monkeypatch):
    src = rng.integers(0, 256, (3, 5, 8), dtype=np.uint8)
    col = rng.integers(0, 256, (3, 8), dtype=np.uint8)
    row = rng.integers(0, 256, (5, 8), dtype=np.uint8)
    corner = rng.integers(0, 256, (8,), dtype=np.uint8)
    a = native.pad_block_grid(src, 6, 9, col, row, corner)
    b = _with_fallback(monkeypatch, native.pad_block_grid, src, 6, 9, col,
                       row, corner)
    np.testing.assert_array_equal(a, b)
    # spot semantics
    np.testing.assert_array_equal(a[:3, :5], src)
    np.testing.assert_array_equal(a[1, 7], col[1])
    np.testing.assert_array_equal(a[4, 2], row[2])
    np.testing.assert_array_equal(a[5, 8], corner)


def test_copy_subgrid_matches_fallback(lib, rng, monkeypatch):
    src = rng.integers(0, 256, (6, 7, 16), dtype=np.uint8)
    a = native.copy_subgrid(src, 1, 2, 3, 4)
    b = _with_fallback(monkeypatch, native.copy_subgrid, src, 1, 2, 3, 4)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, src[1:4, 2:6])


def test_fill_blocks_matches_fallback(lib, rng, monkeypatch):
    block = rng.integers(0, 256, (16,), dtype=np.uint8)
    a = native.fill_blocks(37, block)
    b = _with_fallback(monkeypatch, native.fill_blocks, 37, block)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (37, 16)


def test_strided_copy_rows_matches_fallback(lib, rng, monkeypatch):
    src = rng.integers(0, 256, (10 * 20,), dtype=np.uint8)
    a = native.strided_copy_rows(src, 10, 12, 20, 15, 10 * 15)
    b = _with_fallback(monkeypatch, native.strided_copy_rows, src, 10, 12,
                       20, 15, 10 * 15)
    np.testing.assert_array_equal(a, b)


def test_zorder_perm_matches_fallback(lib, monkeypatch):
    for nbx, nby in [(2, 4), (8, 16), (32, 64)]:
        a = native.zorder_perm(nbx, nby)  # C++
        b = _with_fallback(monkeypatch, native.zorder_perm, nbx, nby)  # numpy
        np.testing.assert_array_equal(a, b)
    # FromZOrder spot values (pvrtc_compressor.cc:80-86): i=1 -> (x=0,y=1).
    p = native.zorder_perm(2, 4)
    assert p[0] == 0 and p[1] == 2 and p[2] == 1 and p[3] == 3


def test_permute_records_matches_fallback(lib, rng, monkeypatch):
    src = rng.integers(0, 256, (100, 8), dtype=np.uint8)
    perm = rng.permutation(100).astype(np.int32)
    a = native.permute_records(src, perm)
    b = _with_fallback(monkeypatch, native.permute_records, src, perm)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, src[perm])
