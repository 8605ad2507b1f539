"""Native host runtime loader.

Builds texcomp_host.cc into a shared library on first use (g++, cached next
to the source) and exposes its operations with transparent numpy fallbacks,
so the framework works with or without a C++ toolchain. The device computes;
this layer moves bytes on the TPU-VM host.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_THIS_DIR = Path(__file__).resolve().parent
_SRC = _THIS_DIR / "texcomp_host.cc"
_SO = _THIS_DIR / "_texcomp_host.so"

_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", str(_SRC),
           "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib():
    """The loaded native library, or None (numpy fallbacks used)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("TEXCOMP_DISABLE_NATIVE"):
        return None
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        _lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def pad_block_grid(src: np.ndarray, pbr: int, pbc: int, col_pad: np.ndarray,
                   row_pad: np.ndarray, corner_pad: np.ndarray) -> np.ndarray:
    """Assemble a padded block grid (Compressor4x4Helper::Pad's byte
    movement, compressor4x4_helper.h:420-474).

    src: (nbr, nbc, bs) uint8; col_pad: (nbr, bs); row_pad: (nbc, bs);
    corner_pad: (bs,). Returns (pbr, pbc, bs) uint8.
    """
    nbr, nbc, bs = src.shape
    lib = get_lib()
    if lib is not None:
        src = np.ascontiguousarray(src)
        col_pad = np.ascontiguousarray(col_pad)
        row_pad = np.ascontiguousarray(row_pad)
        corner_pad = np.ascontiguousarray(corner_pad)
        dst = np.empty((pbr, pbc, bs), dtype=np.uint8)
        lib.th_pad_block_grid(_ptr(src), nbr, nbc, pbr, pbc, bs,
                              _ptr(col_pad), _ptr(row_pad), _ptr(corner_pad),
                              _ptr(dst))
        return dst
    dst = np.empty((pbr, pbc, bs), dtype=np.uint8)
    dst[:nbr, :nbc] = src
    if pbc > nbc:
        dst[:nbr, nbc:] = col_pad[:, None, :]
    if pbr > nbr:
        dst[nbr:, :nbc] = row_pad[None, :, :]
        if pbc > nbc:
            dst[nbr:, nbc:] = corner_pad[None, None, :]
    return dst


def copy_subgrid(src: np.ndarray, r0: int, c0: int, nbr: int,
                 nbc: int) -> np.ndarray:
    """(src_nbr, src_nbc, bs) -> (nbr, nbc, bs) block sub-rectangle."""
    lib = get_lib()
    if lib is not None:
        src = np.ascontiguousarray(src)
        bs = src.shape[2]
        dst = np.empty((nbr, nbc, bs), dtype=np.uint8)
        lib.th_copy_subgrid(_ptr(src), src.shape[1], bs, r0, c0, nbr, nbc,
                            _ptr(dst))
        return dst
    return np.ascontiguousarray(src[r0 : r0 + nbr, c0 : c0 + nbc])


def fill_blocks(n: int, block: np.ndarray) -> np.ndarray:
    """Replicate one block n times -> (n, bs) uint8."""
    lib = get_lib()
    block = np.ascontiguousarray(block, dtype=np.uint8).reshape(-1)
    if lib is not None:
        dst = np.empty((n, block.size), dtype=np.uint8)
        lib.th_fill_blocks(_ptr(dst), n, _ptr(block), block.size)
        return dst
    return np.broadcast_to(block, (n, block.size)).copy()


def strided_copy_rows(src: np.ndarray, rows: int, row_bytes: int,
                      src_stride: int, dst_stride: int,
                      dst_size: int) -> np.ndarray:
    """Row-strided byte copy (image buffer <-> padded row buffer)."""
    lib = get_lib()
    src = np.ascontiguousarray(src.reshape(-1).view(np.uint8))
    dst = np.zeros(dst_size, dtype=np.uint8)
    if lib is not None:
        lib.th_strided_copy_rows(_ptr(src), _ptr(dst), rows, row_bytes,
                                 src_stride, dst_stride)
        return dst
    for r in range(rows):
        dst[r * dst_stride : r * dst_stride + row_bytes] = src[
            r * src_stride : r * src_stride + row_bytes]
    return dst


def zorder_perm(nbx: int, nby: int) -> np.ndarray:
    """Z-order block permutation (pvrtc_compressor.cc:80-86): perm[i] =
    row-major block index for Z-order output slot i. This is the canonical
    implementation; codecs.pvrtc.zorder_block_permutation caches it."""
    lib = get_lib()
    if lib is not None:
        out = np.empty(nbx * nby, dtype=np.int32)
        lib.th_zorder_perm(_iptr(out), nbx, nby)
        return out
    n = nbx * nby
    i = np.arange(n, dtype=np.uint64)
    x = np.zeros(n, dtype=np.uint64)
    y = np.zeros(n, dtype=np.uint64)
    for j in range(16):
        x |= ((i >> np.uint64(j * 2 + 1)) & np.uint64(1)) << np.uint64(j)
        y |= ((i >> np.uint64(j * 2)) & np.uint64(1)) << np.uint64(j)
    return (y * nbx + x).astype(np.int32)


def permute_records(src: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """dst[i] = src[perm[i]] over (N, record_bytes) uint8 — host-side block
    reordering (e.g. Z-order packing when records are already on host)."""
    lib = get_lib()
    if lib is not None:
        src = np.ascontiguousarray(src)
        perm = np.ascontiguousarray(perm, dtype=np.int32)
        dst = np.empty_like(src)
        lib.th_permute_records(_ptr(src), _iptr(perm), src.shape[0],
                               src.shape[1], _ptr(dst))
        return dst
    return src[perm]
