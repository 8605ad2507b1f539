"""ctypes loader for the reference-C++ differential-testing oracle.

Builds liboracle.so on first use from oracle_wrapper.cc against the
read-only reference checkout (default /root/reference, override with
TEXCOMP_REFERENCE_PATH). Returns None if the reference or a compiler is
unavailable — parity tests then skip.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_THIS_DIR = Path(__file__).resolve().parent
_SO_PATH = _THIS_DIR / "build" / "liboracle.so"

_REFERENCE_SOURCES = [
    "image_compression/internal/compressor4x4_helper.cc",
    "image_compression/internal/dxtc_compressor.cc",
    "image_compression/internal/dxtc_const_color_table.cc",
    "image_compression/internal/dxtc_to_etc_transcoder.cc",
    "image_compression/internal/etc_compressor.cc",
    "image_compression/internal/pixel4x4.cc",
    "image_compression/internal/pvrtc_compressor.cc",
]

_lib = None
_tried = False


def _build(reference: Path) -> bool:
    _SO_PATH.parent.mkdir(parents=True, exist_ok=True)
    srcs = [str(reference / s) for s in _REFERENCE_SOURCES]
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
        "-DIS_LITTLE_ENDIAN",
        f"-I{reference}",
        str(_THIS_DIR / "oracle_wrapper.cc"),
        *srcs,
        "-o", str(_SO_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_oracle():
    """Return the loaded oracle library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    reference = Path(os.environ.get("TEXCOMP_REFERENCE_PATH", "/root/reference"))
    if not (reference / "image_compression").is_dir():
        return None
    wrapper_mtime = (_THIS_DIR / "oracle_wrapper.cc").stat().st_mtime
    if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < wrapper_mtime:
        if not _build(reference):
            return None
    _lib = ctypes.CDLL(str(_SO_PATH))
    return _lib


class Oracle:
    """Pythonic wrapper over the C API. All methods return numpy uint8 data
    or raise on oracle-reported failure (negative return codes)."""

    def __init__(self, lib):
        self._lib = lib

    @staticmethod
    def create():
        lib = get_oracle()
        return Oracle(lib) if lib is not None else None

    def _buf(self, arr) -> ctypes.c_char_p:
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    def compressed_size(self, name, fmt, h, w, strategy=2):
        return self._lib.orc_compressed_size(name.encode(), strategy, int(fmt),
                                             h, w)

    def compress(self, name, fmt, h, w, padding, buffer, strategy=2):
        buffer = np.ascontiguousarray(np.frombuffer(buffer, dtype=np.uint8))
        cap = max(16, 16 * ((h + 3) // 4 + 2) * ((w + 3) // 4 + 2) + 1024)
        out = np.zeros(cap, dtype=np.uint8)
        ch = ctypes.c_uint32()
        cw = ctypes.c_uint32()
        r = self._lib.orc_compress(
            name.encode(), strategy, int(fmt), h, w, padding,
            self._buf(buffer), self._buf(out), cap,
            ctypes.byref(ch), ctypes.byref(cw),
        )
        if r < 0:
            raise RuntimeError(f"oracle compress failed: {r}")
        return out[:r].copy(), ch.value, cw.value

    def compress_and_pad(self, name, fmt, h, w, ph, pw, padding, buffer,
                         strategy=2):
        buffer = np.ascontiguousarray(np.frombuffer(buffer, dtype=np.uint8))
        mh, mw = max(h, ph), max(w, pw)
        cap = 16 * ((mh + 3) // 4 + 2) * ((mw + 3) // 4 + 2) + 1024
        out = np.zeros(cap, dtype=np.uint8)
        ch = ctypes.c_uint32()
        cw = ctypes.c_uint32()
        r = self._lib.orc_compress_and_pad(
            name.encode(), strategy, int(fmt), h, w, ph, pw, padding,
            self._buf(buffer), self._buf(out), cap,
            ctypes.byref(ch), ctypes.byref(cw),
        )
        if r < 0:
            raise RuntimeError(f"oracle compress_and_pad failed: {r}")
        return out[:r].copy(), ch.value, cw.value

    def decompress(self, name, fmt, uh, uw, ch, cw, padding, data,
                   components, strategy=2):
        data = np.ascontiguousarray(data, dtype=np.uint8)
        cap = uh * (uw * components + padding) + 1024
        out = np.zeros(cap, dtype=np.uint8)
        r = self._lib.orc_decompress(
            name.encode(), strategy, int(fmt), uh, uw, ch, cw, padding,
            self._buf(data), data.size, self._buf(out), cap,
        )
        if r < 0:
            raise RuntimeError(f"oracle decompress failed: {r}")
        return out[:r].copy()

    def downsample(self, name, fmt, uh, uw, ch, cw, padding, data, strategy=2):
        data = np.ascontiguousarray(data, dtype=np.uint8)
        cap = data.size + 1024
        out = np.zeros(cap, dtype=np.uint8)
        och = ctypes.c_uint32()
        ocw = ctypes.c_uint32()
        r = self._lib.orc_downsample(
            name.encode(), strategy, int(fmt), uh, uw, ch, cw, padding,
            self._buf(data), data.size, self._buf(out), cap,
            ctypes.byref(och), ctypes.byref(ocw),
        )
        if r < 0:
            return None  # reference returned false
        return out[:r].copy(), och.value, ocw.value

    def pad(self, name, fmt, uh, uw, ch, cw, padding, data, ph, pw,
            strategy=2):
        data = np.ascontiguousarray(data, dtype=np.uint8)
        cap = 16 * ((max(ph, ch) + 3) // 4 + 2) * ((max(pw, cw) + 3) // 4 + 2) + 1024
        out = np.zeros(cap, dtype=np.uint8)
        och = ctypes.c_uint32()
        ocw = ctypes.c_uint32()
        r = self._lib.orc_pad(
            name.encode(), strategy, int(fmt), uh, uw, ch, cw, padding,
            self._buf(data), data.size, ph, pw, self._buf(out), cap,
            ctypes.byref(och), ctypes.byref(ocw),
        )
        if r < 0:
            return None
        return out[:r].copy(), och.value, ocw.value

    def create_solid(self, name, fmt, h, w, color, strategy=2):
        color = np.ascontiguousarray(color, dtype=np.uint8)
        cap = 16 * ((h + 3) // 4 + 2) * ((w + 3) // 4 + 2) + 1024
        out = np.zeros(cap, dtype=np.uint8)
        och = ctypes.c_uint32()
        ocw = ctypes.c_uint32()
        r = self._lib.orc_create_solid(
            name.encode(), strategy, int(fmt), h, w, self._buf(color),
            self._buf(out), cap, ctypes.byref(och), ctypes.byref(ocw),
        )
        if r < 0:
            return None
        return out[:r].copy(), och.value, ocw.value

    def copy_subimage(self, name, fmt, uh, uw, ch, cw, padding, data,
                      start_row, start_col, h, w, strategy=2):
        data = np.ascontiguousarray(data, dtype=np.uint8)
        cap = data.size + 1024
        out = np.zeros(cap, dtype=np.uint8)
        och = ctypes.c_uint32()
        ocw = ctypes.c_uint32()
        r = self._lib.orc_copy_subimage(
            name.encode(), strategy, int(fmt), uh, uw, ch, cw, padding,
            self._buf(data), data.size, start_row, start_col, h, w,
            self._buf(out), cap, ctypes.byref(och), ctypes.byref(ocw),
        )
        if r < 0:
            return None
        return out[:r].copy(), och.value, ocw.value

    def transcode_dxt1_to_etc1(self, data):
        data = np.ascontiguousarray(data, dtype=np.uint8).copy()
        self._lib.orc_transcode_dxt1_to_etc1(self._buf(data), data.size)
        return data
