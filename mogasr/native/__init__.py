"""Native (C++) host-side components, loaded via ctypes with lazy build.

The shared object is compiled on first use with the system g++ (baked into
the image) and cached next to the source; every native entry point has a
pure-Python fallback so the framework never hard-depends on a compiler at
runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_CTC_LIB: Optional[ctypes.CDLL] = None
_CTC_TRIED = False
_FLAC_LIB: Optional[ctypes.CDLL] = None
_FLAC_TRIED = False


def _build(src: str, so_path: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so_path],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_wer_lib() -> Optional[ctypes.CDLL]:
    """The WER shared library, building it on first call. None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_HERE, "wer_native.cpp")
        so_path = os.path.join(_HERE, "_wer_native.so")
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
            if not _build(src, so_path):
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.batch_edit_counts.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.batch_edit_counts.restype = None
        _LIB = lib
        return _LIB


def load_ctc_beam_lib() -> Optional[ctypes.CDLL]:
    """The CTC prefix-beam shared library; None if g++/dlopen unavailable."""
    global _CTC_LIB, _CTC_TRIED
    with _LOCK:
        if _CTC_LIB is not None or _CTC_TRIED:
            return _CTC_LIB
        _CTC_TRIED = True
        src = os.path.join(_HERE, "ctc_beam_native.cpp")
        so_path = os.path.join(_HERE, "_ctc_beam_native.so")
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
            if not _build(src, so_path):
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.ctc_prefix_beam.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32,
        ]
        lib.ctc_prefix_beam.restype = ctypes.c_int32
        _CTC_LIB = lib
        return _CTC_LIB


def load_flac_lib() -> Optional[ctypes.CDLL]:
    """The FLAC-decoder shared library; None if g++/dlopen unavailable."""
    global _FLAC_LIB, _FLAC_TRIED
    with _LOCK:
        if _FLAC_LIB is not None or _FLAC_TRIED:
            return _FLAC_LIB
        _FLAC_TRIED = True
        src = os.path.join(_HERE, "flac_native.cpp")
        so_path = os.path.join(_HERE, "_flac_native.so")
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
            if not _build(src, so_path):
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.flac_stream_info.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.flac_stream_info.restype = ctypes.c_int32
        lib.flac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.flac_decode.restype = ctypes.c_longlong
        _FLAC_LIB = lib
        return _FLAC_LIB
