"""ctypes bindings for the native ingest library (wav_loader.cpp).

Builds ``libpcaudio_native.so`` with g++ on first use (cached next to the
source); every entry point has a pure-Python fallback
(``pcaudio.data.audio_io``), so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wav_loader.cpp")
_SO = os.path.join(_DIR, "libpcaudio_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.pcaudio_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.pcaudio_decode_wav.restype = ctypes.c_int
        lib.pcaudio_decode_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int]
        lib.pcaudio_decode_wav_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def decode_wav_batch(
    paths: Sequence[str], buffer_len: int, num_threads: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded native decode of many WAVs into a zero-padded ``[B, L]``
    float32 batch + lengths.  Raises RuntimeError on decode failure or if the
    native library can't be built."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    n = len(paths)
    out = np.zeros((n, buffer_len), np.float32)
    lengths = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads is None:
        num_threads = min(8, os.cpu_count() or 1)
    rc = lib.pcaudio_decode_wav_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        buffer_len, num_threads,
    )
    if rc != 0:
        raise RuntimeError(f"native WAV decode failed with code {rc}")
    return out, lengths
