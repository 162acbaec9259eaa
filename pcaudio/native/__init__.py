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
        lib.pcaudio_decode_wav_batch_i16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int]
        lib.pcaudio_decode_wav_batch_i16.restype = ctypes.c_int
        lib.pcaudio_prefetch_create.argtypes = [
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.pcaudio_prefetch_create.restype = ctypes.c_void_p
        lib.pcaudio_prefetch_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
        lib.pcaudio_prefetch_submit.restype = ctypes.c_int
        lib.pcaudio_prefetch_acquire.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))]
        lib.pcaudio_prefetch_acquire.restype = ctypes.c_int
        lib.pcaudio_prefetch_release.argtypes = [ctypes.c_void_p]
        lib.pcaudio_prefetch_release.restype = ctypes.c_int
        lib.pcaudio_prefetch_destroy.argtypes = [ctypes.c_void_p]
        lib.pcaudio_prefetch_destroy.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def decode_wav_batch(
    paths: Sequence[str], buffer_len: int, num_threads: Optional[int] = None,
    dtype=np.float32, out: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded native decode of many WAVs into a zero-padded ``[B, L]``
    batch + lengths.  Raises RuntimeError on decode failure or if the
    native library can't be built.

    ``dtype=np.int16`` stages raw PCM16 (half the memory/H2D traffic;
    bit-exact for 16-bit PCM sources, round-clamped for wider/float ones).
    ``out`` lets callers reuse a preallocated ``[n, buffer_len]`` buffer —
    on kernels with slow first-touch page faults (measured ~100 µs/page in
    this image's sandbox), fresh 400 MB allocations dominate decode cost.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    n = len(paths)
    dtype = np.dtype(dtype)
    if out is None:
        out = np.empty((n, buffer_len), dtype)
    else:
        assert out.shape == (n, buffer_len) and out.dtype == dtype
    lengths = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads is None:
        num_threads = min(8, os.cpu_count() or 1)
    if dtype == np.int16:
        rc = lib.pcaudio_decode_wav_batch_i16(
            arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            buffer_len, num_threads,
        )
    else:
        assert dtype == np.float32, "dtype must be float32 or int16"
        rc = lib.pcaudio_decode_wav_batch(
            arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            buffer_len, num_threads,
        )
    if rc != 0:
        raise RuntimeError(f"native WAV decode failed with code {rc}")
    return out, lengths


class PrefetchingLoader:
    """Native decode pipeline: a C++ thread pool fills a ring of ``depth``
    slot buffers ahead of consumption, so host decode of upcoming batches
    overlaps device compute (the production ingest the reference's per-clip
    ``librosa.load`` loop cannot do, ``Code/settransformer.py:43-47``).

    Usage::

        with PrefetchingLoader(L, batch=64, depth=3) as pf:
            for group in batches:           # submit a few batches ahead
                pf.submit(group)
            for _ in batches:
                waves, lengths, n = pf.next()   # zero-copy views
                ...                             # consumed before next next()

    ``next()`` returns numpy views INTO the slot, valid until the following
    ``next()`` call (which releases the previous slot).
    """

    def __init__(self, buffer_len: int, batch: int, depth: int = 3,
                 num_threads: Optional[int] = None, dtype=np.float32):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable (no g++?)")
        if num_threads is None:
            num_threads = min(8, os.cpu_count() or 1)
        self._dtype = np.dtype(dtype)
        assert self._dtype in (np.float32, np.int16), \
            "staging dtype must be float32 or int16"
        self._lib = lib
        self._h = lib.pcaudio_prefetch_create(
            buffer_len, batch, depth, num_threads,
            1 if self._dtype == np.int16 else 0)
        if not self._h:
            raise RuntimeError("prefetcher creation failed")
        self._buffer_len = buffer_len
        self._batch = batch
        self._outstanding = 0

    def submit(self, paths: Sequence[str]) -> None:
        n = len(paths)
        assert n <= self._batch
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = self._lib.pcaudio_prefetch_submit(self._h, arr, n)
        if rc != 0:
            raise RuntimeError(f"prefetch submit failed: {rc}")

    def next(self) -> Tuple[np.ndarray, np.ndarray, int]:
        """Blocking: (waves [batch, L] view, lengths [batch] view, n).
        Auto-releases the previously returned slot."""
        if self._outstanding:
            self.release()
        return self.acquire()

    def acquire(self) -> Tuple[np.ndarray, np.ndarray, int]:
        """Blocking acquire WITHOUT releasing prior slots: the caller may
        hold several slots (up to ``depth``) and :meth:`release` them in
        acquisition order once consumed — the zero-copy serving pattern
        (slot views feed ``jax.device_put`` directly; the slot is released
        only after the batch's result materializes)."""
        fp = ctypes.POINTER(ctypes.c_float)()
        lp = ctypes.POINTER(ctypes.c_int32)()
        rc = self._lib.pcaudio_prefetch_acquire(
            self._h, ctypes.byref(fp), ctypes.byref(lp))
        if rc < 0:
            self._lib.pcaudio_prefetch_release(self._h)
            raise RuntimeError(f"prefetch decode failed: {rc}")
        self._outstanding += 1
        if self._dtype == np.int16:
            sp = ctypes.cast(fp, ctypes.POINTER(ctypes.c_int16))
            waves = np.ctypeslib.as_array(sp, (self._batch, self._buffer_len))
        else:
            waves = np.ctypeslib.as_array(fp, (self._batch, self._buffer_len))
        lengths = np.ctypeslib.as_array(lp, (self._batch,))
        return waves, lengths, rc

    def release(self) -> None:
        """Release the OLDEST acquired slot (views into it die)."""
        if self._outstanding:
            self._lib.pcaudio_prefetch_release(self._h)
            self._outstanding -= 1

    def close(self) -> None:
        if self._h:
            self._lib.pcaudio_prefetch_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - defensive
        try:
            self.close()
        except Exception:
            pass
