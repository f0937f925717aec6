"""Threaded native frame loader for PXM image sequences.

Python front end for kangaroo_tpu/native/frame_loader.cpp — the runtime
equivalent of the reference's HAL camera input (extra/RpgCameraOpen.h; the
apps' per-frame video.Capture + CopyFrom, kinectfusion/main.cpp:196-208).
Decoding and disk IO run in C++ worker threads feeding a bounded ring
buffer, so the accelerator pipeline never blocks on input. Falls back to
synchronous NumPy loading (io.pxm) when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB = None
_TRIED = False


def _load_native():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_NATIVE_DIR, "frame_loader.cpp")
    so = os.path.join(_NATIVE_DIR, "libframe_loader.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-pthread", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.fl_open.restype = ctypes.c_void_p
        lib.fl_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
        ]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.fl_next.restype = ctypes.c_int
        lib.fl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(u8p), i64p,
                                i64p, i64p, i64p, i64p]
        lib.fl_free.argtypes = [u8p]
        lib.fl_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


class FrameLoader:
    """Iterate decoded frames of a PXM sequence.

    With ``ordered=True`` (default) uses one worker so frames arrive in
    sequence order (still overlapping IO with compute); more workers trade
    ordering for throughput (each yielded frame carries its index).
    """

    def __init__(self, paths: Sequence[str], n_threads: int = 1,
                 capacity: int = 4, use_native: bool | None = None):
        self.paths = [str(p) for p in paths]
        self.n_threads = n_threads
        self.capacity = capacity
        lib = _load_native() if use_native in (None, True) else None
        if use_native is True and lib is None:
            raise RuntimeError("native frame loader unavailable")
        self._lib = lib

    def __iter__(self) -> Iterator[tuple[int, np.ndarray]]:
        if self._lib is None:
            from . import pxm

            for i, p in enumerate(self.paths):
                yield i, pxm.load_pxm(p)
            return

        lib = self._lib
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths]
        )
        handle = lib.fl_open(arr, len(self.paths), self.n_threads, self.capacity)
        try:
            sentinels = 0
            while sentinels < self.n_threads:
                data = ctypes.POINTER(ctypes.c_uint8)()
                w = ctypes.c_int64()
                h = ctypes.c_int64()
                c = ctypes.c_int64()
                bps = ctypes.c_int64()
                idx = ctypes.c_int64()
                rc = lib.fl_next(handle, ctypes.byref(data), ctypes.byref(w),
                                 ctypes.byref(h), ctypes.byref(c),
                                 ctypes.byref(bps), ctypes.byref(idx))
                if rc == 0:
                    sentinels += 1
                    continue
                n = w.value * h.value * c.value * bps.value
                buf = np.ctypeslib.as_array(data, shape=(n,)).copy()
                lib.fl_free(data)
                if rc < 0:
                    continue  # unreadable file: skip
                if bps.value == 2:
                    img = buf.view(">u2").astype(np.uint16)
                else:
                    img = buf
                shape = (
                    (h.value, w.value) if c.value == 1 else (h.value, w.value, c.value)
                )
                yield idx.value, img.reshape(shape)
        finally:
            lib.fl_close(handle)
