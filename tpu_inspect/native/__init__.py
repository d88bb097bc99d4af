"""First-party native (C++) host-runtime components.

``tin_io`` is the framework's own image-decode library (libpng + libtiff),
standing in for the reference's Qt/OpenCV C++ decode (indexing_ui.py:
145-194). It is compiled on demand with the system toolchain and loaded
through ctypes; any failure (no compiler, unsupported file layout) makes
the callers fall back to cv2, so the native path can never break parity.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tin_io.cc")
_SO = os.path.join(_DIR, "libtin_io.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO + ".tmp",
        "-lpng", "-ltiff",
    ]
    try:
        res = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        return False
    os.replace(_SO + ".tmp", _SO)
    return True


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(
                _SO
            ) < os.path.getmtime(_SRC):
                if not _build():
                    _lib_failed = True
                    return None
            lib = ctypes.CDLL(_SO)
            lib.tin_decode.restype = ctypes.c_int
            lib.tin_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.tin_free.restype = None
            lib.tin_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
            lib.tin_version.restype = ctypes.c_char_p
            lib.tin_encode_png_gray8.restype = ctypes.c_int
            lib.tin_encode_png_gray8.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.tin_loader_create.restype = ctypes.c_void_p
            lib.tin_loader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.tin_loader_next.restype = ctypes.c_int
            lib.tin_loader_next.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.tin_loader_destroy.restype = None
            lib.tin_loader_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except OSError:
            _lib_failed = True
    return _lib


def decode(path: str) -> np.ndarray | None:
    """Decode PNG/TIFF to a numpy array in cv2.imread(IMREAD_UNCHANGED)
    conventions (uint8/uint16; [H,W] gray, [H,W,3] BGR, [H,W,4] BGRA).

    Returns None whenever the native path cannot reproduce cv2 bit-exactly
    (unsupported layout, build failure, other containers) — callers fall
    back to cv2.
    """
    lib = get_lib()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    ch = ctypes.c_int32()
    depth = ctypes.c_int32()
    rc = lib.tin_decode(
        os.fsencode(path),
        ctypes.byref(data),
        ctypes.byref(w),
        ctypes.byref(h),
        ctypes.byref(ch),
        ctypes.byref(depth),
    )
    if rc != 0:
        return None
    return _unpack_frame(lib, data, w.value, h.value, ch.value, depth.value)


def _unpack_frame(lib, data, w: int, h: int, ch: int, depth: int) -> np.ndarray:
    """Copy a tin-owned pixel buffer into a numpy array and free it."""
    try:
        nbytes = h * w * ch * (depth // 8)
        raw = ctypes.cast(
            data, ctypes.POINTER(ctypes.c_uint8 * nbytes)
        ).contents
        arr = np.frombuffer(
            raw, dtype=np.uint8 if depth == 8 else np.uint16
        ).copy()
    finally:
        lib.tin_free(data)
    if ch == 1:
        return arr.reshape(h, w)
    return arr.reshape(h, w, ch)


def encode_png_gray(path: str, img: np.ndarray) -> bool:
    """Write [H, W] uint8 as grayscale PNG via the native encoder.

    Returns False (caller falls back to cv2.imwrite) when the native
    library is unavailable or the write fails.
    """
    lib = get_lib()
    if lib is None or img.ndim != 2 or img.dtype != np.uint8:
        return False
    arr = np.ascontiguousarray(img)
    rc = lib.tin_encode_png_gray8(
        os.fsencode(path),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int32(arr.shape[1]),
        np.int32(arr.shape[0]),
    )
    return rc == 0


class StreamLoader:
    """In-order prefetching decoder over a list of image paths.

    A native worker pool (tin_loader_*) decodes frames ahead of the consumer
    into a bounded queue, so host decode overlaps device compute in
    streaming deployments (streaming.py). The reference decodes on the UI
    thread at image-switch time instead (indexing_ui.py:145-194).

    Iterating yields one item per path, in order: a numpy array in
    ``decode()`` conventions, or None when the native path declined that
    frame (the caller decodes it via cv2, exactly like ``decode()``
    returning None). When the native library is unavailable every frame
    yields None — callers degrade to synchronous decode, never break.
    """

    def __init__(self, paths, capacity: int = 4, threads: int = 3):
        self._paths = [str(p) for p in paths]
        self._lib = get_lib()
        self._handle = None
        if self._lib is not None and self._paths:
            n = len(self._paths)
            arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in self._paths])
            self._handle = self._lib.tin_loader_create(
                arr,
                np.int32(n),
                np.int32(max(1, int(capacity))),
                np.int32(max(1, int(threads))),
            )

    def __len__(self) -> int:
        return len(self._paths)

    def __iter__(self):
        try:
            for _ in self._paths:
                # re-read the handle each step: close() while the iterator
                # is suspended must degrade to None frames, never touch a
                # destroyed loader
                handle = self._handle
                if handle is None:
                    yield None
                    continue
                data = ctypes.POINTER(ctypes.c_uint8)()
                w = ctypes.c_int32()
                h = ctypes.c_int32()
                ch = ctypes.c_int32()
                depth = ctypes.c_int32()
                rc = self._lib.tin_loader_next(
                    handle,
                    ctypes.byref(data),
                    ctypes.byref(w),
                    ctypes.byref(h),
                    ctypes.byref(ch),
                    ctypes.byref(depth),
                )
                if rc != 0:
                    yield None
                    continue
                yield _unpack_frame(
                    self._lib, data, w.value, h.value, ch.value, depth.value
                )
        finally:
            self.close()

    def close(self) -> None:
        if self._handle is not None:
            self._lib.tin_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
