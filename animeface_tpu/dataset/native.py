'''ctypes bindings for the native C++ decode pipeline (native/animeface_io.cpp).

TPU-native counterpart of the reference's torch DataLoader worker pool
(reference `dataset/_base.py:46` asloader): JPEG/PNG decode, shorter-edge
resize, center crop, random hflip and [-1,1] normalization all run in native
threads, returning a ready NHWC float32 batch.

The library is optional: `available()` is False when the .so is absent and
callers fall back to the PIL path. Build with `make -C native` (or
`build()` here).
'''

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.environ.get(
    'ANIMEFACE_NATIVE_IO',
    os.path.join(_REPO_ROOT, 'native', 'libanimeface_io.so'))

_lib = None
_lock = threading.Lock()


def build() -> bool:
    '''Compile native/libanimeface_io.so in-tree. Returns success.'''
    native_dir = os.path.join(_REPO_ROOT, 'native')
    if not os.path.isdir(native_dir):
        return False
    try:
        subprocess.run(['make', '-C', native_dir], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            build()
        if not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.af_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.af_load_image.restype = ctypes.c_int
        lib.af_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)]
        lib.af_load_batch.restype = ctypes.c_int
        lib.af_num_workers.argtypes = []
        lib.af_num_workers.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def num_workers() -> int:
    lib = _load()
    return lib.af_num_workers() if lib is not None else 0


def load_image(path: str, size: int, resize_scale: float = 1.,
               hflip: bool = False) -> np.ndarray | None:
    '''Decode one file to [size, size, 3] float32 in [-1, 1]; None on failure.'''
    lib = _load()
    if lib is None:
        return None
    out = np.empty((size, size, 3), dtype=np.float32)
    rc = lib.af_load_image(
        path.encode(), size, float(resize_scale), int(hflip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def load_batch(paths, size: int, resize_scale: float = 1.,
               hflip_mask=None) -> tuple[np.ndarray, np.ndarray] | None:
    '''Decode a batch in parallel native threads.

    Returns (batch [N,size,size,3] float32 in [-1,1], fail [N] uint8) or
    None when the native library is unavailable. Failed samples are
    zero-filled and flagged.
    '''
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), dtype=np.float32)
    fail = np.zeros((n,), dtype=np.uint8)
    if hflip_mask is None:
        mask = np.zeros((n,), dtype=np.uint8)
    else:
        mask = np.ascontiguousarray(np.asarray(hflip_mask, dtype=np.uint8))
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.af_load_batch(
        c_paths, n, size, float(resize_scale),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fail.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, fail
