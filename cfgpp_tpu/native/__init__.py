"""ctypes bindings for the native IO layer, with build-on-first-use.

`AsyncPngWriter` overlaps PNG encoding + disk writes with device compute
(used by the MS-COCO generation loop).  If no compiler/library is available
the same API transparently falls back to synchronous PIL saves.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SO = _HERE / "libimageio.so"
_SRC = _HERE / "imageio.cpp"


def _build() -> Optional[Path]:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO), str(_SRC),
             "-lz", "-lpng", "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    if not _SO.exists() and os.environ.get("CFGPP_NO_NATIVE") != "1":
        _build()
    if not _SO.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.imageio_save_png.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_int, ctypes.c_int]
    lib.imageio_save_png.restype = ctypes.c_int
    lib.imageio_pool_create.argtypes = [ctypes.c_int]
    lib.imageio_pool_create.restype = ctypes.c_void_p
    lib.imageio_pool_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.imageio_pool_submit.restype = ctypes.c_int
    lib.imageio_pool_wait.argtypes = [ctypes.c_void_p]
    lib.imageio_pool_wait.restype = ctypes.c_int
    lib.imageio_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.imageio_read_pool_create.argtypes = [ctypes.c_int]
    lib.imageio_read_pool_create.restype = ctypes.c_void_p
    lib.imageio_read_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.imageio_read_submit.restype = ctypes.c_int
    lib.imageio_read_dims.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_uint32),
                                      ctypes.POINTER(ctypes.c_uint32)]
    lib.imageio_read_dims.restype = ctypes.c_int
    lib.imageio_read_copy.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_char_p]
    lib.imageio_read_copy.restype = ctypes.c_int
    lib.imageio_read_pool_destroy.argtypes = [ctypes.c_void_p]
    return lib


_LIB = None
_TRIED = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = _load()
        _TRIED = True
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _to_rgb_u8(img: np.ndarray) -> np.ndarray:
    """float [H,W,3] in [0,1] (or uint8) -> contiguous uint8 RGB."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return np.ascontiguousarray(arr)


def save_png_native(path, img: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    arr = _to_rgb_u8(img)
    h, w, _ = arr.shape
    rc = lib.imageio_save_png(str(path).encode(), arr.ctypes.data_as(ctypes.c_char_p),
                              h, w)
    return rc == 0


class AsyncPngWriter:
    """Fire-and-forget PNG writer.  `submit` copies the pixels and returns
    immediately; `wait` blocks until everything is on disk."""

    def __init__(self, n_threads: int = 4):
        self._lib = get_lib()
        self._pool = (self._lib.imageio_pool_create(n_threads)
                      if self._lib is not None else None)

    @property
    def is_native(self) -> bool:
        return self._pool is not None

    def submit(self, path, img: np.ndarray) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        arr = _to_rgb_u8(img)
        if self._pool is not None:
            h, w, _ = arr.shape
            self._lib.imageio_pool_submit(
                self._pool, str(path).encode(),
                arr.ctypes.data_as(ctypes.c_char_p), h, w)
        else:
            from PIL import Image
            Image.fromarray(arr).save(path)

    def wait(self) -> int:
        """Block until writes finish; returns number of failed writes."""
        if self._pool is not None:
            return self._lib.imageio_pool_wait(self._pool)
        return 0

    def close(self) -> None:
        if self._pool is not None:
            self._lib.imageio_pool_wait(self._pool)
            self._lib.imageio_pool_destroy(self._pool)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class AsyncPngReader:
    """Threaded PNG decoder pool — the data-loader analog of the
    reference's `DataLoader(num_workers=4)` metrics ingestion
    (utils/calculate_metrics.py:98-102).  Decodes ahead on C++ threads
    while Python consumes results in submission order; non-PNG files (or
    a missing native lib) transparently fall back to PIL per image."""

    def __init__(self, paths, n_threads: int = 8, window: int = 64):
        self._paths = [str(p) for p in paths]
        self._lib = get_lib()
        self._pool = (self._lib.imageio_read_pool_create(n_threads)
                      if self._lib is not None else None)
        # bounded prefetch: only `window` decodes may run ahead of the
        # consumer, so a 10k-image directory never buffers gigabytes
        self._window = max(window, n_threads)
        self._submitted = 0
        if self._pool is not None:
            self._fill(0)

    def _fill(self, consumed: int) -> None:
        hi = min(consumed + self._window, len(self._paths))
        while self._submitted < hi:
            self._lib.imageio_read_submit(
                self._pool, self._paths[self._submitted].encode())
            self._submitted += 1

    @property
    def is_native(self) -> bool:
        return self._pool is not None

    def _pil(self, path) -> np.ndarray:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"), np.uint8)

    def get(self, i: int) -> np.ndarray:
        """RGB uint8 [H, W, 3] for the i-th submitted path (blocks until
        its decode finishes)."""
        if self._pool is None:
            return self._pil(self._paths[i])
        self._fill(i + 1)
        if i >= self._submitted:
            # out-of-order access beyond the prefetch window
            return self._pil(self._paths[i])
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        rc = self._lib.imageio_read_dims(self._pool, i,
                                         ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            return self._pil(self._paths[i])
        out = np.empty((h.value, w.value, 3), np.uint8)
        rc = self._lib.imageio_read_copy(self._pool, i,
                                         out.ctypes.data_as(ctypes.c_char_p))
        if rc != 0:
            return self._pil(self._paths[i])
        return out

    def __iter__(self):
        for i in range(len(self._paths)):
            yield self.get(i)

    def close(self) -> None:
        if self._pool is not None:
            self._lib.imageio_read_pool_destroy(self._pool)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
