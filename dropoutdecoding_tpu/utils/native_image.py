"""ctypes bindings + threaded prefetch loader for the native image
pipeline (native/ddtpu_image.cpp).

``NativeImageOps`` exposes decode/resize/normalize; ``PrefetchLoader``
overlaps host-side image preparation with device compute using a thread
pool (the C functions release the GIL during the heavy loops because they
are pure C calls through ctypes).

Everything degrades gracefully to the PIL path
(utils/processor.ClipImagePreprocessor) when the library can't build.

Numerical note: resampling matches PIL's bicubic coefficients exactly but
keeps a float intermediate between the two passes where PIL rounds to
uint8, so outputs may differ from PIL by ±1/255 per channel — far inside
model noise.
"""
from __future__ import annotations

import ctypes
import os
import queue
import threading

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        import sys

        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        sys.path.insert(0, os.path.join(repo_root, "native"))
        try:
            from build import build as _build  # type: ignore
        finally:
            sys.path.pop(0)
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.ddtpu_decode_jpeg.restype = ctypes.c_int
        lib.ddtpu_decode_jpeg.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.ddtpu_resize_bicubic.restype = None
        lib.ddtpu_resize_bicubic.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_long,
        ]
        lib.ddtpu_normalize_chw.restype = None
        lib.ddtpu_normalize_chw.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except Exception as e:  # pragma: no cover
        print(f"native image pipeline unavailable: {e}")
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


MAX_PIXELS = 64 * 1024 * 1024


def decode_jpeg(data: bytes) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(MAX_PIXELS * 3, np.uint8)
    h = ctypes.c_long()
    w = ctypes.c_long()
    rc = lib.ddtpu_decode_jpeg(
        data,
        len(data),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        MAX_PIXELS,
        ctypes.byref(h),
        ctypes.byref(w),
    )
    if rc != 0:
        return None
    return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def resize_bicubic(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((dh, dw, 3), np.uint8)
    lib.ddtpu_resize_bicubic(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0],
        img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dh,
        dw,
    )
    return out


def normalize_chw(
    img: np.ndarray, mean, std, top=0, left=0, ch=None, cw=None
) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    ch = ch or h
    cw = cw or w
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((3, ch, cw), np.float32)
    lib.ddtpu_normalize_chw(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, top, left, ch, cw,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


class NativeClipPreprocessor:
    """Native equivalent of utils.processor.ClipImagePreprocessor:
    decode -> shortest-edge resize -> center crop -> normalize CHW."""

    def __init__(self, size=336, crop_size=None, mean=None, std=None):
        from .processor import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD

        self.size = size
        self.crop = crop_size or size
        self.mean = np.asarray(mean if mean is not None else OPENAI_CLIP_MEAN, np.float32)
        self.std = np.asarray(std if std is not None else OPENAI_CLIP_STD, np.float32)

    def from_file(self, path: str) -> np.ndarray:
        with open(path, "rb") as f:
            data = f.read()
        img = decode_jpeg(data)
        if img is None:  # non-JPEG or failure: PIL fallback decode
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB"))
        h, w = img.shape[:2]
        # HF semantics: shortest edge -> size; long edge truncated
        if w <= h:
            nw, nh = self.size, int(self.size * h / w)
        else:
            nh, nw = self.size, int(self.size * w / h)
        img = resize_bicubic(img, nh, nw)
        top = (nh - self.crop) // 2
        left = (nw - self.crop) // 2
        return normalize_chw(img, self.mean, self.std, top, left, self.crop, self.crop)


class PrefetchLoader:
    """Threaded prefetcher: keeps `depth` preprocessed images ready while
    the device computes (the reference's per-image loop is fully serial)."""

    def __init__(self, paths, preprocess_fn, depth: int = 4, workers: int = 2):
        self.paths = list(paths)
        self.fn = preprocess_fn
        self.out = queue.Queue(maxsize=depth)
        self._idx = 0
        self._lock = threading.Lock()
        self.workers = [
            threading.Thread(target=self._work, daemon=True) for _ in range(workers)
        ]
        self._results = {}
        self._next_emit = 0
        self._cv = threading.Condition()
        for t in self.workers:
            t.start()

    def _work(self):
        while True:
            with self._lock:
                if self._idx >= len(self.paths):
                    return
                i = self._idx
                self._idx += 1
            try:
                res = self.fn(self.paths[i])
            except Exception as e:
                res = e
            with self._cv:
                self._results[i] = res
                self._cv.notify_all()

    def __iter__(self):
        for i in range(len(self.paths)):
            with self._cv:
                while i not in self._results:
                    self._cv.wait()
                res = self._results.pop(i)
            if isinstance(res, Exception):
                raise res
            yield self.paths[i], res
