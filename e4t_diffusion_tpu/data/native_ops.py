"""ctypes bindings for the C++ fused image-preprocess kernel.

Loads native/libe4t_image.so (auto-building it with make on first use if a
toolchain is present); ``available()`` gates graceful fallback to the
cv2/numpy path in data/dataset.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libe4t_image.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            print(f"[native_ops] build skipped: {e}")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        print(f"[native_ops] load failed: {e}")
        return None
    lib.fused_preprocess.restype = ctypes.c_int
    lib.fused_preprocess.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.resized_dims.restype = None
    lib.resized_dims.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def resized_dims(h: int, w: int, target: int) -> Tuple[int, int]:
    lib = _load()
    rh, rw = ctypes.c_int(), ctypes.c_int()
    lib.resized_dims(h, w, target, ctypes.byref(rh), ctypes.byref(rw))
    return rh.value, rw.value


def fused_preprocess(image: np.ndarray, target: int, crop_top: int,
                     crop_left: int, flip: bool) -> np.ndarray:
    """uint8 HWC RGB -> float32 CHW in [-1, 1]; resize short side to
    ``target`` (area), crop at (crop_top, crop_left), optional hflip."""
    lib = _load()
    assert lib is not None
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w = image.shape[:2]
    out = np.empty((3, target, target), np.float32)
    rc = lib.fused_preprocess(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        target, crop_top, crop_left, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(
            f"fused_preprocess failed (h={h}, w={w}, target={target}, "
            f"crop=({crop_top},{crop_left}))")
    return out


def make_native_transform(size: int, random_crop_flag: bool = False,
                          hflip: bool = True, seed: int = 0):
    """Drop-in replacement for data.dataset.make_transform backed by the
    C++ kernel."""
    rng = np.random.default_rng(seed)

    def apply(image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        rh, rw = resized_dims(h, w, size)
        if random_crop_flag:
            top = int(rng.integers(0, rh - size + 1))
            left = int(rng.integers(0, rw - size + 1))
        else:
            top = (rh - size) // 2
            left = (rw - size) // 2
        flip = bool(hflip and rng.random() < 0.5)
        return fused_preprocess(image, size, top, left, flip)

    return apply
