"""ctypes binding for the native host data runtime (libvast_runtime.so).

Builds on first import (make, ~1 s) and caches the .so; falls back
cleanly when the toolchain or libjpeg is unavailable — callers check
``available()`` and use the PIL/wave paths otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvast_runtime.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH)
        < os.path.getmtime(os.path.join(_DIR, "vast_runtime.cpp"))
    ):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.vrt_version.restype = ctypes.c_int
    if lib.vrt_version() != 1:
        return None
    lib.vrt_decode_image_batch.restype = ctypes.c_int
    lib.vrt_decode_image_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.vrt_load_wav_batch.restype = ctypes.c_int
    lib.vrt_load_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _paths_array(paths: list[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_image_batch(paths: list[str], target: int,
                       n_threads: int = 8):
    """JPEG files -> (n, target, target, 3) uint8 + ok flags."""
    lib = _load()
    n = len(paths)
    out = np.zeros((n, target, target, 3), np.uint8)
    ok = np.zeros(n, np.int32)
    lib.vrt_decode_image_batch(
        _paths_array(paths), n, target,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    return out, ok.astype(bool)


def load_wav_batch(paths: list[str], num_samples: int,
                   n_threads: int = 8):
    """WAV files -> (n, num_samples) float32 int16-scale @16 kHz + valid."""
    lib = _load()
    n = len(paths)
    out = np.zeros((n, num_samples), np.float32)
    valid = np.zeros(n, np.int32)
    lib.vrt_load_wav_batch(
        _paths_array(paths), n, num_samples,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    return out, valid
