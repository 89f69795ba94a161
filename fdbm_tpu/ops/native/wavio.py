"""ctypes bindings for the native WAV decode / crop / normalise library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wavio.cc")
_SO = os.path.join(_HERE, "libfdbm_wavio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int)]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_read_f32.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.wav_read_f32.restype = ctypes.c_longlong
        lib.load_crop_pair.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
        lib.load_crop_pair.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def read_wav_native(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Decode channel 0 of a WAV file -> (float32 [L], sr); None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    frames = ctypes.c_longlong()
    bits = ctypes.c_int()
    if lib.wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                    ctypes.byref(frames), ctypes.byref(bits)) != 0:
        return None
    out = np.empty(frames.value, np.float32)
    n = lib.wav_read_f32(path.encode(), out, frames.value,
                         ctypes.byref(sr), ctypes.byref(ch))
    if n < 0:
        return None
    return out[:n], sr.value


_NORM_MODES = {"noisy": 0, "clean": 1, "not": 2, "std": 3}


def load_crop_pair_native(clean_path: str, noisy_path: str, target_len: int,
                          start: int, normalize: str
                          ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """One fused native call: decode both wavs, crop/pad, normalise.
    start=-1 means centre crop. Returns None if the library is missing or
    the format is unsupported (caller falls back to python)."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.empty(target_len, np.float32)
    y = np.empty(target_len, np.float32)
    rc = lib.load_crop_pair(clean_path.encode(), noisy_path.encode(),
                            target_len, start, _NORM_MODES[normalize], x, y)
    if rc != 0:
        return None
    return x, y
