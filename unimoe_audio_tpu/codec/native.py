"""ctypes bindings for the native hostlib (native/hostlib.cpp).

Builds the shared library on first use (g++ -O3 -march=native) and caches
it next to the source; every entry point has a numpy/scipy fallback so the
framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "native", "hostlib.cpp")
    so = os.path.join(root, "native", "hostlib.so")
    try:
        if not os.path.isfile(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(so)
        lib.pcm16_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.f32_to_pcm16.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.mixdown.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_int32]
        lib.resample_poly.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.resample_poly.restype = ctypes.c_int64
        lib.collate_pad_i64.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_void_p,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def pcm16_to_f32(pcm: np.ndarray) -> np.ndarray:
    lib = _build_and_load()
    pcm = np.ascontiguousarray(pcm, dtype="<i2")
    if lib is None:
        return pcm.astype(np.float32) / 32768.0
    out = np.empty(pcm.shape, dtype=np.float32)
    lib.pcm16_to_f32(pcm.ctypes.data, out.ctypes.data, pcm.size)
    return out


def f32_to_pcm16(audio: np.ndarray) -> np.ndarray:
    lib = _build_and_load()
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    if lib is None:
        return (np.clip(audio, -1.0, 1.0) * 32767.0).round().astype("<i2")
    out = np.empty(audio.shape, dtype="<i2")
    lib.f32_to_pcm16(audio.ctypes.data, out.ctypes.data, audio.size)
    return out


def mixdown(interleaved: np.ndarray) -> np.ndarray:
    """[T, C] float32 → [T] mono average."""
    lib = _build_and_load()
    x = np.ascontiguousarray(interleaved, dtype=np.float32)
    if lib is None or x.ndim != 2:
        return x.mean(axis=-1)
    out = np.empty(x.shape[0], dtype=np.float32)
    lib.mixdown(x.ctypes.data, out.ctypes.data, x.shape[0], x.shape[1])
    return out


def resample(audio: np.ndarray, sr_from: int, sr_to: int, taps: int = 32) -> np.ndarray:
    """1-D polyphase resample; scipy fallback."""
    if sr_from == sr_to:
        return np.asarray(audio, dtype=np.float32)
    from math import gcd

    g = gcd(sr_from, sr_to)
    up, down = sr_to // g, sr_from // g
    lib = _build_and_load()
    x = np.ascontiguousarray(audio, dtype=np.float32)
    if lib is None or x.ndim != 1:
        from scipy.signal import resample_poly

        return resample_poly(x, up, down, axis=-1).astype(np.float32)
    cap = (x.shape[0] * up + down - 1) // down
    out = np.empty(cap, dtype=np.float32)
    n = lib.resample_poly(x.ctypes.data, x.shape[0], out.ctypes.data, cap,
                          up, down, taps)
    return out[:n]


def collate_pad(seqs, pad_value: int, max_len: Optional[int] = None) -> np.ndarray:
    """List of 1-D int sequences → [n, max_len] int64, right-padded."""
    lengths = np.asarray([len(s) for s in seqs], dtype=np.int64)
    T = int(lengths.max()) if max_len is None else max_len
    out = np.full((len(seqs), T), pad_value, dtype=np.int64)
    lib = _build_and_load()
    if lib is None:
        for i, s in enumerate(seqs):
            n = min(len(s), T)
            out[i, :n] = np.asarray(s[:n], dtype=np.int64)
        return out
    flat = np.ascontiguousarray(np.concatenate([
        np.asarray(s, dtype=np.int64) for s in seqs
    ]) if len(seqs) else np.zeros(0, np.int64))
    lib.collate_pad_i64(flat.ctypes.data, lengths.ctypes.data, len(seqs), T,
                        out.ctypes.data)
    return out
