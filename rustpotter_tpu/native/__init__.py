"""ctypes bindings for the C++ native ingest library (native/ingest.cpp).

Provides the high-throughput host front-end: PCM decode, downmix, WAV parse,
polyphase resampling, frame RMS. Falls back to the pure-Python implementations
when the shared library hasn't been built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libtpotter_ingest.so",
)

_lib = None


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("bits_per_sample", ctypes.c_int32),
        ("is_float", ctypes.c_int32),
        ("data_offset", ctypes.c_int64),
        ("data_bytes", ctypes.c_int64),
    ]


def _try_build() -> None:
    """Build the shared library in-tree (one g++ invocation, ~1 s). Disabled
    with RUSTPOTTER_NO_NATIVE_BUILD=1."""
    if os.environ.get("RUSTPOTTER_NO_NATIVE_BUILD") == "1":
        return
    src_dir = os.path.dirname(_LIB_PATH)
    if not os.path.exists(os.path.join(src_dir, "ingest.cpp")):
        return
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", src_dir],
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=120,
        )
    except Exception:
        pass


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rp_decode_pcm.restype = ctypes.c_int64
    lib.rp_decode_pcm.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rp_downmix_first.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rp_wav_parse.restype = ctypes.c_int
    lib.rp_wav_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_WavInfo)]
    lib.rp_resampler_new.restype = ctypes.c_void_p
    lib.rp_resampler_new.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.rp_resampler_free.argtypes = [ctypes.c_void_p]
    lib.rp_resampler_reset.argtypes = [ctypes.c_void_p]
    lib.rp_resampler_process.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.rp_rms_level.restype = ctypes.c_float
    lib.rp_rms_level.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


_FMT = {"i8": 0, "i16": 1, "i32": 2, "f32": 3}


def decode_pcm(data: bytes, fmt: str, big_endian: bool = False) -> np.ndarray:
    lib = load_library()
    bps = {"i8": 1, "i16": 2, "i32": 4, "f32": 4}[fmt]
    out = np.empty(len(data) // bps, np.float32)
    n = lib.rp_decode_pcm(
        data, len(data), _FMT[fmt], 1 if big_endian else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:n]


def wav_parse(data: bytes):
    lib = load_library()
    info = _WavInfo()
    if lib.rp_wav_parse(data, len(data), ctypes.byref(info)) != 0:
        raise ValueError("not a RIFF/WAVE file")
    return info


class NativeResampler:
    """Polyphase fixed-ratio resampler (time-domain evaluation of the same
    anti-aliasing taps as audio/resampler.py; agrees to ~1e-5, used for bulk
    ingest where golden exactness is not required)."""

    def __init__(self, n_in: int, n_out: int):
        self._lib = load_library()
        self._handle = self._lib.rp_resampler_new(n_in, n_out)
        self.n_in, self.n_out = n_in, n_out

    def process(self, chunk: np.ndarray) -> np.ndarray:
        chunk = np.ascontiguousarray(chunk, np.float32)
        out = np.empty(self.n_out, np.float32)
        self._lib.rp_resampler_process(
            self._handle,
            chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out

    def reset(self) -> None:
        self._lib.rp_resampler_reset(self._handle)

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.rp_resampler_free(self._handle)
            self._handle = None


def rms_level(x: np.ndarray) -> float:
    lib = load_library()
    x = np.ascontiguousarray(x, np.float32)
    return float(lib.rp_rms_level(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x)))
