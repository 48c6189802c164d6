"""FLAC reading through the native C++ decoder.

The reference reads FLAC via libsndfile/soundfile
(`classes/signal.py:106`); here the decode runs in
`dsptoolbox_tpu/native/flac_decoder.cpp`, compiled on first use with g++
and bound with ctypes (pybind11 is not available in this environment).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "flac_decoder.cpp")

_lib = None
_lib_lock = threading.Lock()


def _build_library() -> str:
    """Compile the decoder into a shared object (cached next to the
    source; falls back to a per-user temp dir if the package directory is
    read-only)."""
    candidates = [
        os.path.join(_NATIVE_DIR, "libflacdec.so"),
        os.path.join(
            "/tmp", f"dsptoolbox_tpu_native_{os.getuid()}", "libflacdec.so"
        ),
    ]
    for so_path in candidates:
        if os.path.exists(so_path) and os.path.getmtime(
            so_path
        ) >= os.path.getmtime(_SRC):
            return so_path
    last_error: Exception | None = None
    for so_path in candidates:
        try:
            os.makedirs(os.path.dirname(so_path), exist_ok=True)
            tmp = so_path + ".tmp"
            subprocess.run(
                [
                    "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                    "-o", tmp, _SRC,
                ],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
            return so_path
        except (OSError, subprocess.CalledProcessError) as e:
            last_error = e
    raise RuntimeError(
        f"Could not build native FLAC decoder: {last_error}"
    )


def _get_lib():
    global _lib
    with _lib_lock:
        if _lib is None:
            lib = ctypes.CDLL(_build_library())
            lib.flac_probe.restype = ctypes.c_int
            lib.flac_probe.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.flac_decode.restype = ctypes.c_int
            lib.flac_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
    return _lib


def read_flac(path: str) -> tuple[np.ndarray, int]:
    """Decode a FLAC file → (float64 in [-1, 1), sampling rate).

    Mono files return shape ``(samples,)``, multichannel
    ``(samples, channels)`` — matching ``soundfile.read``.
    """
    lib = _get_lib()
    with open(path, "rb") as f:
        raw = f.read()
    total = ctypes.c_uint64()
    channels = ctypes.c_uint32()
    rate = ctypes.c_uint32()
    bps = ctypes.c_uint32()
    rc = lib.flac_probe(
        raw, len(raw),
        ctypes.byref(total), ctypes.byref(channels),
        ctypes.byref(rate), ctypes.byref(bps),
    )
    if rc != 0:
        raise ValueError(f"Invalid FLAC stream ({rc}): {path}")
    n, ch = int(total.value), int(channels.value)
    out = np.empty(n * ch, dtype=np.int32)
    rc = lib.flac_decode(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed ({rc}): {path}")
    scale = float(1 << (int(bps.value) - 1))
    data = out.astype(np.float64) / scale
    if ch > 1:
        data = data.reshape(n, ch)
    return data, int(rate.value)
