"""ctypes bindings for the native C++ runtime (safetensors mmap reader,
WAV codec). Builds the shared library on demand with g++; every caller has a
pure-python fallback, so a missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "safetensors_reader.cpp")
_SO = os.path.join(_DIR, "libqwen3tts_native.so")

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # no numpy bf16: exposed as uint16 + caller view/convert
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U16": np.uint16,
    "U32": np.uint32,
    "U64": np.uint64,
    "BOOL": np.bool_,
}

_lib = None


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
        return _SO
    except Exception:
        return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        raise RuntimeError("native library unavailable (g++ build failed)")
    lib = ctypes.CDLL(so)
    lib.st_open.restype = ctypes.c_void_p
    lib.st_open.argtypes = [ctypes.c_char_p]
    lib.st_num_tensors.restype = ctypes.c_int64
    lib.st_num_tensors.argtypes = [ctypes.c_void_p]
    lib.st_name.restype = ctypes.c_char_p
    lib.st_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_dtype.restype = ctypes.c_char_p
    lib.st_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_ndim.restype = ctypes.c_int64
    lib.st_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_shape.restype = None
    lib.st_shape.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.st_data.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.st_data.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.st_close.restype = None
    lib.st_close.argtypes = [ctypes.c_void_p]
    lib.wav_write.restype = ctypes.c_int
    lib.wav_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
    ]
    lib.wav_read.restype = ctypes.c_int64
    lib.wav_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Zero-copy-parse a safetensors file into numpy arrays.

    bf16 tensors are returned as uint16 views with a `.bf16` marker attribute
    consumed by the loader (converted on the device side).
    """
    lib = _load()
    handle = lib.st_open(path.encode())
    if not handle:
        raise OSError(f"st_open failed: {path}")
    out: dict[str, np.ndarray] = {}
    try:
        n = lib.st_num_tensors(handle)
        if n == 0:
            raise ValueError(f"no tensors parsed from {path}")
        for i in range(n):
            name = lib.st_name(handle, i).decode()
            dtype_s = lib.st_dtype(handle, i).decode()
            ndim = lib.st_ndim(handle, i)
            shape = (ctypes.c_int64 * max(ndim, 1))()
            lib.st_shape(handle, i, shape)
            dims = tuple(shape[d] for d in range(ndim))
            nbytes = ctypes.c_int64()
            ptr = lib.st_data(handle, i, ctypes.byref(nbytes))
            buf = np.ctypeslib.as_array(ptr, shape=(nbytes.value,))
            if dtype_s == "BF16":
                # widen to float32: (uint16 << 16) bitcast
                raw = buf.view(np.uint16).reshape(dims)
                arr = (raw.astype(np.uint32) << 16).view(np.float32)
            else:
                np_dtype = _DTYPES.get(dtype_s)
                if np_dtype is None:
                    raise ValueError(f"{name}: unsupported dtype {dtype_s}")
                arr = buf.view(np_dtype).reshape(dims).copy()
            out[name] = np.ascontiguousarray(arr)
    finally:
        lib.st_close(handle)
    return out


def wav_write(path: str, samples: np.ndarray, rate: int = 24000) -> None:
    lib = _load()
    x = np.ascontiguousarray(samples, np.float32)
    rc = lib.wav_write(
        path.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size, rate
    )
    if rc != 0:
        raise OSError(f"wav_write failed: {path}")


def wav_read(path: str) -> tuple[int, np.ndarray]:
    lib = _load()
    rate = ctypes.c_int32()
    n = lib.wav_read(path.encode(), None, 0, ctypes.byref(rate))
    if n < 0:
        raise OSError(f"wav_read failed: {path}")
    out = np.empty(n, np.float32)
    got = lib.wav_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.byref(rate),
    )
    return int(rate.value), out[: max(got, 0)]
