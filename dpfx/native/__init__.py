"""ctypes bindings + lazy build for the native C++ batch loader
(dpfx/native/src/dpfx_loader.cpp; SURVEY.md §2 C4 native equivalent).

The library builds on first use with g++ (cached next to the source,
keyed by a source hash); everything degrades gracefully to the numpy
loader when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "dpfx_loader.cpp")
_LIB_CACHE: Optional[ctypes.CDLL] = None
_BUILD_ERR: Optional[str] = None


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(os.path.dirname(_SRC), f"libdpfx_loader_{h}.so")


def build_native(verbose: bool = False) -> Optional[str]:
    """Compile the loader if needed; returns .so path or None on failure."""
    global _BUILD_ERR
    path = _lib_path()
    if os.path.exists(path):
        return path
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", path,
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        _BUILD_ERR = str(e)
        return None
    if out.returncode != 0:
        _BUILD_ERR = out.stderr[-2000:]
        if verbose:
            print(f"[dpfx.native] build failed:\n{_BUILD_ERR}")
        return None
    return path


def _load() -> Optional[ctypes.CDLL]:
    global _LIB_CACHE
    if _LIB_CACHE is not None:
        return _LIB_CACHE
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.dpfx_batcher_open.restype = ctypes.c_void_p
    lib.dpfx_batcher_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.dpfx_batcher_shape.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.dpfx_batcher_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
    ]
    lib.dpfx_batcher_close.argtypes = [ctypes.c_void_p]
    _LIB_CACHE = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    return _BUILD_ERR


class NativeBatcher:
    """Threaded native batch producer over a packed .npy cloud stack
    (see tools/pack_dataset.py). Yields {"x": [B, n_points, 3]} like
    dpfx.data.iterate_batches, with batch prep fully off the Python thread.

    ``normalize`` defaults to ``"none"`` because packed stacks written by
    tools/pack_dataset.py already carry the dataset-level normalization (the
    sidecar ``<path>.meta.json`` records which); re-normalizing here would
    silently shift the frame — and note the native ``per_shape`` path
    normalizes *after* point subsampling, unlike the Python datasets which
    normalize the full stored cloud. A conflicting setting against the
    sidecar raises."""

    def __init__(
        self,
        npy_path: str,
        batch_size: int,
        n_points: int,
        normalize: str = "none",
        seed: int = 0,
        n_workers: int = 4,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_BUILD_ERR}")
        meta_path = npy_path + ".meta.json"
        if os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                meta = json.load(f)
            pre = meta.get("normalize_applied", "none")
            if pre != "none" and normalize != "none":
                raise ValueError(
                    f"packed stack {npy_path} was written with "
                    f"normalize={pre!r} already applied (per its sidecar "
                    f"{meta_path}); requesting normalize={normalize!r} here "
                    f"would double-normalize — pass normalize='none'"
                )
        self._lib = lib
        err = ctypes.create_string_buffer(512)
        norm = {"none": 0, "per_shape": 1}[normalize]
        self._h = lib.dpfx_batcher_open(
            npy_path.encode(), batch_size, n_points, norm, seed, n_workers, err, 512
        )
        if not self._h:
            raise RuntimeError(f"dpfx_batcher_open: {err.value.decode()}")
        shape = (ctypes.c_int64 * 3)()
        lib.dpfx_batcher_shape(self._h, shape)
        self.n_items, self.n_stored, self.n_coords = map(int, shape)
        self.batch_size = batch_size
        self.n_points = n_points
        self._buf = np.empty((batch_size, n_points, self.n_coords), np.float32)

    def next(self) -> np.ndarray:
        self._lib.dpfx_batcher_next(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return self._buf.copy()

    def __iter__(self) -> Iterator[dict]:
        while True:
            yield {"x": self.next()}

    def close(self) -> None:
        if self._h:
            self._lib.dpfx_batcher_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
