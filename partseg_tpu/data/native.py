"""ctypes bindings + batched iterator over the native C++ decode pool.

The pool (partseg_native/loader.cc) does JPEG/PNG decode + square crop
+ bilinear resize across N threads with a bounded queue — the
TPU-native stand-in for torch's C++ DataLoader workers (SURVEY.md
§2.2). The .so is built on demand with g++ (no pip/pybind11 in this
image).

Use via make_loader(..., backend="native") in partseg_tpu.data.loader,
or directly:

    with NativePool(out_size=128) as pool:
        batch = pool.load_batch(paths, bboxes)
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Iterator, Sequence

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent / "partseg_native"
_SO = _ROOT / "libpartseg_native.so"
_LOCK = threading.Lock()
_LIB = None


def _load_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not _SO.exists():
            subprocess.run(["sh", str(_ROOT / "build.sh")], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.psn_create.restype = ctypes.c_void_p
        lib.psn_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.psn_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ]
        lib.psn_get.restype = ctypes.c_int
        lib.psn_get.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.psn_pending.restype = ctypes.c_int
        lib.psn_pending.argtypes = [ctypes.c_void_p]
        lib.psn_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


class NativePool:
    """Thin RAII wrapper over the C pool."""

    def __init__(self, out_size: int, n_threads: int = 8, capacity: int = 128):
        self._lib = _load_lib()
        self._h = self._lib.psn_create(n_threads, out_size, capacity)
        self.out_size = out_size

    def submit(self, idx: int, path: str, bbox=None) -> None:
        """bbox: (x, y, w, h) in source pixels or None for center crop."""
        if bbox is None:
            cx = cy = side = -1.0
        else:
            x, y, w, h = bbox
            cx, cy = x + w / 2.0, y + h / 2.0
            side = max(w, h)
        self._lib.psn_submit(
            self._h, idx, str(path).encode(), cx, cy, side
        )

    def get(self) -> tuple[int, np.ndarray | None]:
        """Blocking: returns (idx, [S,S,3] f32 image) or (idx, None) on
        decode failure."""
        buf = np.empty((self.out_size, self.out_size, 3), np.float32)
        idx = ctypes.c_int64()
        rc = self._lib.psn_get(
            self._h, ctypes.byref(idx),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc < 0:
            raise RuntimeError("native pool shut down")
        return int(idx.value), (buf if rc == 1 else None)

    def load_batch(
        self, paths: Sequence, bboxes: Sequence | None = None
    ) -> np.ndarray:
        """Decode a batch in parallel, order-preserving; failed decodes
        come back as zeros."""
        n = len(paths)
        for i, p in enumerate(paths):
            self.submit(i, p, bboxes[i] if bboxes is not None else None)
        out = np.zeros((n, self.out_size, self.out_size, 3), np.float32)
        for _ in range(n):
            idx, img = self.get()
            if img is not None:
                out[idx] = img
        return out

    def close(self):
        if self._h:
            self._lib.psn_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_loader(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_threads: int = 8,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[dict]:
    """Infinite batched iterator over an ImageListDataset using the
    native pool (images only; landmark-annotated eval splits should use
    the Grain path)."""
    paths = list(dataset.paths)
    bboxes = list(dataset.bboxes) if getattr(dataset, "bboxes", None) else None
    idxs = np.arange(len(paths))[process_index::process_count]
    rng = np.random.default_rng(seed)
    pool = NativePool(dataset.size, n_threads=num_threads,
                      capacity=2 * batch_size)
    while True:
        order = rng.permutation(idxs) if shuffle else idxs
        for start in range(0, len(order) - batch_size + 1, batch_size):
            sel = order[start : start + batch_size]
            yield {
                "image": pool.load_batch(
                    [paths[i] for i in sel],
                    [bboxes[i] for i in sel] if bboxes else None,
                )
            }
