"""ctypes binding for the native corpus reader (csrc/dataio/dataio.cc).

``NativeCompactDataset`` assembles whole {text, loss_mask} batches in C++
(mmap + multithreaded template expansion) — a drop-in fast path for the
CompactBinary format used by ``BatchIterator``; Python fallback otherwise.
"""

from __future__ import annotations

import ctypes
import os
import numpy as np

_LIB_PATHS = (os.path.join(os.path.dirname(__file__), "..", "lib", "libdataio.so"),)
_LIB = None


def get_lib():
    global _LIB
    if _LIB is None:
        for p in _LIB_PATHS:
            p = os.path.abspath(p)
            if os.path.exists(p):
                lib = ctypes.CDLL(p)
                lib.dio_open.restype = ctypes.c_void_p
                lib.dio_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
                lib.dio_num_samples.restype = ctypes.c_int64
                lib.dio_num_samples.argtypes = [ctypes.c_void_p]
                lib.dio_fill_batch.restype = ctypes.c_int
                lib.dio_fill_batch.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                    ctypes.c_int32, ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int,
                ]
                lib.dio_close.argtypes = [ctypes.c_void_p]
                _LIB = lib
                break
    return _LIB


def available() -> bool:
    return get_lib() is not None


class NativeCompactDataset:
    """Batch-level reader for CompactBinary corpora (native assembly)."""

    def __init__(self, path: str, tokenizer, max_len: int = 1089,
                 length_per_sample: int = 64 + 1024, text_region: int = 64,
                 n_threads: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("libdataio.so not built; run `make -C csrc`")
        self._lib = lib
        self._h = lib.dio_open(path.encode(), length_per_sample)
        if not self._h:
            raise IOError(f"cannot open {path}")
        self.n = int(lib.dio_num_samples(self._h))
        self.max_len = max_len
        self.text_region = text_region
        self.n_threads = n_threads
        self._ids = (
            tokenizer["[ROI1]"], tokenizer["[BASE]"], tokenizer["[BOI1]"],
            tokenizer["[EOI1]"], tokenizer["[PAD]"],
        )

    def __len__(self):
        return self.n

    def batch(self, indices: np.ndarray):
        indices = np.ascontiguousarray(indices, np.int64)
        B = len(indices)
        text = np.empty((B, self.max_len), np.int32)
        mask = np.empty((B, self.max_len), np.float32)
        roi1, base, boi1, eoi1, pad = self._ids
        rc = self._lib.dio_fill_batch(
            self._h,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            B, self.text_region, self.max_len,
            roi1, base, boi1, eoi1, pad,
            text.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads,
        )
        if rc != 0:
            raise IndexError("dio_fill_batch failed (index out of range?)")
        return {"text": text, "loss_mask": mask}

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.dio_close(self._h)
        except Exception:
            pass
