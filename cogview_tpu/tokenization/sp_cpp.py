"""ctypes binding for the native SentencePiece runtime (csrc/spm/spm.cc).

``CppTextTokenizer`` is API-compatible with the Python ``TextTokenizer``;
ids are byte-identical (tests/test_native.py asserts this on a corpus).
Build with ``make -C csrc``; falls back to None when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterable, List

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "lib", "libspm.so"),
)


def _load_lib():
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.spm_load.restype = ctypes.c_void_p
            lib.spm_load.argtypes = [ctypes.c_char_p]
            lib.spm_vocab_size.argtypes = [ctypes.c_void_p]
            lib.spm_encode.restype = ctypes.c_int
            lib.spm_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ]
            lib.spm_decode.restype = ctypes.c_int
            lib.spm_decode.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.spm_piece_to_id.restype = ctypes.c_int
            lib.spm_piece_to_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.spm_free.argtypes = [ctypes.c_void_p]
            return lib
    return None


_LIB = None


def get_lib():
    global _LIB
    if _LIB is None:
        _LIB = _load_lib()
    return _LIB


def available() -> bool:
    return get_lib() is not None


class CppTextTokenizer:
    def __init__(self, model_path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("libspm.so not built; run `make -C csrc`")
        self._lib = lib
        self._m = lib.spm_load(model_path.encode())
        if not self._m:
            raise IOError(f"cannot load {model_path}")
        self.num_tokens = lib.spm_vocab_size(self._m)

    def encode(self, text: str) -> List[int]:
        data = text.encode("utf-8")
        cap = max(64, 2 * len(data) + 8)
        buf = (ctypes.c_int32 * cap)()
        n = self._lib.spm_encode(self._m, data, buf, cap)
        if n > cap:  # extremely long text: retry with exact size
            buf = (ctypes.c_int32 * n)()
            n = self._lib.spm_encode(self._m, data, buf, n)
        return list(buf[:n])

    def decode(self, ids: Iterable[int]) -> str:
        arr = list(int(t) for t in ids)
        carr = (ctypes.c_int32 * len(arr))(*arr)
        cap = 16 * len(arr) + 16
        out = ctypes.create_string_buffer(cap)
        n = self._lib.spm_decode(self._m, carr, len(arr), out, cap)
        if n >= cap:
            out = ctypes.create_string_buffer(n + 1)
            self._lib.spm_decode(self._m, carr, len(arr), out, n + 1)
        return out.value.decode("utf-8", errors="replace")

    def convert_token_to_id(self, piece: str) -> int:
        i = self._lib.spm_piece_to_id(self._m, piece.encode())
        return i if i >= 0 else 0

    def tokenize(self, text: str) -> List[str]:
        # pieces via ids (surface strings are id-addressable)
        raise NotImplementedError("use the Python tokenizer for piece strings")

    def __len__(self) -> int:
        return self.num_tokens

    def __del__(self):
        try:
            if getattr(self, "_m", None):
                self._lib.spm_free(self._m)
        except Exception:
            pass
