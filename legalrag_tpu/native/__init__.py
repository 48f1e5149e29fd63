"""ctypes bindings for the native host-ops library.

``libhostops.so`` (built from ``native/hostops.cpp`` with ``make -C native``)
provides C-speed versions of the host hot loops: batch FNV-1a hashing,
sketch accumulation, ASCII tokenization. Every binding has a pure
numpy/python fallback with identical outputs (tested bit-exact), so the
framework runs with or without the compiled library; ``available()``
reports which path is active.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = (
    Path(__file__).resolve().parent.parent.parent / "native" / "libhostops.so",
)

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    for path in _LIB_PATHS:
        if path.exists():
            try:
                lib = ctypes.CDLL(str(path))
                lib.fnv1a64_batch.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_uint64, ctypes.c_void_p]
                lib.sketch_accumulate.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_void_p]
                lib.tokenize_ascii.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_int64]
                lib.tokenize_ascii.restype = ctypes.c_int64
                _lib = lib
                break
            except OSError:
                continue
    return _lib


def available() -> bool:
    return _load() is not None


def fnv1a64_batch(feats: List[str], seed: int = 0) -> np.ndarray:
    """C-speed batch FNV-1a; bit-exact with tokenize.fnv1a."""
    lib = _load()
    if lib is None:
        from legalrag_tpu.tokenize.tokenizers import fnv1a_batch

        return fnv1a_batch(feats, seed)
    n = len(feats)
    if n == 0:
        return np.zeros(0, np.uint64)
    bs = [f.encode("utf-8") for f in feats]
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(b) for b in bs], out=offsets[1:])
    data = np.frombuffer(b"".join(bs), np.uint8)
    out = np.empty(n, np.uint64)
    lib.fnv1a64_batch(
        data.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n), ctypes.c_uint64(seed & (2**64 - 1)),
        out.ctypes.data_as(ctypes.c_void_p))
    return out


def sketch_accumulate(hashes: np.ndarray, rows: np.ndarray, n_rows: int,
                      sketch_dim: int) -> np.ndarray:
    """[n_rows, sketch_dim] signed-count accumulation."""
    out = np.zeros((n_rows, sketch_dim), np.float32)
    lib = _load()
    if lib is None or len(hashes) == 0:
        if len(hashes):
            buckets = (hashes % np.uint64(sketch_dim)).astype(np.int64)
            signs = np.where((hashes >> np.uint64(62)) & np.uint64(1),
                             1.0, -1.0).astype(np.float32)
            flat = rows.astype(np.int64) * sketch_dim + buckets
            np.add.at(out.ravel(), flat, signs)
        return out
    hashes = np.ascontiguousarray(hashes, np.uint64)
    rows32 = np.ascontiguousarray(rows, np.int32)
    lib.sketch_accumulate(
        hashes.ctypes.data_as(ctypes.c_void_p),
        rows32.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(hashes)), ctypes.c_int64(sketch_dim),
        out.ctypes.data_as(ctypes.c_void_p))
    return out


def tokenize_ascii(text: str, max_tokens: int = 100_000) -> List[str]:
    """C-speed en tokenizer; parity with tokenize.tokenize_en on ASCII."""
    lib = _load()
    if lib is None:
        from legalrag_tpu.tokenize.tokenizers import tokenize_en

        return tokenize_en(text)
    raw = bytearray(text.encode("utf-8"))
    buf = (ctypes.c_uint8 * len(raw)).from_buffer(raw)
    starts = np.empty(max_tokens, np.int64)
    ends = np.empty(max_tokens, np.int64)
    n = lib.tokenize_ascii(
        ctypes.cast(buf, ctypes.c_void_p), ctypes.c_int64(len(raw)),
        starts.ctypes.data_as(ctypes.c_void_p),
        ends.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(max_tokens))
    data = bytes(raw)
    return [data[starts[i]:ends[i]].decode("utf-8", "replace")
            for i in range(n)]
