"""NumPy-facing wrappers over the native kernels, with pure-Python
fallbacks (bit-identical — both implement FNV-1 32 like Go hash/fnv)."""
from __future__ import annotations

import ctypes
from typing import Sequence

import numpy as np

from goctr_tpu.native.build import get_lib


def _pack(values: Sequence[str | bytes]) -> tuple[np.ndarray, np.ndarray]:
    bufs = [v.encode("utf-8") if isinstance(v, str) else v for v in values]
    offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bufs], out=offsets[1:])
    return np.frombuffer(b"".join(bufs), dtype=np.uint8), offsets


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def fnv1_32_batch(values: Sequence[str | bytes]) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from goctr_tpu.features.hashing import fnv32
        return np.fromiter((fnv32(v) for v in values), dtype=np.uint32,
                           count=len(values))
    buf, off = _pack(values)
    out = np.empty(len(values), dtype=np.uint32)
    lib.fnv1_32_batch(_ptr(buf, ctypes.c_uint8), _ptr(off, ctypes.c_int64),
                      len(values), _ptr(out, ctypes.c_uint32))
    return out


def fnv1a_32_batch(values: Sequence[str | bytes]) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from goctr_tpu.features.hashing import fnv32a
        return np.fromiter((fnv32a(v) for v in values), dtype=np.uint32,
                           count=len(values))
    buf, off = _pack(values)
    out = np.empty(len(values), dtype=np.uint32)
    lib.fnv1a_32_batch(_ptr(buf, ctypes.c_uint8), _ptr(off, ctypes.c_int64),
                       len(values), _ptr(out, ctypes.c_uint32))
    return out


def hash_bucket_batch(values: Sequence[str | bytes], size: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from goctr_tpu.features.hashing import fnv32
        return np.fromiter((fnv32(v) % size for v in values), dtype=np.int32,
                           count=len(values))
    buf, off = _pack(values)
    out = np.empty(len(values), dtype=np.int32)
    lib.hash_bucket_batch(_ptr(buf, ctypes.c_uint8),
                          _ptr(off, ctypes.c_int64), len(values),
                          size, _ptr(out, ctypes.c_int32))
    return out


def multihot_batch(values: Sequence[str], sep: str, size: int) -> np.ndarray:
    """[n, size] dense multi-hot (StringSplitMultiHot semantics: lowercase
    tokens, FNV-1 buckets)."""
    lib = get_lib()
    if lib is None:
        from goctr_tpu.features.hashing import string_split_multihot
        return np.stack([string_split_multihot(v, sep, size)
                         for v in values]) if values else \
            np.zeros((0, size), np.float32)
    buf, off = _pack(values)
    out = np.zeros((len(values), size), dtype=np.float32)
    lib.multihot_batch(_ptr(buf, ctypes.c_uint8), _ptr(off, ctypes.c_int64),
                       len(values), ord(sep), size,
                       _ptr(out, ctypes.c_float))
    return out


def gather_rows_into(out: np.ndarray, col: int, src: np.ndarray,
                     idx: np.ndarray) -> None:
    """out[:, col:col+w] = src[idx] without materializing src[idx] (the
    C pass writes straight into the strided destination, 2 threads)."""
    src = np.ascontiguousarray(src, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    n, w = idx.shape[0], src.shape[1]
    lib = get_lib()
    if lib is None:
        out[:, col:col + w] = src[idx]
        return
    lib.gather_rows(_ptr(src, ctypes.c_float), _ptr(idx, ctypes.c_int64),
                    n, w, _ptr(out, ctypes.c_float), out.shape[1], col)


def gather_emb_rows_into(out: np.ndarray, col: int, emb: np.ndarray,
                         idx2d: np.ndarray) -> None:
    """out[r, col+l*d : col+(l+1)*d] = emb[idx2d[r, l]] (negative idx →
    zeros) — the behavior-embedding block written directly into the sample
    matrix; the [n, L·d] intermediate + recopy was the full-scale assembly
    wall (BENCH_NOTES r5 profile)."""
    emb = np.ascontiguousarray(emb, dtype=np.float32)
    idx2d = np.ascontiguousarray(idx2d, dtype=np.int64)
    n, L = idx2d.shape
    d = emb.shape[1]
    lib = get_lib()
    if lib is None:
        safe = idx2d.clip(0)
        block = emb[safe]
        block[idx2d < 0] = 0.0
        out[:, col:col + L * d] = block.reshape(n, L * d)
        return
    lib.gather_emb_rows(_ptr(emb, ctypes.c_float),
                        _ptr(idx2d, ctypes.c_int64), n, L, d,
                        _ptr(out, ctypes.c_float), out.shape[1], col)


def gather_rows_concat(blocks: Sequence[tuple[np.ndarray, np.ndarray]]
                       ) -> np.ndarray:
    """X[r] = concat(block_src[idx[r]] for each (src, idx) block): the
    batched sample-assembly primitive (replaces the reference's per-sample
    goroutine loop, rcmd.go:375-397)."""
    if not blocks:
        return np.zeros((0, 0), np.float32)
    n = len(blocks[0][1])
    width = sum(src.shape[1] for src, _ in blocks)
    out = np.empty((n, width), dtype=np.float32)
    lib = get_lib()
    col = 0
    for src, idx in blocks:
        src = np.ascontiguousarray(src, dtype=np.float32)
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        w = src.shape[1]
        if lib is None:
            out[:, col:col + w] = src[idx]
        else:
            lib.gather_rows(_ptr(src, ctypes.c_float),
                            _ptr(idx, ctypes.c_int64), n, w,
                            _ptr(out, ctypes.c_float), width, col)
        col += w
    return out
