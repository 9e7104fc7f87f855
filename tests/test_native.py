"""Native tier: bit-parity with the Python FNV reference + assembly
correctness + a speedup sanity check."""
import time

import numpy as np
import pytest

from goctr_tpu.features.hashing import fnv32, fnv32a, string_split_multihot
from goctr_tpu.native import (
    fnv1_32_batch, fnv1a_32_batch, gather_rows_concat, hash_bucket_batch,
    multihot_batch, native_available,
)


def test_native_builds():
    assert native_available(), "C toolchain present in image; build must work"


def test_fnv_bit_parity():
    vals = ["", "a", "foobar", "Comedy", "日本語", "Action|Drama"]
    got = fnv1_32_batch(vals)
    want = [fnv32(v) for v in vals]
    np.testing.assert_array_equal(got, np.asarray(want, np.uint32))
    got_a = fnv1a_32_batch(vals)
    np.testing.assert_array_equal(
        got_a, np.asarray([fnv32a(v) for v in vals], np.uint32))


def test_hash_bucket_parity():
    vals = [f"genre{i}" for i in range(500)]
    np.testing.assert_array_equal(
        hash_bucket_batch(vals, 37),
        [fnv32(v) % 37 for v in vals])


def test_multihot_parity():
    vals = ["Action|Comedy", "drama", "Sci-Fi|War|Action", ""]
    got = multihot_batch(vals, "|", 50)
    want = np.stack([string_split_multihot(v, "|", 50) for v in vals])
    np.testing.assert_array_equal(got, want)


def test_gather_rows_concat(rng):
    a = rng.random((10, 3)).astype(np.float32)
    b = rng.random((7, 2)).astype(np.float32)
    ia = rng.integers(0, 10, 5)
    ib = rng.integers(0, 7, 5)
    out = gather_rows_concat([(a, ia), (b, ib)])
    np.testing.assert_allclose(out, np.concatenate([a[ia], b[ib]], axis=1))


def test_native_is_faster_than_python_loop():
    vals = [f"token-{i}-{i*7}" for i in range(20000)]
    t0 = time.perf_counter()
    fnv1_32_batch(vals)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = [fnv32(v) for v in vals]
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)


def test_gather_into_c_matches_numpy_fallback():
    """r5 direct-assembly primitives: the threaded C paths must equal the
    numpy fallbacks (incl. negative behavior ids → zeros)."""
    import numpy as np

    from goctr_tpu.native import hashing as H

    rng = np.random.default_rng(0)
    n, w, L, d = 3001, 7, 4, 5
    src = rng.standard_normal((50, w)).astype(np.float32)
    idx = rng.integers(0, 50, n).astype(np.int64)
    emb = rng.standard_normal((40, d)).astype(np.float32)
    idx2 = rng.integers(-1, 40, (n, L)).astype(np.int64)
    width = w + L * d + 3
    out_c = np.full((n, width), -9.0, np.float32)
    out_py = np.full((n, width), -9.0, np.float32)
    H.gather_rows_into(out_c, 0, src, idx)
    H.gather_emb_rows_into(out_c, w, emb, idx2)
    lib = H.get_lib()
    try:
        H.get_lib.__globals__  # no-op; force the numpy path via monkey
        import goctr_tpu.native.hashing as HH
        orig = HH.get_lib
        HH.get_lib = lambda: None
        H.gather_rows_into(out_py, 0, src, idx)
        H.gather_emb_rows_into(out_py, w, emb, idx2)
    finally:
        HH.get_lib = orig
    np.testing.assert_array_equal(out_c, out_py)
    if lib is None:
        import pytest
        pytest.skip("native lib unavailable — fallback-only environment")
