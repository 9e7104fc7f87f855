"""Feature-encoder golden-value tests (tier 1, SURVEY.md §4).

FNV golden values are the published Fowler/Noll/Vo test vectors — Go's
hash/fnv New32 (used by the reference's HashOneHot32) implements exactly
FNV-1 32, so matching these vectors gives bit-parity with the reference's
bucket assignments.
"""
import numpy as np
import pytest

from goctr_tpu.features import (
    CountVectorizer, Identity, KBinsDiscretizer, MaxAbsScaler, MinMaxScaler,
    OneHotEncoder, OrdinalEncoder, QuantileScaler, SampleNormalizerL1,
    SampleNormalizerL2, StandardScaler, StructTransformer, TFIDFVectorizer,
    TimeSeq, UserBehaviorCache, fnv32, fnv32a, hash_bucket, hash_bucket_batch,
    hash_onehot, simple_onehot, string_split_multihot,
)


# ------------------------------------------------------------------ hashing --

def test_fnv1_32_vectors():
    assert fnv32(b"") == 0x811C9DC5
    assert fnv32(b"a") == 0x050C5D7E
    assert fnv32(b"b") == 0x050C5D7D
    assert fnv32(b"foobar") == 0x31F0B262


def test_fnv1a_32_vectors():
    assert fnv32a(b"") == 0x811C9DC5
    assert fnv32a(b"a") == 0xE40C292C
    assert fnv32a(b"foobar") == 0xBF9CF968


def test_hash_onehot():
    v = hash_onehot("Comedy", 10)
    assert v.shape == (10,) and v.sum() == 1
    assert v[fnv32("Comedy") % 10] == 1
    np.testing.assert_array_equal(
        hash_bucket_batch(["Comedy", "Drama"], 10),
        [fnv32("Comedy") % 10, fnv32("Drama") % 10])


def test_simple_onehot():
    np.testing.assert_array_equal(simple_onehot(2, 4), [0, 0, 1, 0])


def test_string_split_multihot_lowercases():
    v = string_split_multihot("Action|Comedy", "|", 50)
    assert v[hash_bucket("action", 50)] == 1
    assert v[hash_bucket("comedy", 50)] == 1
    assert v.sum() <= 2  # collision-tolerant


# ----------------------------------------------------------------- encoders --

def test_onehot_encoder():
    enc = OneHotEncoder().fit(["b", "a", "", "b", "c"])
    assert enc.mapping == {"b": 0, "a": 1, "c": 2}
    np.testing.assert_array_equal(enc.transform("a"), [0, 1, 0])
    np.testing.assert_array_equal(enc.transform("zzz"), [0, 0, 0])
    assert enc.feature_names() == ["b", "a", "c"]
    np.testing.assert_array_equal(
        enc.transform_batch(["c", "b"]), [[0, 0, 1], [1, 0, 0]])
    np.testing.assert_array_equal(enc.transform_indices(["c", "x"]), [2, -1])


def test_ordinal_encoder():
    enc = OrdinalEncoder().fit(["x", "y", "x"])
    assert enc.transform("x") == 1 and enc.transform("y") == 2
    assert enc.transform("unk") == 0


# ------------------------------------------------------------------ scalers --

def test_minmax_scaler():
    s = MinMaxScaler().fit([1.0, 5.0, 3.0])
    assert s.transform(3.0) == pytest.approx(0.5)
    assert s.transform(0.0) == 0.0 and s.transform(9.0) == 1.0
    assert MinMaxScaler().fit([2.0, 2.0]).transform(2.0) == 0.0
    np.testing.assert_allclose(s.transform_batch([1, 3, 5, 7]), [0, 0.5, 1, 1])


def test_maxabs_scaler():
    s = MaxAbsScaler().fit([-4.0, 2.0])
    assert s.transform(2.0) == pytest.approx(0.5)
    assert s.transform(-8.0) == -1.0 and s.transform(8.0) == 1.0


def test_standard_scaler():
    vals = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]
    s = StandardScaler().fit(vals)
    assert s.mean == pytest.approx(5.0)
    # sample std (n-1), matching reference common.go:5-11
    assert s.std == pytest.approx(np.std(vals, ddof=1))
    assert s.transform(5.0) == pytest.approx(0.0)


def test_quantile_scaler():
    s = QuantileScaler(n_quantiles=4).fit(list(range(100)))
    assert s.quantiles.size == 4
    assert s.transform(-5) == pytest.approx(0.25)   # below all → first bucket
    assert s.transform(1000) == 1.0
    mid = s.transform(50)
    assert 0.25 <= mid <= 1.0


def test_kbins_discretizer():
    d = KBinsDiscretizer(n_quantiles=4).fit(list(range(100)))
    assert d.transform(-5) == 1.0
    assert d.transform(1000) == 5.0  # n_bins + 1 overflow bin
    vals = d.transform_batch(np.array([-5.0, 1000.0]))
    np.testing.assert_array_equal(vals, [1.0, 5.0])


def test_identity():
    assert Identity().fit([1]).transform(3.3) == 3.3


# -------------------------------------------------------------- normalizers --

def test_sample_normalizers():
    v = [3.0, -4.0]
    np.testing.assert_allclose(SampleNormalizerL1().transform(v), [3 / 7, -4 / 7])
    np.testing.assert_allclose(SampleNormalizerL2().transform(v), [0.6, -0.8])
    np.testing.assert_array_equal(SampleNormalizerL2().transform([0.0, 0.0]), [0, 0])


# --------------------------------------------------------------------- text --

def test_count_vectorizer():
    cv = CountVectorizer().fit(["hello world", "world peace"])
    assert cv.mapping == {"hello": 0, "world": 1, "peace": 2}
    np.testing.assert_array_equal(cv.transform("world world hello"), [1, 2, 0])
    # whole-string match when no separator present
    np.testing.assert_array_equal(cv.transform("world"), [0, 1, 0])
    np.testing.assert_array_equal(cv.transform("unknown"), [0, 0, 0])


def test_tfidf_vectorizer():
    tv = TFIDFVectorizer().fit(["a b", "a c", "a d"])
    out = tv.transform("a b")
    # 'a' appears in all docs → idf = log(3/3)+1 = 1; 'b' in 1 → log(3)+1
    raw = np.array([1.0, np.log(3) + 1, 0, 0])
    np.testing.assert_allclose(out, raw / np.linalg.norm(raw), rtol=1e-12)


# ---------------------------------------------------------------- struct ----

def test_struct_transformer():
    st = StructTransformer(
        [MinMaxScaler(), OneHotEncoder(), None],
        fields=["age", "genre", "ignored"],
    )
    recs = [{"age": 20, "genre": "a", "ignored": "x"},
            {"age": 40, "genre": "b", "ignored": "y"}]
    st.fit(recs)
    np.testing.assert_allclose(st.transform(recs[0]), [0.0, 1.0, 0.0])
    np.testing.assert_allclose(st.transform(recs[1]), [1.0, 0.0, 1.0])
    assert st.num_features == 3


# ---------------------------------------------------------------- ubcache ----

def test_ubcache_filter_time_travel():
    c = UserBehaviorCache()
    # ts descending
    c.set(1, ts=[50, 40, 30, 20, 10], items=[5, 4, 3, 2, 1])
    seq = c.get(1, max_ts=35, count=2)
    np.testing.assert_array_equal(seq.items, [3, 2])
    np.testing.assert_array_equal(seq.ts, [30, 20])
    # no filters
    seq = c.get(1)
    assert seq.items.size == 5
    # unknown user
    assert c.get(99) is None


def test_ubcache_padded_export():
    c = UserBehaviorCache()
    c.set(1, ts=[3, 2, 1], items=[30, 20, 10])
    c.set(2, ts=[9], items=[90])
    uids, items, lens = c.as_padded_arrays(max_len=2)
    assert set(uids.tolist()) == {1, 2}
    row1 = items[list(uids).index(1)]
    np.testing.assert_array_equal(row1, [30, 20])  # latest 2, truncated tail
    row2 = items[list(uids).index(2)]
    np.testing.assert_array_equal(row2, [90, -1])
    assert sorted(lens.tolist()) == [1, 2]


def test_ubcache_bulk_get_matches_per_row(rng):
    """bulk_get (vectorized composite-key searchsorted) must reproduce the
    per-row Get/Filter semantics exactly: ts<=max_ts, newest-first, length
    cap, max_ts=0 = no filter, unknown users = all-pad."""
    from goctr_tpu.features.ubcache import UserBehaviorCache

    ubc = UserBehaviorCache()
    for uid in range(1, 40):
        k = int(rng.integers(1, 30))
        ts = np.sort(rng.integers(100, 10_000, k))[::-1]
        items = rng.integers(1, 1000, k)
        ubc.set(uid, ts, items)
    n, L = 2000, 7
    uids = rng.integers(0, 45, n)          # includes unknown users
    mts = rng.integers(0, 11_000, n)
    mts[rng.random(n) < 0.1] = 0
    out = ubc.bulk_get(uids, mts, L)
    for i in range(n):
        seq = ubc.get(int(uids[i]), max_ts=int(mts[i]), count=L)
        want = np.full(L, -1, np.int64)
        if seq is not None:
            want[:seq.items.size] = seq.items
        np.testing.assert_array_equal(out[i], want)


def test_ubcache_bulk_get_empty_cache():
    """bulk_get on an EMPTY cache must return all-pad rows, not IndexError
    (ADVICE r4: offsets has size 1, offsets[urow+1] was out of bounds)."""
    from goctr_tpu.features.ubcache import UserBehaviorCache

    ubc = UserBehaviorCache()
    out = ubc.bulk_get(np.array([1, 2, 3]), np.array([0, 5, 0]), 4)
    np.testing.assert_array_equal(out, np.full((3, 4), -1, np.int64))
