"""Scatter-free sorted-run sums (ops/segsum.py) vs the segment_sum ground
truth — the dedup front-end contract the fused Pallas row optimizer needs:
pairwise-distinct targets, full run sums at run ends, zeros elsewhere."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goctr_tpu.ops.segsum import (
    _cummax_i32, _cumsum_rows, segment_rows_dedup, sorted_run_sums,
)


def test_cumsum_rows_matches_jnp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4096, 8)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(_cumsum_rows(x)),
                               np.cumsum(np.asarray(x), axis=0),
                               rtol=2e-4, atol=2e-4)


def test_cummax_matches_np():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-5, 100, 2048).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(_cummax_i32(x)),
                                  np.maximum.accumulate(np.asarray(x)))


def _dense_apply(vocab_alloc, d, tgt, rows):
    """Ground-truth application: scatter-add the (tgt, rows) output into a
    zero table (duplicate-free by contract)."""
    table = np.zeros((vocab_alloc, d), np.float32)
    t = np.asarray(tgt)
    r = np.asarray(rows)
    assert len(np.unique(t)) == len(t), "targets must be pairwise distinct"
    table[t] += r
    return table


@pytest.mark.parametrize("seed,dups", [(0, 1), (1, 16), (2, 1024)])
def test_segment_rows_dedup_matches_segment_sum(seed, dups):
    """Applying the (tgt, rows) output must equal .at[ids].add(rows) on the
    real vocab rows, for uniform and heavily-duplicated (zipf-hot) ids."""
    rng = np.random.default_rng(seed)
    n, vocab, d = 2048, 500, 8
    ids = rng.integers(0, max(vocab // dups, 2), n).astype(np.int32)
    ids[rng.random(n) < 0.15] = -1                 # pads
    rows = rng.normal(size=(n, d)).astype(np.float32)

    tgt, summed = segment_rows_dedup(jnp.asarray(ids), jnp.asarray(rows),
                                     vocab)
    got = _dense_apply(vocab + n + 2, d, tgt, summed)[:vocab]

    want = np.zeros((vocab, d), np.float32)
    np.add.at(want, ids[ids >= 0], rows[ids >= 0])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_segment_rows_dedup_pad_to():
    rng = np.random.default_rng(3)
    n, vocab, d = 1000, 100, 4                     # not a 1024 multiple
    ids = rng.integers(0, vocab, n).astype(np.int32)
    rows = rng.normal(size=(n, d)).astype(np.float32)
    tgt, summed = segment_rows_dedup(jnp.asarray(ids), jnp.asarray(rows),
                                     vocab, pad_to=2048)
    assert tgt.shape == (2048,)
    got = _dense_apply(vocab + 2048 + 2, d, tgt, summed)[:vocab]
    want = np.zeros((vocab, d), np.float32)
    np.add.at(want, ids, rows)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sorted_run_sums_all_equal_ids():
    """One giant run spanning many blocks: only the final position carries
    the total."""
    n, d = 4096, 4
    s_ids = jnp.zeros((n,), jnp.int32)
    rows = jnp.ones((n, d), jnp.float32)
    tgt, summed = sorted_run_sums(s_ids, rows, junk_base=10)
    s = np.asarray(summed)
    np.testing.assert_allclose(s[-1], n)
    assert np.all(s[:-1] == 0)
    assert int(tgt[-1]) == 0
    assert len(np.unique(np.asarray(tgt))) == n


def test_segment_rows_dedup_jits_under_scan():
    """The production use site runs inside lax.scan inside jit."""
    n, vocab, d = 1024, 64, 4
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, 8, (3, n)).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(3, n, d)).astype(np.float32))

    @jax.jit
    def run(ids, rows):
        def body(carry, x):
            i, r = x
            tgt, s = segment_rows_dedup(i, r, vocab)
            return carry + jnp.sum(s), None
        return jax.lax.scan(body, jnp.float32(0), (ids, rows))[0]

    total = float(run(ids, rows))
    np.testing.assert_allclose(total, float(jnp.sum(rows)), rtol=1e-4)
