"""Pallas kernel correctness vs jnp reference, in interpreter mode on CPU.

The compiled path is exercised separately on the real chip by the verify
recipe (.claude/skills/verify/SKILL.md); measured results live in
BENCH_NOTES.md."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goctr_tpu.ops.pallas.din_attention import (
    din_attention_pool_jnp, din_attention_pool_pallas,
)
from goctr_tpu.ops.pallas.embedding_lookup import (
    fused_gather_pool_jnp, fused_gather_pool_pallas,
)


def test_din_attention_pallas_matches_jnp(rng):
    b, t, d = 16, 256, 16
    beh = jnp.asarray(rng.normal(0, 1, (b, t, d)).astype(np.float32))
    item = jnp.asarray(rng.normal(0, 1, (b, d)).astype(np.float32))
    att0 = jnp.asarray(rng.normal(1, 0.1, t).astype(np.float32))
    mask = jnp.asarray((rng.random((b, t)) > 0.3).astype(np.float32))
    want = din_attention_pool_jnp(beh, item, att0, mask)
    got = din_attention_pool_pallas(beh, item, att0, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_din_attention_multiple_t_tiles(rng):
    b, t, d = 8, 384, 8    # 3 tiles of 128
    beh = jnp.asarray(rng.normal(0, 1, (b, t, d)).astype(np.float32))
    item = jnp.asarray(rng.normal(0, 1, (b, d)).astype(np.float32))
    att0 = jnp.ones(t, jnp.float32)
    want = din_attention_pool_jnp(beh, item, att0)
    got = din_attention_pool_pallas(beh, item, att0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_din_attention_matches_model_semantics(rng):
    """Kernel (all-valid mask) == the DIN model's mean-pool of gated
    behaviors (din.go:231-298)."""
    from goctr_tpu.ops.activations import cosine_similarity
    b, t, d = 4, 256, 8
    beh = jnp.asarray(rng.normal(0, 1, (b, t, d)).astype(np.float32))
    item = jnp.asarray(rng.normal(0, 1, (b, d)).astype(np.float32))
    att0 = jnp.ones(t, jnp.float32)
    weight = (cosine_similarity(beh, item[:, None, :]) + 1.0) * 0.5
    gate = jax.nn.sigmoid(weight * att0)
    want = jnp.mean(beh * gate[..., None], axis=1)
    got = din_attention_pool_pallas(beh, item, att0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_fused_gather_pool_matches_take(rng, combiner):
    v, d, b, k = 500, 16, 8, 64
    table = jnp.asarray(rng.normal(0, 1, (v, d)).astype(np.float32))
    ids = rng.integers(0, v, (b, k)).astype(np.int32)
    ids[0, 5:] = -1          # padding
    ids[3, :] = -1           # fully padded row
    ids = jnp.asarray(ids)
    want = fused_gather_pool_jnp(table, ids, combiner)
    got = fused_gather_pool_pallas(table, ids, combiner, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_gather_pool_mean_custom_vjp(rng):
    """Trainable fused pool: forward matches the jnp path, gradient matches
    autodiff through take+mean (including −1 pads)."""
    from goctr_tpu.ops.pallas.embedding_lookup import (
        fused_gather_pool_jnp, gather_pool_mean,
    )
    v, d, b, k = 50, 8, 16, 12
    table = jnp.asarray(rng.normal(0, 1, (v, d)).astype(np.float32))
    ids = rng.integers(0, v, (b, k)).astype(np.int32)
    ids[rng.random((b, k)) < 0.25] = -1
    ids = jnp.asarray(ids)

    got = gather_pool_mean(table, ids)
    want = fused_gather_pool_jnp(table, ids, "mean")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)

    def loss_fused(t):
        return jnp.sum(gather_pool_mean(t, ids) ** 2)

    def loss_ref(t):
        return jnp.sum(fused_gather_pool_jnp(t, ids, "mean") ** 2)

    g1 = np.asarray(jax.grad(loss_fused)(table))
    g2 = np.asarray(jax.grad(loss_ref)(table))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


def test_single_device_pooled_lookup_uses_fused_path(rng):
    """sharded_pooled_lookup(mean) on a 1x1 mesh routes through
    gather_pool_mean and stays numerically identical."""
    from goctr_tpu.core.meshes import MeshSpec, make_mesh
    from goctr_tpu.ops.pallas.embedding_lookup import fused_gather_pool_jnp
    from goctr_tpu.parallel.embedding import sharded_pooled_lookup

    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    table = jnp.asarray(rng.normal(0, 1, (40, 4)).astype(np.float32))
    ids = jnp.asarray([[1, 2, -1], [7, -1, -1], [3, 4, 5], [-1, -1, -1]],
                      jnp.int32)
    got = sharded_pooled_lookup(table, ids, mesh, combiner="mean")
    want = fused_gather_pool_jnp(table, ids, "mean")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_row_optimizer_kernel_interpret_matches_jnp(rng):
    """Fused row-optimizer Pallas kernel (interpret mode, emulated DMA
    ring) vs the jnp fallback — both adagrad and sgd, with junk pad rows."""
    from goctr_tpu.ops.pallas.row_optimizer import (
        ROWS_PER_STEP, _apply_row_updates_jnp, apply_row_updates,
        pack_grads, pack_table)

    d, n = 8, 2 * ROWS_PER_STEP
    v = n + 64                         # table larger than update count
    w = rng.normal(0, 1, (v, d)).astype(np.float32)
    acc0 = rng.random(v).astype(np.float32) * 0.1
    packed = pack_table(jnp.asarray(w), jnp.asarray(acc0))
    ids = jnp.asarray(rng.permutation(v)[:n].astype(np.int32))  # distinct
    g = jnp.asarray(rng.normal(0, 0.5, (n, d)).astype(np.float32))
    gp = pack_grads(g)
    for kind in ("adagrad", "sgd"):
        got = apply_row_updates(packed, ids, gp, lr=0.25, d=d, kind=kind,
                                interpret=True)
        want = _apply_row_updates_jnp(packed, ids, gp, 0.25, kind, 1e-8, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
        # untouched rows keep their values
        mask = np.ones(v, bool)
        mask[np.asarray(ids)] = False
        np.testing.assert_array_equal(np.asarray(got)[mask],
                                      np.asarray(packed)[mask])


def _run_optimizer_oracle(w, acc0, s_ids, s_rows, lr, kind, eps, vocab, d):
    """numpy oracle: sequential run accumulation + row-wise update."""
    w = w.copy()
    acc = acc0.copy()
    i = 0
    n = len(s_ids)
    while i < n:
        j = i
        run = np.zeros(d, np.float32)
        while j < n and s_ids[j] == s_ids[i]:
            run += s_rows[j]
            j += 1
        idv = int(s_ids[i])
        if idv < vocab:
            if kind == "adagrad":
                acc[idv] += float(run @ run)
                w[idv] -= lr * run / np.sqrt(acc[idv] + eps)
            else:
                w[idv] -= lr * run
        i = j
    return w, acc


@pytest.mark.parametrize("kind", ["adagrad", "sgd"])
def test_run_optimizer_kernel_interpret_matches_oracle(rng, kind):
    """v2 sorted-run kernel (interpret mode) vs a sequential numpy oracle:
    heavy duplicates, pads mapped to id=vocab, runs spanning the 1024-row
    block boundary, and runs longer than RING (exercises the repair-read
    path: a long run holds its ring slot while lookahead crosses it)."""
    from goctr_tpu.ops.pallas.run_optimizer import (
        apply_run_updates, pack_table)

    d, n, vocab = 8, 3 * 1024, 300
    # zipf-ish dups: id 0 gets a very long run (> RING and spanning blocks)
    raw = np.concatenate([
        np.zeros(700, np.int64),                       # long run
        rng.integers(0, vocab, n - 700 - 100),
        np.full(100, -1, np.int64),                    # pads
    ])
    ids_clean = np.where(raw >= 0, raw, vocab)
    order = np.argsort(ids_clean, kind="stable")
    s_ids = ids_clean[order].astype(np.int32)
    g = rng.normal(0, 0.5, (n, d)).astype(np.float32)
    g[raw < 0] = 0.0
    s_rows = g[order]

    w0 = rng.normal(0, 1, (vocab, d)).astype(np.float32)
    acc0 = rng.random(vocab).astype(np.float32) * 0.1
    packed = pack_table(jnp.asarray(w0), jnp.asarray(acc0))

    got = apply_run_updates(packed, jnp.asarray(s_ids),
                            jnp.asarray(s_rows), lr=0.25, d=d, kind=kind,
                            skip_ge=vocab, interpret=True)
    want_w, want_acc = _run_optimizer_oracle(
        w0, acc0, s_ids, s_rows, 0.25, kind, 1e-8, vocab, d)
    np.testing.assert_allclose(np.asarray(got)[:, :d], want_w,
                               rtol=2e-4, atol=2e-5)
    if kind == "adagrad":
        np.testing.assert_allclose(np.asarray(got)[:, d], want_acc,
                                   rtol=2e-4, atol=2e-5)


def test_run_optimizer_jnp_fallback_matches_oracle(rng):
    """The CPU fallback (_apply_run_updates_jnp via backend routing) must
    agree with the same oracle."""
    from goctr_tpu.ops.pallas.run_optimizer import (
        apply_run_updates, pack_table)

    d, n, vocab = 8, 1024, 100
    raw = rng.integers(0, vocab, n)
    s_ids = np.sort(raw).astype(np.int32)
    s_rows = rng.normal(0, 0.5, (n, d)).astype(np.float32)
    w0 = rng.normal(0, 1, (vocab, d)).astype(np.float32)
    acc0 = np.zeros(vocab, np.float32)
    packed = pack_table(jnp.asarray(w0), jnp.asarray(acc0))
    got = apply_run_updates(packed, jnp.asarray(s_ids),
                            jnp.asarray(s_rows), lr=0.5, d=d)
    want_w, want_acc = _run_optimizer_oracle(
        w0, acc0, s_ids, s_rows, 0.5, "adagrad", 1e-8, vocab, d)
    np.testing.assert_allclose(np.asarray(got)[:, :d], want_w,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[:, d], want_acc,
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("kind", ["adagrad", "sgd"])
def test_csum_optimizer_kernel_interpret_matches_oracle(rng, kind):
    """Diff-mode fused optimizer (apply_csum_updates, interpret): run sums
    recovered as diffs of consecutive run-end cumsum rows must match the
    sequential oracle — duplicates, pads at id=vocab, runs spanning the
    block boundary."""
    from goctr_tpu.ops.pallas.row_optimizer import (
        apply_csum_updates, pack_table)
    from goctr_tpu.ops.segsum import _cumsum_rows

    d, n, vocab = 8, 2 * 1024, 200
    raw = np.concatenate([
        np.zeros(300, np.int64),
        rng.integers(0, vocab, n - 300 - 64),
        np.full(64, -1, np.int64),
    ])
    ids_clean = np.where(raw >= 0, raw, vocab)
    order = np.argsort(ids_clean, kind="stable")
    s_ids = ids_clean[order].astype(np.int32)
    g = rng.normal(0, 0.5, (n, d)).astype(np.float32)
    g[raw < 0] = 0.0
    s_rows = g[order]
    c = np.asarray(_cumsum_rows(jnp.asarray(s_rows)))

    w0 = rng.normal(0, 1, (vocab, d)).astype(np.float32)
    acc0 = rng.random(vocab).astype(np.float32) * 0.1
    packed = pack_table(jnp.asarray(w0), jnp.asarray(acc0))
    got = apply_csum_updates(packed, jnp.asarray(s_ids), jnp.asarray(c),
                             lr=0.25, d=d, kind=kind, skip_ge=vocab,
                             interpret=True)
    want_w, want_acc = _run_optimizer_oracle(
        w0, acc0, s_ids, s_rows, 0.25, kind, 1e-8, vocab, d)
    np.testing.assert_allclose(np.asarray(got)[:, :d], want_w,
                               rtol=2e-4, atol=2e-4)
    if kind == "adagrad":
        np.testing.assert_allclose(np.asarray(got)[:, d], want_acc,
                                   rtol=2e-4, atol=2e-4)


def test_row_optimizer_kernel_skip_ge_matches_full(rng):
    """skip_ge: junk-target rows (id >= vocab, zero g) are skipped at the
    DMA level; result must be bit-identical to the unskipped kernel. Junk
    rows are interleaved throughout (the dedup pipeline's real layout:
    non-end positions scattered among run ends, ops/segsum.py)."""
    from goctr_tpu.ops.pallas.row_optimizer import (
        ROWS_PER_STEP, apply_row_updates, pack_grads, pack_table)

    d, n = 8, 2 * ROWS_PER_STEP
    vocab = n                           # real rows live in [0, vocab)
    v_alloc = vocab + n + 2             # + junk region (table_pad_rows)
    w = rng.normal(0, 1, (v_alloc, d)).astype(np.float32)
    packed = pack_table(jnp.asarray(w))
    # ~70% junk (the bench-scale zipf ratio): junk targets distinct,
    # >= vocab, zero g; real targets distinct, < vocab, random g
    is_junk = rng.random(n) < 0.7
    pos = np.arange(n, dtype=np.int32)
    real_ids = rng.permutation(vocab)[:n].astype(np.int32)
    ids = np.where(is_junk, vocab + 1 + pos, real_ids).astype(np.int32)
    g = rng.normal(0, 0.5, (n, d)).astype(np.float32)
    g[is_junk] = 0.0
    gp = pack_grads(jnp.asarray(g))
    for kind in ("adagrad", "sgd"):
        got = apply_row_updates(packed, jnp.asarray(ids), gp, lr=0.25, d=d,
                                kind=kind, skip_ge=vocab, interpret=True)
        want = apply_row_updates(packed, jnp.asarray(ids), gp, lr=0.25,
                                 d=d, kind=kind, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_row_gather_kernel_interpret_matches_take(rng):
    from goctr_tpu.ops.pallas.row_gather import gather_rows_packed

    v, n = 500, 2048
    table = jnp.asarray(rng.normal(size=(v, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, n).astype(np.int32))
    got = gather_rows_packed(table, ids, interpret=True)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_row_gather_kernel_duplicates_and_multiblock(rng):
    from goctr_tpu.ops.pallas.row_gather import gather_rows_packed

    v, n = 64, 4096                       # 2 grid steps, heavy duplicates
    table = jnp.asarray(rng.normal(size=(v, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, n).astype(np.int32))
    got = gather_rows_packed(table, ids, interpret=True)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

def test_fused2_cumsum_diff_cancellation_at_bench_scale(rng):
    """fused2 recovers per-run gradient sums as diffs of a GLOBAL f32
    inclusive cumsum; cancellation error grows with the cumsum magnitude
    (~sigma*sqrt(n)). The small interpret tests can't see this — this check
    runs the diff recovery at the r3 bench shape (n=540,672, D=64, zipf ids
    over 10M vocab) against an exact float64 per-run oracle and bounds the
    error where it is worst: singleton runs late in the sorted stream
    (ADVICE r3 #4).

    Bound derivation: each recovered sum is (a+s) - a computed in f32 with
    a = preceding cumsum ~ N(0, sigma^2 * pos); rounding of the two cumsum
    entries gives |err| <~ 2u*|a| with u = 2^-24, plus the blockwise
    accumulation's own error. At n=540k, sigma=0.05: |a| <~ 3*sigma*
    sqrt(n) ~ 110, so |err| <~ 2e-5 absolute per lane — ~4e-4 relative to
    a singleton |g| ~ sigma. Asserted with 10x headroom; adagrad
    normalizes step NORM per-row, so a 1e-2-relative direction error is
    training-negligible (and the trainer-parity test pins end-to-end)."""
    from goctr_tpu.ops.segsum import _cumsum_rows

    n, d, vocab = 540_672, 64, 10_000_000
    sigma = 0.05
    # bounded-zipf ids (bench.py law): heavy duplication + a long tail of
    # singleton runs — the worst case rows for cancellation
    u = rng.random(n)
    t = float(vocab) ** (1.0 - 1.05)
    ids = np.minimum(
        ((1.0 - u * (1.0 - t)) ** (1.0 / (1.0 - 1.05))).astype(np.int64) - 1,
        vocab - 1).clip(0)
    ids = np.sort(ids).astype(np.int32)
    g = rng.normal(0, sigma, (n, d)).astype(np.float32)

    c = np.asarray(_cumsum_rows(jnp.asarray(g)))          # f32, blockwise
    is_end = np.concatenate([ids[1:] != ids[:-1], [True]])
    end_pos = np.flatnonzero(is_end)
    prev_end = np.concatenate([[-1], end_pos[:-1]])
    got = c[end_pos] - np.where((prev_end >= 0)[:, None], c[prev_end.clip(0)],
                                0.0)

    c64 = np.cumsum(g.astype(np.float64), axis=0)
    want = c64[end_pos] - np.where((prev_end >= 0)[:, None],
                                   c64[prev_end.clip(0)], 0.0)

    abs_err = np.abs(got - want.astype(np.float32)).max()
    # 10x headroom over the derived 2e-5 bound
    assert abs_err < 2e-4, f"cumsum-diff cancellation too large: {abs_err}"
    # singleton runs (run length 1): the rare rows ADVICE flagged — their
    # relative direction error must stay training-negligible
    run_len = np.diff(np.concatenate([[-1], end_pos]))
    single = run_len == 1
    assert single.sum() > 50_000                # the zipf tail is really there
    rel = (np.abs(got[single] - want[single]).max(axis=1)
           / np.maximum(np.abs(want[single]).max(axis=1), 1e-12))
    assert np.quantile(rel, 0.999) < 1e-2, (
        f"singleton-run relative error q99.9 = {np.quantile(rel, 0.999)}")


@pytest.mark.parametrize("kind", ["adagrad", "sgd"])
def test_grouped_line_optimizer_interpret_matches_fallback(rng, kind):
    """Grouped-line fused optimizer (apply_line_updates, interpret): G
    (w|acc) groups per 128-lane line, per-group adagrad spread via the MXU
    matmul, junk line ids (>= skip_ge, possibly past the table) skipped at
    the DMA level — must match the jnp fallback exactly."""
    from goctr_tpu.ops.pallas.row_optimizer import (
        ROWS_PER_STEP, apply_line_updates, group_size, make_spread,
        pack_table_grouped, unpack_table_grouped)

    d, vocab = 16, 12000      # lines (1715) > n so real ids stay distinct
    g = group_size(d)
    assert g == 7
    lines = -(-vocab // g)
    n = ROWS_PER_STEP
    w0 = rng.normal(0, 1, (vocab, d)).astype(np.float32)
    acc0 = rng.random(vocab).astype(np.float32) * 0.1
    tp = pack_table_grouped(jnp.asarray(w0), jnp.asarray(acc0))
    assert tp.shape == (lines, 128)

    # ~60% junk, distinct real line ids, lane-placed updates
    is_junk = rng.random(n) < 0.6
    pos = np.arange(n)
    real_lines = rng.permutation(lines)[:n]
    lid = np.where(is_junk, lines + 1 + pos, real_lines[:n]).astype(np.int32)
    upd = np.zeros((n, 128), np.float32)
    gw = g * (d + 1)
    upd[:, :gw] = rng.normal(0, 0.3, (n, gw))
    upd[is_junk] = 0.0

    got = apply_line_updates(tp, jnp.asarray(lid), jnp.asarray(upd),
                             lr=0.25, d=d, kind=kind, skip_ge=lines,
                             interpret=True)
    from goctr_tpu.ops.pallas.row_optimizer import _apply_line_updates_jnp
    want = _apply_line_updates_jnp(tp, jnp.asarray(lid), jnp.asarray(upd),
                                   make_spread(d), 0.25, kind, 1e-8, d,
                                   lines)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    # round-trip layout sanity
    w1, a1 = unpack_table_grouped(tp, vocab, d)
    np.testing.assert_array_equal(np.asarray(w1), w0)
    np.testing.assert_array_equal(np.asarray(a1), acc0)


def test_split_rmw_matches_kernel_interpret():
    """r5 split mode (take-read + vectorized math + write-only Pallas
    scatter) must equal the one-pass RMW kernel bit-for-bit in interpret
    mode, junk ids included (measured 2.04x at cap=380,928 on the chip,
    BENCH_NOTES r5)."""
    import numpy as np
    from goctr_tpu.ops.pallas.row_optimizer import (
        apply_row_updates, apply_row_updates_split, pack_grads, pack_table)

    rng = np.random.default_rng(0)
    V, n, d = 500, 128, 8
    w = rng.standard_normal((V, d)).astype(np.float32) * 0.1
    acc = rng.random(V).astype(np.float32)
    tp = pack_table(jnp.asarray(w), jnp.asarray(acc))
    ids = rng.permutation(V)[:n].astype(np.int32)
    ids[10:20] = V + 1 + np.arange(10)     # junk (>= skip_ge), distinct
    g = rng.standard_normal((n, d)).astype(np.float32)
    g[10:20] = 0
    gp = pack_grads(jnp.asarray(g))
    ids_j = jnp.asarray(ids)
    for kind in ("adagrad", "sgd"):
        a = apply_row_updates(tp + 0, ids_j, gp, lr=0.1, d=d, kind=kind,
                              skip_ge=V, interpret=True)
        b = apply_row_updates_split(tp + 0, ids_j, gp, lr=0.1, d=d,
                                    kind=kind, skip_ge=V, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        c = apply_row_updates_split(tp + 0, ids_j, gp, lr=0.1, d=d,
                                    kind=kind, skip_ge=V, interpret=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_scanned_trainer_split_mode_parity():
    """End-to-end: rmw_impl='split' must reproduce the kernel-mode
    training trajectory."""
    import numpy as np
    from goctr_tpu.models.trainer import TrainerConfig
    from goctr_tpu.parallel.scanned import (TableOptConfig,
                                            train_sparse_scanned)
    from goctr_tpu.parallel.sparse_ctr import SparseCTR
    from goctr_tpu.parallel.sparse_trainer import SparseSample

    rng = np.random.default_rng(0)
    n, vocab = 2000, 300
    sample = SparseSample(
        user_profile=rng.random((n, 4)).astype(np.float32),
        behavior_ids=rng.integers(-1, vocab, (n, 5)).astype(np.int32),
        item_ids=rng.integers(0, vocab, n).astype(np.int32),
        ctx=rng.random((n, 2)).astype(np.float32),
        labels=(rng.random(n) > 0.5).astype(np.float32))
    model = SparseCTR(item_vocab=vocab, emb_dim=64, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    cfg = TrainerConfig(batch_size=512, epochs=3, early_stop=0, seed=0,
                        shuffle=False)
    out = {}
    for impl in ("kernel", "split"):
        out[impl] = train_sparse_scanned(
            model, sample, cfg,
            TableOptConfig(kind="adagrad", lr=0.3, update_mode="fused",
                           compact_cap=1024, rmw_impl=impl))
    np.testing.assert_allclose(out["split"].loss_curve,
                               out["kernel"].loss_curve, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["split"].table),
                               np.asarray(out["kernel"].table), atol=1e-6)


def _compact_reference(s_ids, g_s, V, capr, d):
    """The r4 XLA rank-sort compact path (global cumsum diffs)."""
    from goctr_tpu.ops.pallas.row_optimizer import pack_grads
    from goctr_tpu.ops.segsum import _cumsum_rows
    n = s_ids.shape[0]
    c = _cumsum_rows(g_s)
    is_end = jnp.concatenate([s_ids[1:] != s_ids[:-1],
                              jnp.ones((1,), bool)])
    real_end = is_end & (s_ids < V)
    pos = jnp.arange(n, dtype=jnp.int32)
    sel = jnp.argsort(jnp.where(real_end, pos, n + pos))[:capr]
    sel_real = jnp.take(real_end, sel)
    c_sel = jnp.take(c, sel, axis=0)
    prev = jnp.concatenate([jnp.zeros((1, d), c.dtype), c_sel[:-1]])
    rows = jnp.where(sel_real[:, None], c_sel - prev, 0.0)
    tgt = jnp.where(sel_real, jnp.take(s_ids, sel), V + 1 + pos[:capr])
    return tgt, pack_grads(rows), real_end


def test_compact_block_kernel_matches_ranksort_path():
    """The r5 block-compaction kernel (ops/pallas/compact.py) must
    reproduce the XLA rank-sort compact front-end: same unique ids in the
    same (ascending) order, same run sums (to block-local-vs-global f32
    rounding), junk tail distinct and > vocab, overflow exact."""
    import numpy as np
    from goctr_tpu.ops.pallas.compact import compact_runsums_block

    rng = np.random.default_rng(0)
    V, n, d, capr = 3000, 4096, 16, 1024
    ids = rng.integers(0, 300, n).astype(np.int32)
    ids[rng.random(n) < 0.1] = -1
    g = rng.standard_normal((n, d)).astype(np.float32)
    ids_clean = jnp.where(jnp.asarray(ids) >= 0, jnp.asarray(ids), V)
    gz = jnp.asarray(g) * (jnp.asarray(ids) >= 0)[:, None]
    order = jnp.argsort(ids_clean)
    s_ids = jnp.take(ids_clean, order)
    g_s = jnp.take(gz, order, axis=0)
    tgt_ref, packed_ref, real_end = _compact_reference(s_ids, g_s, V,
                                                       capr, d)
    for interp in (False, True):
        tgt, rows_p, over = compact_runsums_block(s_ids, g_s, V, capr,
                                                  interpret=interp)
        m = np.asarray(tgt_ref) <= V
        np.testing.assert_array_equal(np.asarray(tgt)[m],
                                      np.asarray(tgt_ref)[m])
        np.testing.assert_allclose(np.asarray(rows_p)[m],
                                   np.asarray(packed_ref)[m],
                                   rtol=1e-5, atol=1e-4)
        assert int(over) == 0
        assert (np.asarray(tgt)[~m] > V).all()

    # overflow detection is exact
    _, _, over2 = compact_runsums_block(s_ids, g_s, V, 256)
    n_u = int(np.asarray(real_end).sum())
    assert int(over2) == max(n_u - 256, 0)


def test_compact_block_kernel_multiblock_runs():
    """A hot id spanning many 512-row blocks must sum exactly once via the
    open-run carry register (the multi-block-run edge case)."""
    import numpy as np
    from goctr_tpu.ops.pallas.compact import compact_runsums_block

    V, d = 100, 8
    n = 2048
    # id 7 occupies positions 100..1800 (spans 4 blocks); others sparse
    ids = np.full(n, V, np.int32)             # mostly pads
    ids[:100] = 3
    ids[100:1800] = 7
    ids[1800:1900] = 9
    s_ids = jnp.asarray(np.sort(ids))
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    g = g * (s_ids < V)[:, None]
    tgt, rows_p, over = compact_runsums_block(s_ids, g, V, 512)
    t = np.asarray(tgt)
    assert list(t[:3]) == [3, 7, 9]
    want7 = np.asarray(jnp.sum(g[100:1800], axis=0))
    np.testing.assert_allclose(np.asarray(rows_p)[1, :d], want7,
                               rtol=1e-5, atol=1e-4)
    assert int(over) == 0


def test_grouped_line_split_matches_rmw():
    """r5: the split-mode grouped-line optimizer (take + vectorized
    per-group adagrad + write-only scatter) must equal apply_line_updates
    in both fallback and interpret modes, junk line ids included."""
    import numpy as np
    from goctr_tpu.ops.pallas.row_optimizer import (
        apply_line_updates, apply_line_updates_split, group_size,
        pack_table_grouped)

    rng = np.random.default_rng(0)
    V, d = 300, 8
    w = rng.standard_normal((V, d)).astype(np.float32) * 0.1
    acc = rng.random(V).astype(np.float32)
    lines = pack_table_grouped(jnp.asarray(w), jnp.asarray(acc))
    L = lines.shape[0]
    n = 128
    k = min(n, L)
    lid = np.concatenate([rng.permutation(L)[:k],
                          L + 1 + np.arange(n - k)]).astype(np.int32)
    upd = rng.standard_normal((n, 128)).astype(np.float32)
    upd[k:] = 0
    for kind in ("adagrad", "sgd"):
        for interp in (False, True):
            a = apply_line_updates(lines + 0, jnp.asarray(lid),
                                   jnp.asarray(upd), lr=0.1, d=d,
                                   kind=kind, skip_ge=L, interpret=interp)
            b = apply_line_updates_split(lines + 0, jnp.asarray(lid),
                                         jnp.asarray(upd), lr=0.1, d=d,
                                         kind=kind, skip_ge=L,
                                         interpret=interp)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
