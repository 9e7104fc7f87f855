"""On-chip Pallas-kernel microbench harness (amortized-scan methodology).

The axon relay adds ~30ms per dispatch and repeat-same-input microbenches
report impossible numbers (see .claude/skills/verify/SKILL.md), so every
timing here amortizes ONE dispatch over `reps` *varied* inputs with an
in-graph `lax.scan`, and reports per-call wall-clock plus effective HBM
bandwidth for the dominant stream.

    python scripts/bench_kernels.py din      [--b=1024 --t=512 --d=64]
    python scripts/bench_kernels.py gather   [--v=1000000 --b=4096 --k=64 --d=128]

Results are recorded in BENCH_NOTES.md.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    # the env's sitecustomize pins JAX_PLATFORMS=axon after importing jax,
    # so the env var alone is ignored — update the live config (backends
    # initialize lazily; same trick as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")


def _arg(name: str, default: int) -> int:
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return int(a.split("=", 1)[1])
    return default


def _timed_scan(fn, xs, label: str, bytes_per_call: float, reps: int,
                consts=()):
    """One dispatch scanning fn over `reps` varied inputs; returns s/call.

    Any large array fn needs (embedding table, grad block, ...) MUST go in
    `consts`, which are threaded as explicit jit arguments — a closure
    capture becomes an HLO constant and the relay's remote-compile endpoint
    rejects the multi-hundred-MB request body with HTTP 413 (measured)."""

    @jax.jit
    def run(consts, xs):
        def body(acc, x):
            return acc + jnp.sum(fn(*consts, *x)), None
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    out = float(run(consts, xs))  # compile + warm
    t0 = time.perf_counter()
    out = float(run(consts, xs))
    dt = (time.perf_counter() - t0) / reps
    gbs = bytes_per_call / dt / 1e9
    print(f"{label:28s} {dt * 1e3:9.3f} ms/call   {gbs:8.1f} GB/s   "
          f"(checksum {out:.3e})")
    return dt


def bench_din(reps: int = 32):
    from goctr_tpu.ops.pallas.din_attention import (
        din_attention_pool_jnp, din_attention_pool_pallas)

    b, t, d = _arg("b", 1024), _arg("t", 512), _arg("d", 64)
    key = jax.random.key(0)
    kb, ki = jax.random.split(key)
    behs = jax.random.normal(kb, (reps, b, t, d), jnp.float32)
    items = jax.random.normal(ki, (reps, b, d), jnp.float32)
    att0 = jnp.ones((t,), jnp.float32)
    mask = jnp.ones((b, t), jnp.float32)
    # dominant stream: the [B, T, D] behavior read
    nbytes = b * t * d * 4.0
    print(f"DIN attention pool  B={b} T={t} D={d}  ({reps} varied inputs, "
          f"one dispatch)")
    dt_j = _timed_scan(lambda bh, it: din_attention_pool_jnp(
        bh, it, att0, mask), (behs, items), "jnp (XLA-fused)", nbytes, reps)
    dt_p = _timed_scan(lambda bh, it: din_attention_pool_pallas(
        bh, it, att0, mask), (behs, items), "pallas (blockwise)", nbytes,
        reps)
    print(f"pallas/jnp speedup: {dt_j / dt_p:.2f}x")


def bench_gather(reps: int = 32):
    from goctr_tpu.ops.pallas.embedding_lookup import (
        fused_gather_pool_jnp, fused_gather_pool_pallas)

    v, b, k, d = (_arg("v", 1_000_000), _arg("b", 4096), _arg("k", 64),
                  _arg("d", 128))
    key = jax.random.key(0)
    table = jax.random.normal(key, (v, d), jnp.float32) * 0.01
    ids = jax.random.randint(jax.random.key(1), (reps, b, k), 0, v,
                             jnp.int32)
    nbytes = b * k * d * 4.0        # K random row-reads per output row
    print(f"gather+pool  V={v} B={b} K={k} D={d}  ({reps} varied inputs, "
          f"one dispatch)")
    _timed_scan(lambda tab, i: fused_gather_pool_jnp(tab, i, "mean"), (ids,),
                "jnp take+sum", nbytes, reps, consts=(table,))
    _timed_scan(lambda tab, i: fused_gather_pool_pallas(tab, i, "mean"),
                (ids,), "pallas (scalar-prefetch)", nbytes, reps,
                consts=(table,))


def bench_scatter(reps: int = 8):
    """XLA scatter-add row-update rate into a large table — the wall that
    caps sparse CTR training (BENCH_NOTES: ~4M serial row-updates/s).
    Measures plain .at[].add vs sorted+unique-promised lax.scatter_add, and
    a no-scatter sort+segment-sum control to isolate the scatter cost."""
    import jax.numpy as jnp

    v, n, d = _arg("v", 12_000_000), _arg("n", 1_048_576), _arg("d", 64)
    key = jax.random.key(0)
    table = jax.random.normal(key, (v, d), jnp.float32) * 0.01
    # unique ids per rep: disjoint strided ranges → no duplicates, random-ish
    # HBM placement; sorted variant sorts in-graph
    ids = jax.random.randint(jax.random.key(1), (reps, n), 0, v, jnp.int32)
    g = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
    nbytes = n * d * 4.0 * 2.0          # RMW of n rows

    def plain(tab, g, i):
        return tab.at[i].add(g)

    def sorted_unique(tab, g, i):
        from goctr_tpu.ops.scatter import scatter_add_rows
        si = jnp.sort(i)                 # dups possible but rare (n ≪ v)
        return scatter_add_rows(tab, si, g, sorted_ids=True)

    def sort_only(tab, g, i):
        si = jnp.sort(i)
        seg = jnp.cumsum(jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (si[1:] != si[:-1]).astype(jnp.int32)])) - 1
        rows = jax.ops.segment_sum(g, seg, num_segments=n,
                                   indices_are_sorted=True)
        return tab.at[0, :1].add(rows[0, :1])   # keep segsum live, no scatter

    print(f"scatter-add row updates  V={v} n={n} D={d}  ({reps} varied id "
          f"sets, one dispatch; table carried through the scan)")
    for label, fn in [("plain .at[].add", plain),
                      ("sorted scatter_add", sorted_unique),
                      ("sort+segsum (no scatter)", sort_only)]:

        @jax.jit
        def run(tab, g, ids, fn=fn):     # g explicit: closure => HTTP 413
            return jax.lax.scan(lambda t, i: (fn(t, g, i), None), tab,
                                ids)[0]

        out = run(table, g, ids)
        jax.block_until_ready(out)       # compile + warm
        t0 = time.perf_counter()
        out = run(table, g, ids)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:28s} {dt * 1e3:9.3f} ms/call   "
              f"{nbytes / dt / 1e9:8.1f} GB/s   "
              f"-> {n / dt / 1e6:.2f}M row-updates/s")


def bench_fused(reps: int = 8):
    """Fused Pallas row-optimizer (ops/pallas/row_optimizer.py) at bench
    scale, kernel-only: isolates the kernel from the dedup pipeline (sort +
    segment_sum) it sits behind in parallel/scanned.py — if bench.py
    --mode=fused faults the worker but this passes, the pipeline is the
    suspect; if this faults, the kernel is."""
    from goctr_tpu.ops.pallas.row_optimizer import (
        ROWS_PER_STEP, apply_row_updates, pack_grads)

    v, n, d = _arg("v", 10_000_000), _arg("n", 540_672), _arg("d", 64)
    junkpct = _arg("junkpct", 0)     # % of rows targeting junk ids >= v
    n = -(-n // ROWS_PER_STEP) * ROWS_PER_STEP
    v_alloc = v + (n + 2 if junkpct else 0)
    table = jnp.zeros((v_alloc, 128), jnp.float32)  # packed (w | acc | pad)
    # pairwise-distinct in-bounds ids per rep (kernel contract): strided
    # walk with a stride coprime to V, distinct phase per rep
    import math

    import numpy as np
    stride = 7_919_993                               # prime, ≉ V/k
    if n > v or math.gcd(stride, v) != 1:
        raise SystemExit(
            f"--v={v}: need n ({n}) <= v and gcd({stride}, v) == 1, else "
            "the strided walk repeats ids and races the kernel's "
            "overlapping row DMAs (pairwise-distinct contract)")
    base = (np.arange(n, dtype=np.int64) * stride) % v
    ids = ((base[None, :] + np.arange(reps, dtype=np.int64)[:, None] * 101)
           % v).astype(np.int32)
    g = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
    if junkpct:
        # interleave junk targets (>= v, zero g) at the bench-scale dedup
        # ratio — measures the skip_ge DMA-skip win kernel-only
        is_junk = np.random.default_rng(3).random(n) < junkpct / 100.0
        ids = np.where(is_junk[None, :],
                       v + 1 + np.arange(n, dtype=np.int64)[None, :],
                       ids).astype(np.int32)
        g = g * jnp.asarray(~is_junk, jnp.float32)[:, None]
    ids = jnp.asarray(ids)
    g = pack_grads(g)
    nbytes = n * 128 * 4.0 * 2.0                     # packed-row RMW

    import functools

    # donate the packed table: without it the scan carry double-buffers
    # the [V, 128] table (2 x 5.1GB at V=10M -> RESOURCE_EXHAUSTED, measured)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(tab, g, ids):                 # g explicit: closure => HTTP 413
        return jax.lax.scan(
            lambda t, i: (apply_row_updates(
                t, i, g, lr=0.1, d=d,
                skip_ge=v if junkpct else None), None),
            tab, ids)[0]

    from goctr_tpu.ops.pallas.row_optimizer import apply_row_updates_split

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_split(tab, g, ids):
        return jax.lax.scan(
            lambda t, i: (apply_row_updates_split(
                t, i, g, lr=0.1, d=d,
                skip_ge=v if junkpct else None), None),
            tab, ids)[0]

    print(f"fused row-optimizer  V={v} n={n} D={d} junk={junkpct}%  "
          f"({reps} varied id sets, one dispatch; packed table carried "
          f"through the scan)")
    out = run(table, g, ids)
    # block_until_ready on a DONATED output through the relay reports
    # impossible times (r3: 0.024 ms/call "22 TB/s"); force a host checksum
    # inside the timed region instead
    print("warm checksum", float(jnp.sum(out[:, :1])))
    t0 = time.perf_counter()
    out = run(out, g, ids)                 # table was donated: reuse output
    cs = float(jnp.sum(out[:, :1]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{'pallas fused adagrad (RMW)':28s} {dt * 1e3:9.3f} ms/call   "
          f"{nbytes / dt / 1e9:8.1f} GB/s   "
          f"-> {n / dt / 1e6:.2f}M row-updates/s   "
          f"(checksum {cs:.3e})")
    out2 = run_split(out, g, ids)
    print("warm checksum", float(jnp.sum(out2[:, :1])))
    t0 = time.perf_counter()
    out2 = run_split(out2, g, ids)
    cs = float(jnp.sum(out2[:, :1]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{'split take+math+scatter':28s} {dt * 1e3:9.3f} ms/call   "
          f"{nbytes / dt / 1e9:8.1f} GB/s   "
          f"-> {n / dt / 1e6:.2f}M row-updates/s   "
          f"(checksum {cs:.3e})")


def bench_segsum(reps: int = 8):
    """Stage timings of the scatter-free dedup front-end at bench scale:
    isolates what the fused trainer's non-kernel 'pipeline' time buys
    (argsort, row permute, blockwise run sums, grad packing)."""
    import numpy as np

    from goctr_tpu.ops.pallas.row_optimizer import pack_grads
    from goctr_tpu.ops.segsum import segment_rows_dedup, sorted_run_sums

    v, n, d = _arg("v", 10_000_000), _arg("n", 540_672), _arg("d", 64)
    n = -(-n // 1024) * 1024
    # zipf-shaped duplicate-heavy ids (the bench workload's id law)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import _zipf_ranks
    rng = np.random.default_rng(0)
    ids = jnp.asarray(np.stack(
        [(_zipf_ranks(rng, (n,), v // 2) * 2_654_435_761) % v
         for _ in range(reps)]).astype(np.int32))
    g = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
    nbytes = n * d * 4.0

    def sort_take(g, i):
        order = jnp.argsort(i)
        return jnp.take(g, order, axis=0)

    def sort_only(g, i):
        return jnp.sort(i)[:, None].astype(jnp.float32) * g[:1, :1]

    def runsums(g, i):
        order = jnp.argsort(i)
        s_ids = jnp.take(i, order)
        s_rows = jnp.take(g, order, axis=0)
        _, rows = sorted_run_sums(s_ids, s_rows, junk_base=v + 1)
        return rows

    def full_front(g, i):
        tgt, rows = segment_rows_dedup(i, g, v)
        return pack_grads(rows) * 1.0 + tgt[:, None].astype(jnp.float32)

    print(f"segsum front-end  V={v} n={n} D={d}  ({reps} varied id sets, "
          f"one dispatch)")
    _timed_scan(sort_only, (ids,), "argsort ids only", n * 4.0, reps,
                consts=(g,))
    _timed_scan(sort_take, (ids,), "argsort + row permute", 2 * nbytes,
                reps, consts=(g,))
    _timed_scan(runsums, (ids,), "+ blockwise run sums", 4 * nbytes, reps,
                consts=(g,))
    _timed_scan(full_front, (ids,), "full front-end + pack_grads",
                6 * nbytes, reps, consts=(g,))


def bench_stages(reps: int = 4):
    """Stage table of the CURRENT default fused+compact batch (bs=65536 →
    n = bs·(T+1) = 2,162,688 update rows, V=10M, D=64) — VERDICT r4
    next-#1 said round 5 would otherwise optimize blind. Cumulative stages
    mirror parallel/scanned._table_update's fused+compact path, plus the
    candidate replacement for the compaction rank-sort (flag cumsum +
    searchsorted — no second 2.16M argsort)."""
    import numpy as np

    from goctr_tpu.ops.pallas.row_optimizer import pack_grads
    from goctr_tpu.ops.segsum import _cumsum_rows

    v, d = _arg("v", 10_000_000), _arg("d", 64)
    bs = _arg("bs", 65536)
    t = _arg("t", 32)
    n = bs * (t + 1)
    n = -(-n // 1024) * 1024
    cap = _arg("cap", 380_928)          # ≈ measured uniques + 15%, 1024-mult
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import _zipf_ranks
    rng = np.random.default_rng(0)
    ids = jnp.asarray(np.stack(
        [(_zipf_ranks(rng, (n,), v // 2) * 2_654_435_761) % v
         for _ in range(reps)]).astype(np.int32))
    g = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
    table = jax.lax.broadcasted_iota(jnp.float32, (v, 128), 0) * 1e-6
    nbytes = n * d * 4.0

    def fwd_gather(tab, i):
        return jnp.take(tab, i, axis=0)[:, :d]

    def sort_only(g, i):
        return jnp.sort(i)[:, None].astype(jnp.float32) * g[:1, :1]

    def sort_take(g, i):
        order = jnp.argsort(i)
        return jnp.take(g, order, axis=0)

    def sort_take_cumsum(g, i):
        order = jnp.argsort(i)
        c = _cumsum_rows(jnp.take(g, order, axis=0))
        return c[-1:]

    def compact_ranksort(g, i):
        """Current compact front-end: 2nd argsort selects run-end rows."""
        order = jnp.argsort(i)
        s_ids = jnp.take(i, order)
        c = _cumsum_rows(jnp.take(g, order, axis=0))
        is_end = jnp.concatenate([s_ids[1:] != s_ids[:-1],
                                  jnp.ones((1,), bool)])
        real_end = is_end & (s_ids < v)
        pos = jnp.arange(n, dtype=jnp.int32)
        sel = jnp.argsort(jnp.where(real_end, pos, n + pos))[:cap]
        sel_real = jnp.take(real_end, sel)
        c_sel = jnp.take(c, sel, axis=0)
        prev = jnp.concatenate([jnp.zeros((1, d), c.dtype), c_sel[:-1]])
        rows = jnp.where(sel_real[:, None], c_sel - prev, 0.0)
        tgt = jnp.where(sel_real, jnp.take(s_ids, sel), v + 1 + pos[:cap])
        return pack_grads(rows) + tgt[:, None].astype(jnp.float32)

    def compact_searchsorted(g, i):
        """Candidate: run-end positions are ALREADY ascending (ids sorted)
        — rank = cumsum(flag); the k-th end position = searchsorted(rank,
        k+1). Kills the second n-element argsort."""
        order = jnp.argsort(i)
        s_ids = jnp.take(i, order)
        c = _cumsum_rows(jnp.take(g, order, axis=0))
        is_end = jnp.concatenate([s_ids[1:] != s_ids[:-1],
                                  jnp.ones((1,), bool)])
        real_end = is_end & (s_ids < v)
        rank = jnp.cumsum(real_end.astype(jnp.int32))
        sel = jnp.searchsorted(
            rank, jnp.arange(1, cap + 1, dtype=jnp.int32), side="left")
        sel_real = jnp.arange(cap, dtype=jnp.int32) < rank[-1]
        selc = jnp.minimum(sel, n - 1)
        c_sel = jnp.take(c, selc, axis=0)
        prev = jnp.concatenate([jnp.zeros((1, d), c.dtype), c_sel[:-1]])
        rows = jnp.where(sel_real[:, None], c_sel - prev, 0.0)
        tgt = jnp.where(sel_real, jnp.take(s_ids, selc),
                        v + 1 + jnp.arange(cap, dtype=jnp.int32))
        return pack_grads(rows) + tgt[:, None].astype(jnp.float32)

    def compact_A_ranksort_only(g, i):
        order = jnp.argsort(i)
        s_ids = jnp.take(i, order)
        c = _cumsum_rows(jnp.take(g, order, axis=0))
        is_end = jnp.concatenate([s_ids[1:] != s_ids[:-1],
                                  jnp.ones((1,), bool)])
        real_end = is_end & (s_ids < v)
        pos = jnp.arange(n, dtype=jnp.int32)
        sel = jnp.argsort(jnp.where(real_end, pos, n + pos))[:cap]
        return sel[:, None].astype(jnp.float32) * c[:1, :1]

    def compact_B_no_pack(g, i):
        order = jnp.argsort(i)
        s_ids = jnp.take(i, order)
        c = _cumsum_rows(jnp.take(g, order, axis=0))
        is_end = jnp.concatenate([s_ids[1:] != s_ids[:-1],
                                  jnp.ones((1,), bool)])
        real_end = is_end & (s_ids < v)
        pos = jnp.arange(n, dtype=jnp.int32)
        sel = jnp.argsort(jnp.where(real_end, pos, n + pos))[:cap]
        sel_real = jnp.take(real_end, sel)
        c_sel = jnp.take(c, sel, axis=0)
        prev = jnp.concatenate([jnp.zeros((1, d), c.dtype), c_sel[:-1]])
        rows = jnp.where(sel_real[:, None], c_sel - prev, 0.0)
        tgt = jnp.where(sel_real, jnp.take(s_ids, sel), v + 1 + pos[:cap])
        return rows[:1] + tgt[:1, None].astype(jnp.float32)

    def ranksort_boolkey(g, i):
        """rank-sort with a BOOL key (stable argsort keeps end order) —
        candidate replacement for the int32 where(real_end,pos,n+pos) key."""
        order = jnp.argsort(i)
        s_ids = jnp.take(i, order)
        c = _cumsum_rows(jnp.take(g, order, axis=0))
        is_end = jnp.concatenate([s_ids[1:] != s_ids[:-1],
                                  jnp.ones((1,), bool)])
        real_end = is_end & (s_ids < v)
        sel = jnp.argsort(jnp.logical_not(real_end), stable=True)[:cap]
        return sel[:, None].astype(jnp.float32) * c[:1, :1]

    def permute_cumsum_bf16(g, i):
        """bf16 row permute (halves the random-gather traffic) + f32
        cumsum — candidate numeric trade."""
        order = jnp.argsort(i)
        gs = jnp.take(g.astype(jnp.bfloat16), order, axis=0)
        c = _cumsum_rows(gs.astype(jnp.float32))
        return c[-1:]

    def compact_blocked_sel(g, i):
        """Full compact with the rank-sort replaced by BATCHED per-block
        argsorts (stable, 1024-wide) + a block-offset stitch: log²(1024)
        vs log²(n) compare work, fully parallel across blocks."""
        BB = 1024
        nb2 = n // BB
        order = jnp.argsort(i)
        s_ids = jnp.take(i, order)
        c = _cumsum_rows(jnp.take(g, order, axis=0))
        is_end = jnp.concatenate([s_ids[1:] != s_ids[:-1],
                                  jnp.ones((1,), bool)])
        real_end = is_end & (s_ids < v)
        re2 = real_end.reshape(nb2, BB)
        sel_loc = jnp.argsort(jnp.logical_not(re2), axis=1,
                              stable=True)                  # [nb2, BB]
        cnts = jnp.sum(re2.astype(jnp.int32), axis=1)
        offs = jnp.cumsum(cnts)
        total = offs[-1]
        k = jnp.arange(cap, dtype=jnp.int32)
        blk = jnp.minimum(jnp.searchsorted(offs, k, side="right"),
                          nb2 - 1).astype(jnp.int32)
        j = k - (jnp.take(offs, blk) - jnp.take(cnts, blk))
        sel = blk * BB + jnp.take(
            sel_loc.reshape(-1), blk * BB + jnp.clip(j, 0, BB - 1))
        sel_real = jnp.take(real_end, sel) & (k < total)
        c_sel = jnp.take(c, sel, axis=0)
        prev = jnp.concatenate([jnp.zeros((1, d), c.dtype), c_sel[:-1]])
        rows = jnp.where(sel_real[:, None], c_sel - prev, 0.0)
        tgt = jnp.where(sel_real, jnp.take(s_ids, sel), v + 1 + k)
        return pack_grads(rows) + tgt[:, None].astype(jnp.float32)

    print(f"fused+compact stage table  V={v} n={n} (bs={bs} T={t}) D={d} "
          f"cap={cap}  ({reps} varied id sets, one dispatch)")
    if "--parts" in sys.argv:
        _timed_scan(compact_blocked_sel, (ids,),
                    "compact D: blocked-argsort sel", 5 * nbytes, reps,
                    consts=(g,))
        _timed_scan(compact_A_ranksort_only, (ids,),
                    "compact A: +ranksort only", 5 * nbytes, reps,
                    consts=(g,))
        _timed_scan(ranksort_boolkey, (ids,),
                    "compact A2: bool-key ranksort", 5 * nbytes, reps,
                    consts=(g,))
        _timed_scan(permute_cumsum_bf16, (ids,),
                    "permute+cumsum (bf16 rows)", 2 * nbytes, reps,
                    consts=(g,))
        _timed_scan(compact_B_no_pack, (ids,), "compact B: +gathers+diff",
                    5 * nbytes, reps, consts=(g,))
        _timed_scan(compact_ranksort, (ids,), "compact C: +pack (CURRENT)",
                    5 * nbytes, reps, consts=(g,))
        return
    _timed_scan(fwd_gather, (ids,), "fwd take [n,128] + slice",
                n * 128 * 4.0, reps, consts=(table,))
    _timed_scan(sort_only, (ids,), "argsort ids", n * 4.0, reps, consts=(g,))
    _timed_scan(sort_take, (ids,), "+ row permute", 2 * nbytes, reps,
                consts=(g,))
    _timed_scan(sort_take_cumsum, (ids,), "+ blockwise cumsum", 4 * nbytes,
                reps, consts=(g,))
    _timed_scan(compact_ranksort, (ids,), "+ compact (rank-sort, CURRENT)",
                5 * nbytes, reps, consts=(g,))
    _timed_scan(compact_searchsorted, (ids,),
                "+ compact (searchsorted, NEW)", 5 * nbytes, reps,
                consts=(g,))


def bench_rowgather(reps: int = 8):
    """Random-row gather from a packed [V, 128] table at bench scale:
    XLA's (1, D)-slice gather (the fused trainer's r2 forward path) vs
    jnp.take of full packed rows vs the pipelined Pallas ring-DMA gather
    (ops/pallas/row_gather.py). The forward-only ceiling measured this
    bound at ~28.5 GB/s effective (BENCH_NOTES r2)."""
    from goctr_tpu.ops.pallas.row_gather import gather_rows_packed

    v, n, d = _arg("v", 10_000_000), _arg("n", 540_672), _arg("d", 64)
    n = -(-n // 2048) * 2048
    # row v holds value v·1e-6 in every lane: a wrong-row gather shows up
    # in the checksum (zeros would hide it)
    table = jax.lax.broadcasted_iota(jnp.float32, (v, 128), 0) * 1e-6
    ids = jax.random.randint(jax.random.key(1), (reps, n), 0, v, jnp.int32)
    nbytes = n * 128 * 4.0                  # full packed-row read

    def xla_slice(tab, i):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return jax.lax.gather(
            tab, i[:, None], dn, slice_sizes=(1, d),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    print(f"row gather  V={v} n={n} D={d}  ({reps} varied id sets, one "
          f"dispatch)")
    _timed_scan(xla_slice, (ids,), f"xla gather (1,{d}) slice",
                nbytes * d / 128.0, reps, consts=(table,))
    _timed_scan(lambda tab, i: jnp.take(tab, i, axis=0), (ids,),
                "jnp.take full rows", nbytes, reps, consts=(table,))
    _timed_scan(lambda tab, i: gather_rows_packed(tab, i), (ids,),
                "pallas ring-DMA", nbytes, reps, consts=(table,))


def main():
    whiches = sys.argv[1:] or ["din"]
    print("backend:", jax.default_backend(), jax.devices())
    from goctr_tpu.core.runtime import enable_compilation_cache
    enable_compilation_cache()
    for which in whiches:
        if which.startswith("--"):
            continue
        fn = {"din": bench_din, "gather": bench_gather,
              "scatter": bench_scatter, "fused": bench_fused,
              "rowgather": bench_rowgather, "segsum": bench_segsum,
              "stages": bench_stages}.get(which)
        if fn is None:
            raise SystemExit(f"unknown bench {which!r}")
        try:
            fn()
        except Exception as e:                    # keep later benches alive
            print(f"[{which}] FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:300]}")


if __name__ == "__main__":
    main()
