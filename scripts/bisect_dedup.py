"""Bisect the at-scale TPU-worker fault in the dedup table-update pipeline.

bench.py --mode=dedup / --mode=fused reproducibly crashed the TPU worker at
vocab=10M (BENCH_NOTES r2) while --mode=sorted and the kernel-only fused
bench ran clean — so the fault lives somewhere in the dedup pipeline
(parallel/scanned.py _table_update): segment-boundary cumsum, sentinel
scatter-set, segment_sum, or the unique+PROMISE_IN_BOUNDS scatter. Each
stage below adds ONE component on top of the proven-clean 'sorted' baseline,
at full bench scale, inside a lax.scan (mirroring the epoch structure).

    python scripts/bisect_dedup.py A   # argsort + sorted scatter  (control)
    python scripts/bisect_dedup.py B   # + seg cumsum + sentinel scatter-set
    python scripts/bisect_dedup.py C   # + segment_sum (rows summed)
    python scripts/bisect_dedup.py D   # full dedup (unique + IN_BOUNDS)
    python scripts/bisect_dedup.py E   # full dedup + Pallas fused kernel

Run each stage in its OWN process (a fault kills the process and wedges the
TPU grant ~10-15 min; probe with a trivial op before the next stage).
Timings here are end-to-end wall around one scan dispatch with varied ids —
per-SKILL.md, only that is trustworthy through the relay.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")


def _arg(name: str, default: int) -> int:
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return int(a.split("=", 1)[1])
    return default


def main():
    stage = next((a for a in sys.argv[1:] if not a.startswith("--")), "A")
    v = _arg("v", 10_000_000)
    n = _arg("n", 540_672)          # bs=16384 × (T=32 + 1)
    d = _arg("d", 64)
    reps = _arg("reps", 16)
    print(f"stage {stage}  V={v} n={n} D={d} reps={reps} "
          f"backend={jax.default_backend()}", flush=True)

    from goctr_tpu.core.runtime import enable_compilation_cache
    enable_compilation_cache()

    from goctr_tpu.ops.scatter import scatter_add_rows

    pad = 2 * n + 2                 # junk rows for dedup sentinel targets
    v_alloc = v + pad if stage in ("D", "E") else v
    key = jax.random.key(0)
    # ~15% pads (-1), rest uniform ids — the bench workload's shape
    raw = jax.random.randint(jax.random.key(1), (reps, n), 0, v, jnp.int32)
    padmask = jax.random.uniform(jax.random.key(2), (reps, n)) < 0.15
    ids = jnp.where(padmask, -1, raw)
    g = jax.random.normal(key, (n, d), jnp.float32) * 0.01

    if stage == "E":
        from goctr_tpu.ops.pallas.row_optimizer import pack_table
        table = pack_table(jnp.zeros((v_alloc, d), jnp.float32),
                           jnp.zeros((v_alloc,), jnp.float32))
    else:
        table = jnp.zeros((v_alloc, d), jnp.float32)

    def update(tab, ids_flat, g_flat):
        pos = jnp.arange(n, dtype=jnp.int32)
        if stage == "A":
            order = jnp.argsort(ids_flat)
            s_ids = jnp.take(ids_flat, order)       # -1 pads sort first
            s_g = jnp.take(g_flat, order, axis=0)
            return scatter_add_rows(tab, s_ids, s_g, sorted_ids=True)

        ids_clean = jnp.where(ids_flat >= 0, ids_flat, v + 1 + pos)
        order = jnp.argsort(ids_clean)
        s_ids = jnp.take(ids_clean, order)
        s_g = jnp.take(g_flat, order, axis=0)
        new = jnp.concatenate([jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
        seg = jnp.cumsum(new) - 1
        sentinel = v + 1 + n + pos
        uniq = sentinel.at[seg].set(s_ids, mode="promise_in_bounds")

        if stage == "B":
            # sentinel construction live (via the uniq dependency), but no
            # segment_sum and the proven sorted non-unique scatter; junk ids
            # clip to v-1 (ascending stays true) with zeroed rows
            idx = jnp.clip(jnp.minimum(s_ids, uniq[0] * 0 + s_ids), 0, v - 1)
            gm = s_g * (s_ids < v).astype(jnp.float32)[:, None]
            return scatter_add_rows(tab, idx, gm, sorted_ids=True)
        rows = jax.ops.segment_sum(s_g, seg, num_segments=n,
                                   indices_are_sorted=True)
        if stage == "C":
            # summed rows, but still the proven sorted non-unique scatter
            idx = jnp.clip(uniq, 0, v - 1)
            rows_m = rows * (uniq < v).astype(jnp.float32)[:, None]
            return scatter_add_rows(tab, idx, rows_m, sorted_ids=True)
        if stage == "D":
            in_b = jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
            from goctr_tpu.parallel.scanned import _SCAT_DNUMS
            return jax.lax.scatter_add(
                tab, uniq[:, None], rows, _SCAT_DNUMS,
                indices_are_sorted=True, unique_indices=True, mode=in_b)
        if stage == "E":
            from goctr_tpu.ops.pallas.row_optimizer import (
                apply_row_updates, pack_grads)
            return apply_row_updates(tab, uniq, pack_grads(rows), lr=0.1,
                                     d=d, kind="adagrad")
        raise SystemExit(f"unknown stage {stage}")

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(tab, g, ids):
        return jax.lax.scan(lambda t, i: (update(t, i, g), None), tab, ids)[0]

    t0 = time.perf_counter()
    out = run(table, g, ids)
    # force FULL materialization (donated-output block_until_ready through
    # the relay reports impossible times — checksum to host instead)
    cs = float(jnp.sum(out[:, :1]))
    t_compile = time.perf_counter() - t0
    print(f"compile+first: {t_compile:.1f}s  checksum {cs:.3e}", flush=True)

    t0 = time.perf_counter()
    out = run(out, g, ids)
    cs = float(jnp.sum(out[:, :1]))
    dt = (time.perf_counter() - t0) / reps
    print(f"stage {stage}: {dt * 1e3:.1f} ms/update  "
          f"({n / dt / 1e6:.2f}M rows/s)  checksum {cs:.3e}  PASS", flush=True)


if __name__ == "__main__":
    main()
