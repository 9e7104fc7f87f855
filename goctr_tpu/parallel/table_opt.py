"""Row-wise embedding-table optimizer config, shared by both trainers.

Lives in its own module so the single-device scanned trainer
(parallel/scanned.py) and the multi-chip sharded step (parallel/train.py)
can share one config without an import cycle. The reference has no sparse
trainer at all (embeddings are a frozen in-RAM Go map, rcmd.go:501-531);
row-wise adagrad here is the DLRM-standard update for learned tables.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class TableOptConfig:
    """Row-wise optimizer for the embedding table.

    update_mode selects the scatter strategy (measured on a v5e, 10M×64
    table, 540k update rows/batch — see BENCH_NOTES.md):
      * ``runfused`` — sort ids (duplicates kept) + the sorted-run fused
                     Pallas kernel (ops/pallas/run_optimizer.py): runs of
                     equal ids accumulate in VMEM, one read-modify-write
                     DMA pair per unique row, junk/pad rows skipped
                     pre-DMA. No run-sum pipeline, no junk table rows.
                     Requires D < 128 and vocab < 2^29.
      * ``fused``  — dedup pipeline + the Pallas fused row-optimizer kernel
                     (ops/pallas/row_optimizer.py): weights and adagrad
                     accumulator packed per 128-lane row, one pipelined
                     read-modify-write DMA pair per unique row instead of
                     XLA's two sequential scatter loops. Requires D < 128.
      * ``fused2`` — diff-mode fused: sort + one blockwise cumsum; the
                     kernel recovers each run's gradient sum as the diff
                     of consecutive run-end cumsum rows (prev_c register,
                     ops/pallas/row_optimizer.apply_csum_updates) — no
                     boundary gather/cummax/pack/junk rows. Requires
                     D < 128 and vocab < 2^30. Run sums come from f32
                     cumsum diffs, so rare-row updates carry cancellation
                     error that grows with batch size (~sqrt(n) cumsum
                     magnitude) — see the at-scale oracle check in
                     tests/test_pallas_kernels.py before trusting it on a
                     new workload.
      * ``dedup``  — sort ids, segment-sum duplicate rows, one scatter with
                     sorted+unique index guarantees; makes adagrad exact
                     (duplicates no longer race).
      * ``sorted`` — sort ids, scatter with indices_are_sorted only.
      * ``plain``  — direct .at[ids].add; simplest. XLA lowers every one of
                     the non-fused scatters to a sequential per-row loop
                     (~4M row-updates/s regardless of promises,
                     BENCH_NOTES.md) — ``fused`` is the fast path.
    The multi-chip sharded step (make_sharded_sparse_train_step) honors
    update_mode: packed modes (fused/runfused/fused2 — equivalent there,
    since rows arrive already deduplicated) run the Pallas RMW kernel on
    packed [V/m, 128] local tables; other modes use unique-promise
    scatters. Either way the exchange is dedup'd per data shard BEFORE the
    all_gather (exchange_cap) and merged exactly across shards.
    """
    kind: str = "adagrad"       # adagrad | sgd
    lr: float = 0.01
    eps: float = 1e-8
    # default = the measured-best mode at headline scale (BENCH_NOTES r3:
    # fused+skip 232.5k ex/s vs plain 123.7k); bench.py uses it as-is
    update_mode: str = "fused"  # fused | fused2 | runfused | dedup | sorted | plain
    # gather the batch's embedding rows in ascending-id order (one sort +
    # inverse take) instead of raw order — A/B knob for the HBM-random-read
    # bound of the forward gather
    sorted_gather: bool = False
    # forward-gather implementation for the fused (packed-table) mode
    # (A/B via bench.py --gather=..., measured at V=10M in BENCH_NOTES r3):
    # "take" = jnp.take of full packed rows + lane slice (29.5 GB/s);
    # "pallas" = pipelined ring-DMA row gather, ops/pallas/row_gather.py
    # (13.5 GB/s); "xla" = lax.gather with (1, D) partial-row slices
    # (0.2 GB/s — defeats XLA's fast row-gather path; kept as A/B record)
    gather_impl: str = "take"   # take | pallas | xla
    # single-chip fused front-end compaction: >0 compacts the position-
    # aligned dedup stream (n = batch·(T+1) slots, ~83% junk at headline
    # zipf traffic) to <=compact_cap real (id, run-sum) rows via one rank
    # sort before the RMW kernel — the kernel walks cap slots instead of n
    # and the [·, 128] grad pack shrinks likewise. Uniques beyond the cap
    # DROP their update (counted: TrainedScanned.update_overflow_max; size
    # it from measured batch uniqueness with margin). 0 = off (exact for
    # any batch). Run sums come from consecutive-run-end cumsum diffs
    # (fused2 math — at-scale cancellation bounded by
    # tests/test_pallas_kernels.py::test_fused2_cumsum_diff_cancellation*).
    compact_cap: int = 0
    # ---- multi-chip sharded update (make_sharded_sparse_train_step) ----
    # per-data-shard unique-row budget for the update exchange: each data
    # shard dedups its row gradients locally (scatter-free run sums) and
    # all_gathers only <=exchange_cap (id, run-sum) rows instead of its full
    # raw [n_local, D] gradient stream. 0 = n_local (exact for any batch,
    # no traffic cut). Uniques beyond the cap are DROPPED from the update
    # (the step reports them in its overflow counter — grow the cap if it
    # is ever nonzero). Rounded up to the Pallas grid multiple internally.
    exchange_cap: int = 0
    # compaction implementation for fused+compact (A/B via bench.py
    # --compact_impl=...): "xla" (default) = the rank-sort path; "kernel"
    # = the Pallas block-compaction pass (ops/pallas/compact.py — fuses
    # cumsum + run-end selection + diff + pack; needs vocab < 2^24).
    # MEASURED at the headline (BENCH_NOTES r5): the kernel's exactness
    # requirement forces HIGHEST-precision MXU selection matmuls whose
    # cost exceeds the XLA stages it deletes (279k vs 412k ex/s) — "xla"
    # stays the default; the kernel is kept as a correct A/B record.
    compact_impl: str = "xla"
    # fused-mode row-update implementation (A/B via bench.py --rmw=...):
    # "kernel" = the one-pass Pallas RMW (read+write DMA pair per row);
    # "split"  = take-read (XLA fixed-function gather, 57M rows/s) +
    #            vectorized adagrad math + write-only Pallas scatter —
    #            half the per-row DMA-issue work on the scalar core.
    # "split" is the measured default (BENCH_NOTES r5: 2.04x kernel-only,
    # +20% end-to-end headline, +30.5% at 100M x 16 grouped; identical
    # math — parity-tested both modes).
    rmw_impl: str = "split"
    # force Pallas interpret mode in the packed update kernels (CI exercise
    # of the kernel path on non-TPU backends, e.g. under shard_map on the
    # virtual mesh; never set on real TPU runs)
    pallas_interpret: bool = False
