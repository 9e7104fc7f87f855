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

import sys
import time

import jax
import jax.numpy as jnp


def _arg(name: str, default: int) -> int:
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return int(a.split("=", 1)[1])
    return default


def _timed_scan(fn, xs, label: str, bytes_per_call: float, reps: int):
    """One dispatch scanning fn over `reps` varied inputs; returns s/call."""

    @jax.jit
    def run(xs):
        def body(acc, x):
            return acc + jnp.sum(fn(*x)), None
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    out = float(run(xs))  # compile + warm
    t0 = time.perf_counter()
    out = float(run(xs))
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
    _timed_scan(lambda i: fused_gather_pool_jnp(table, i, "mean"), (ids,),
                "jnp take+sum", nbytes, reps)
    _timed_scan(lambda i: fused_gather_pool_pallas(table, i, "mean"), (ids,),
                "pallas (scalar-prefetch)", nbytes, reps)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "din"
    print("backend:", jax.default_backend(), jax.devices())
    from goctr_tpu.core.runtime import enable_compilation_cache
    enable_compilation_cache()
    if which == "din":
        bench_din()
    elif which == "gather":
        bench_gather()
    else:
        raise SystemExit(f"unknown bench {which!r}")


if __name__ == "__main__":
    main()
