"""Microbench: alternatives for the grouped-gather BACKWARD scatter-add.

The round-4 train-step trace (tools/trace_train_step.py, bs 16) shows
the fine-stage PositionalEncoding neighbor gathers' backward — a
scatter-add of (B*N*S, C) rows into (B*N, C) targets — costing
31 ms x2 (ns=64) + 15.5 ms x2 (ns=32) = 93 ms of the 420 ms step,
while the matching FORWARD gather is 3.9 ms (row-count bound,
BASELINE.md).  XLA's variadic scatter emitter serializes on duplicate
indices; these indices hit every target ~S times.

Variants measured here (shapes straight from the trace):
  scatter_bf16    what XLA emits today: zeros.at[idx].add(dy)
  scatter_f32     same, f32 accumulator
  sorted_scatter  sort (idx, row) first, then .at[].add(
                  indices_are_sorted=True)
  sorted_segsum   sort + permute rows + jax.ops.segment_sum(sorted)
  slot_scatter    S separate 1-slot scatters (fewer dups each), summed

Usage: python -u tools/bench_scatter_grad.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.utils.timer import device_time_per_iter

    B, N, S, C = 16, 2048, 64, 32
    T = B * N
    Q = B * N * S
    rng = np.random.RandomState(0)
    # Ball-query-like: every target referenced ~S times (uniform over
    # the batch item), offsets folded like batched_row_gather's caller.
    idx_np = (
        rng.randint(0, N, (B, N, S)) + np.arange(B)[:, None, None] * N
    ).astype(np.int32)
    idx = jnp.asarray(idx_np.reshape(-1))
    dy = jnp.asarray(rng.randn(Q, C).astype(np.float32), jnp.bfloat16)

    def scatter_bf16(dy, idx):
        return jnp.zeros((T, C), jnp.bfloat16).at[idx].add(dy)

    def scatter_f32(dy, idx):
        out = jnp.zeros((T, C), jnp.float32).at[idx].add(
            dy.astype(jnp.float32)
        )
        return out.astype(jnp.bfloat16)

    def sorted_scatter(dy, idx):
        sidx, perm = jax.lax.sort(
            (idx, jnp.arange(Q, dtype=jnp.int32)), num_keys=1
        )
        sdy = jnp.take(dy, perm, axis=0)
        return (
            jnp.zeros((T, C), jnp.bfloat16)
            .at[sidx]
            .add(sdy, indices_are_sorted=True)
        )

    def sorted_segsum(dy, idx):
        sidx, perm = jax.lax.sort(
            (idx, jnp.arange(Q, dtype=jnp.int32)), num_keys=1
        )
        sdy = jnp.take(dy, perm, axis=0)
        return jax.ops.segment_sum(
            sdy, sidx, num_segments=T, indices_are_sorted=True
        )

    def slot_scatter(dy, idx):
        d = dy.reshape(B * N, S, C).transpose(1, 0, 2)  # (S, BN, C)
        i = idx.reshape(B * N, S).transpose(1, 0)  # (S, BN)

        def body(acc, si):
            s_dy, s_idx = si
            return acc.at[s_idx].add(s_dy), None

        out, _ = jax.lax.scan(
            body, jnp.zeros((T, C), jnp.bfloat16), (d, i)
        )
        return out

    fns = {
        "scatter_bf16": scatter_bf16,
        "scatter_f32": scatter_f32,
        "sorted_scatter": sorted_scatter,
        "sorted_segsum": sorted_segsum,
        "slot_scatter": slot_scatter,
    }
    ref = None
    out = {}
    for name, fn in fns.items():
        r = np.asarray(jax.jit(fn)(dy, idx), np.float32)
        if ref is None:
            ref = r
        else:
            # bf16 accumulation orders differ; loose check only.
            assert np.allclose(r, ref, atol=2.0), name
        dt = device_time_per_iter(fn, 0, (dy, idx), iters=args.iters)
        out[name] = round(dt * 1e3, 3)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
