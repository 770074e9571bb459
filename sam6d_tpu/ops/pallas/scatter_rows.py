"""Row scatter-add (gather backward) as an on-chip one-hot matmul.

XLA's TPU scatter emitter serializes on duplicate indices: the
fine-stage PositionalEncoding neighbor gathers' backward — (B, M*S, C)
rows added into (B, N, C) targets where every target is hit ~S times —
measures 33 ms for 2M x 32 rows (tools/bench_scatter_grad.py round 4;
16 ns/row vs the 1.9 ns/row forward gather).  Sorting first makes it
WORSE (98 ms: indices_are_sorted buys nothing on TPU).

This kernel instead builds the scatter matrix on-chip, one (N, BQ)
one-hot tile at a time (never touching HBM), and runs the scatter as
an MXU matmul:

    out[b] = sum_q  onehot(idx[b, qtile])  @  dy[b, qtile]
             (N, BQ)                          (BQ, C)

accumulated in an f32 VMEM tile revisited across the q grid steps
(f32 accumulation — tighter than XLA's bf16 scatter-add).  FLOP cost
is B*N*Q*C MACs, which for the PE shapes (N=2048, C=32) is ~137 GMAC
— ~2.6 ms measured vs 33 ms for the XLA scatter.  The win requires
smallish N*C target blocks (the whole (N, C) accumulator lives in
VMEM) and pays B*N*Q compares on the VPU, so it is applied only where
that trade is favorable (see ops/pointcloud.gather_neighbors).

Reference analog: the CUDA group_points_grad kernel
(_ext_src/src/group_points_gpu.cu) uses atomicAdd — TPUs have no
atomics; the matmul formulation is the TPU-native equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scatter_rows_kernel(idx_ref, dy_ref, out_ref, *, block_q: int):
    b = pl.program_id(0)
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    # idx lives whole in VMEM (a (1, BQ) int block is not a legal
    # Mosaic tiling); slice the current q tile dynamically.
    idx = idx_ref[pl.ds(b, 1), pl.ds(q * block_q, block_q)]  # (1, BQ)
    dy = dy_ref[0]  # (BQ, C)
    n = out_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, block_q), 0)
    onehot = (iota == idx).astype(dy.dtype)  # (N, BQ); -1 pad matches none
    out_ref[0] += jax.lax.dot_general(
        onehot, dy, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def scatter_rows_pallas(
    idx: jax.Array, dy: jax.Array, n_targets: int, block_q: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """sum dy rows into their idx target rows, per batch item.

    Args:
      idx: (B, Q) int32, values in [0, n_targets) (or negative = drop).
      dy: (B, Q, C).
      n_targets: N, number of target rows per batch item.

    Returns:
      (B, N, C) f32 with out[b, j] = sum_{q: idx[b, q] == j} dy[b, q].
    """
    B, Q = idx.shape
    C = dy.shape[-1]
    bq = min(block_q, _round_up(Q, 128))
    Qp = _round_up(Q, bq)
    if Qp != Q:
        idx = jnp.pad(idx, ((0, 0), (0, Qp - Q)), constant_values=-1)
        dy = jnp.pad(dy, ((0, 0), (0, Qp - Q), (0, 0)))
    return pl.pallas_call(
        functools.partial(_scatter_rows_kernel, block_q=bq),
        grid=(B, Qp // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, C), lambda b, q: (b, q, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_targets, C), lambda b, q: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_targets, C), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), dy)


@functools.partial(jax.jit, static_argnames=("n_targets",))
def scatter_rows_xla(idx: jax.Array, dy: jax.Array, n_targets: int):
    """Reference/CPU path: flat-index XLA scatter-add (f32 accum)."""
    B, Q = idx.shape
    C = dy.shape[-1]
    offs = (jnp.arange(B, dtype=idx.dtype) * n_targets)[:, None]
    flat = jnp.where(idx >= 0, idx + offs, B * n_targets).reshape(-1)
    out = jnp.zeros((B * n_targets + 1, C), jnp.float32)
    out = out.at[flat].add(dy.reshape(-1, C).astype(jnp.float32))
    return out[:-1].reshape(B, n_targets, C)
