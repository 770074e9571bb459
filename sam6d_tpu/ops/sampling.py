"""Weighted hypothesis sampling via co-sorted inverse-CDF lookup.

Replaces reference CustomSearchSorted (utils/model_utils.py:457-467, C++
binary search in ov_pointnet2_op/custom_searchsorted.cpp:62-110).  The
reference's deployed fallback (`weighted_sampling_onnx_compatible`,
model_utils.py:277-305) materializes a (B, S, N) comparison tensor and is
flagged OOM-prone.

TPU note: `jnp.searchsorted`'s default binary search lowers to a
log2(N)-deep `while` of dynamic gathers — measured 3.9 ms/frame at the
PEM coarse-sampling shape (18k draws over a 38k-bin CDF), more than half
the serving forward.  A single co-sort of [cdf; queries] computes every
rank at once on the TPU sort unit (equivalent to searchsorted
method='sort'), measured ~0.1 ms at the same shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Compare dtype for the (B, S, N) CDF compare-and-count passes in
# weighted_sample_2d.  float16 (not bf16): near cdf~1.0 f16 spacing is
# 2^-11 so a bin's mass distorts by <~0.05% absolute; bf16's 2^-8
# spacing could swallow whole small bins.  Module-level so perf bisects
# (tools/bisect_serving_perf.py) can A/B it without editing the op.
_CDF_COMPARE_DTYPE = jnp.float16


def searchsorted_by_sort(sorted_ref: jax.Array, queries: jax.Array) -> jax.Array:
    """Batched side='left' searchsorted computed by co-sorting
    (jnp.searchsorted method='sort') instead of a binary-search loop."""
    import functools

    return jax.vmap(
        functools.partial(jnp.searchsorted, method="sort")
    )(sorted_ref, queries)


def weighted_sample_2d(
    key: jax.Array,
    scores: jax.Array,
    num_samples: int,
    eps: float = 1e-8,
) -> tuple[jax.Array, jax.Array]:
    """Sample (row, col) index pairs proportional to a 2-D score matrix.

    Chain-rule factorization P(n, m) = P(n) P(m|n): draw the row from
    the (B, N) marginal CDF, then the column from the chosen row's
    (B, M) conditional CDF.  Statistically identical to flattened
    inverse-CDF sampling, but on TPU both lookups are short-row
    compare-and-count reductions instead of one searchsorted over an
    N*M-bin CDF (a 38416-bin CDF costs a log-depth gather loop — 3.9 ms
    — or a single long co-sort — 0.65 ms — at the PEM coarse shape;
    this form measures ~0.1 ms).

    Args:
      key: PRNG key.
      scores: (B, N, M) non-negative sampling weights.
      num_samples: draws per batch row (static).

    Returns:
      (idx_n, idx_m): two (B, num_samples) int32 index arrays.
    """
    B, N, M = scores.shape
    k1, k2 = jax.random.split(key)
    # The compare-and-count passes touch (B, S, N) values; 16-bit halves
    # that traffic.  float16 (not bf16): near cdf≈1.0 the spacing is
    # 2^-11, so a bin's mass is distorted by at most ~0.05% absolute —
    # bf16's 2^-8 spacing could swallow whole small bins.  Quantile-level
    # error is <0.05% either way; the per-bin bound is what matters for
    # proportional sampling (parity with the reference is defined at the
    # pose level, its RNG differs anyway — SURVEY.md §7 hard parts).
    cmp_dt = _CDF_COMPARE_DTYPE
    row = jnp.sum(scores, axis=2)  # (B, N) marginal
    row_cdf = jnp.cumsum(row, axis=1)
    row_cdf = (row_cdf / (row_cdf[:, -1:] + eps)).astype(cmp_dt)
    u1 = jax.random.uniform(k1, (B, num_samples, 1)).astype(cmp_dt)
    # side='left' searchsorted == count of cdf entries strictly below u.
    idx_n = jnp.sum(
        (row_cdf[:, None, :] < u1).astype(jnp.int32), axis=2
    )
    idx_n = jnp.clip(idx_n, 0, N - 1)

    from sam6d_tpu.ops.pointcloud import batched_row_gather

    col_cdf = jnp.cumsum(scores, axis=2)
    col_cdf = (col_cdf / (col_cdf[:, :, -1:] + eps)).astype(cmp_dt)
    rows = batched_row_gather(col_cdf, idx_n)  # (B, S, M)
    u2 = jax.random.uniform(k2, (B, num_samples, 1)).astype(cmp_dt)
    idx_m = jnp.sum((rows < u2).astype(jnp.int32), axis=2)
    idx_m = jnp.clip(idx_m, 0, M - 1)
    return idx_n.astype(jnp.int32), idx_m.astype(jnp.int32)


def weighted_sample(
    key: jax.Array,
    scores: jax.Array,
    num_samples: int,
    eps: float = 1e-8,
) -> jax.Array:
    """Sample indices in proportion to non-negative scores.

    Args:
      key: PRNG key.
      scores: (B, N) non-negative sampling weights.
      num_samples: number of draws per batch row (static).

    Returns:
      (B, num_samples) int32 indices in [0, N).
    """
    B, N = scores.shape
    cumsum = jnp.cumsum(scores, axis=1)
    cumsum = cumsum / (cumsum[:, -1:] + eps)
    u = jax.random.uniform(key, (B, num_samples), dtype=cumsum.dtype)
    idx = searchsorted_by_sort(cumsum, u)
    return jnp.clip(idx, 0, N - 1).astype(jnp.int32)
