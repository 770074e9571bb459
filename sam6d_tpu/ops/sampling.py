"""Weighted hypothesis sampling via searchsorted.

Replaces reference CustomSearchSorted (utils/model_utils.py:457-467, C++
binary search in ov_pointnet2_op/custom_searchsorted.cpp:62-110).  The
reference's deployed fallback (`weighted_sampling_onnx_compatible`,
model_utils.py:277-305) materializes a (B, S, N) comparison tensor and is
flagged OOM-prone; `jnp.searchsorted` is O(B*S*log N) and XLA-native, so
we use it directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    idx = jax.vmap(jnp.searchsorted)(cumsum, u)
    return jnp.clip(idx, 0, N - 1).astype(jnp.int32)
