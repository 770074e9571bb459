"""Batched weighted Procrustes (rigid alignment by weighted SVD).

Re-derivation of reference utils/model_utils.py:343-455
(weighted_procrustes / WeightedProcrustes), with the closed-form 3x3 SVD
from sam6d_tpu.ops.svd3 instead of the CustomSVD/CustomDet host ops.
Fully batched: the coarse stage calls this with B*6000 three-point
hypotheses in one shot.

Convention (matches the reference): given src and ref point sets, returns
(R, t) such that ref ~= src @ R^T + t, i.e. ref_i = R src_i + t for row
vectors, and the inverse map used downstream is (ref - t) @ R.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sam6d_tpu.ops.svd3 import svd3x3, det3x3


def weighted_procrustes(
    src_points: jax.Array,
    ref_points: jax.Array,
    weights: jax.Array | None = None,
    weight_thresh: float = 0.0,
    eps: float = 1e-5,
):
    """Weighted rigid alignment src -> ref.

    Args:
      src_points: (..., N, 3).
      ref_points: (..., N, 3).
      weights: optional (..., N) non-negative weights.
      weight_thresh: weights below this are zeroed
        (reference model_utils.py:382).
      eps: weight-normalization epsilon.

    Returns:
      (R, t): R (..., 3, 3) proper rotation, t (..., 3) translation with
      ref ~= src @ R^T + t.
    """
    if weights is None:
        weights = jnp.ones(src_points.shape[:-1], src_points.dtype)
    weights = jnp.where(weights < weight_thresh, 0.0, weights)
    weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + eps)
    w = weights[..., None]  # (..., N, 1)

    src_centroid = jnp.sum(src_points * w, axis=-2, keepdims=True)
    ref_centroid = jnp.sum(ref_points * w, axis=-2, keepdims=True)
    src_c = src_points - src_centroid
    ref_c = ref_points - ref_centroid

    # H = src_c^T (w * ref_c): (..., 3, 3)
    H = jnp.einsum("...ni,...nj->...ij", src_c, w * ref_c)
    U, _, V = svd3x3(H)

    # Reflection fix: R = V diag(1, 1, sign(det(V U^T))) U^T.
    VUt = jnp.einsum("...ij,...kj->...ik", V, U)
    d = jnp.sign(det3x3(VUt))
    d = jnp.where(d == 0, 1.0, d)
    V_fixed = V.at[..., :, 2].multiply(d[..., None])
    R = jnp.einsum("...ij,...kj->...ik", V_fixed, U)

    t = ref_centroid[..., 0, :] - jnp.einsum(
        "...ij,...j->...i", R, src_centroid[..., 0, :]
    )
    return R, t
