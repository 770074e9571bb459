"""Batched weighted Procrustes (rigid alignment by weighted SVD).

Re-derivation of reference utils/model_utils.py:343-455
(weighted_procrustes / WeightedProcrustes), with the closed-form 3x3 SVD
from sam6d_tpu.ops.svd3 instead of the CustomSVD/CustomDet host ops.
Fully batched: the coarse stage calls this with B*6000 three-point
hypotheses in one shot.

TPU layout: the 3x3 algebra (H build, det-sign fix, R = V E U^T, t) runs
struct-of-arrays — component scalars on (N,)-shaped arrays — because
trailing (3, 3) dims waste 97% of the VPU lanes (see ops/svd3.py).

Convention (matches the reference): given src and ref point sets, returns
(R, t) such that ref ~= src @ R^T + t, i.e. ref_i = R src_i + t for row
vectors, and the inverse map used downstream is (ref - t) @ R.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sam6d_tpu.ops.svd3 import svd3x3_soa


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
    src_points = src_points.astype(jnp.float32)
    ref_points = ref_points.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones(src_points.shape[:-1], src_points.dtype)
    weights = jnp.where(weights < weight_thresh, 0.0, weights)
    weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + eps)
    w = weights[..., None]  # (..., N, 1)

    src_centroid = jnp.sum(src_points * w, axis=-2)  # (..., 3)
    ref_centroid = jnp.sum(ref_points * w, axis=-2)
    src_c = src_points - src_centroid[..., None, :]
    ref_c = ref_points - ref_centroid[..., None, :]
    ref_cw = ref_c * w

    # H_ij = sum_n src_c[n, i] * w[n] * ref_c[n, j] — 9 reductions.
    h = [
        [jnp.sum(src_c[..., i] * ref_cw[..., j], axis=-1) for j in range(3)]
        for i in range(3)
    ]
    (u1, u2, u3), _, (v1, v2, v3) = svd3x3_soa(h)

    # det(V U^T) = det(V) * det(U); compute componentwise from columns.
    def det_cols(c1, c2, c3):
        return (
            c1[0] * (c2[1] * c3[2] - c2[2] * c3[1])
            - c2[0] * (c1[1] * c3[2] - c1[2] * c3[1])
            + c3[0] * (c1[1] * c2[2] - c1[2] * c2[1])
        )

    d = jnp.sign(det_cols(v1, v2, v3) * det_cols(u1, u2, u3))
    d = jnp.where(d == 0, 1.0, d)
    v3 = tuple(x * d for x in v3)

    # R = V U^T -> R[i][j] = v1_i u1_j + v2_i u2_j + v3_i u3_j.
    R_rows = []
    for i in range(3):
        R_rows.append(
            [
                v1[i] * u1[j] + v2[i] * u2[j] + v3[i] * u3[j]
                for j in range(3)
            ]
        )
    R = jnp.stack(
        [jnp.stack(row, axis=-1) for row in R_rows], axis=-2
    )

    # t = ref_centroid - R @ src_centroid, componentwise.
    sc = [src_centroid[..., i] for i in range(3)]
    t = jnp.stack(
        [
            ref_centroid[..., i]
            - (R_rows[i][0] * sc[0] + R_rows[i][1] * sc[1] + R_rows[i][2] * sc[2])
            for i in range(3)
        ],
        axis=-1,
    )
    return R, t
