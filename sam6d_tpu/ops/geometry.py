"""Core batched point-cloud geometry (pure jnp, fuses under jit).

Semantics match reference Pose_Estimation_Model/utils/model_utils.py
(pairwise_distance :101-128, compute_feature_similarity :131-153) and
utils/data_utils.py (get_point_cloud_from_depth :92-110), re-derived for
XLA: everything is a batched matmul/broadcast so it lands on the MXU/VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_distance(
    x: jax.Array,
    y: jax.Array,
    normalized: bool = False,
    channel_first: bool = False,
) -> jax.Array:
    """Squared pairwise distances between two (batched) point sets.

    Args:
      x: (*, N, C) or (*, C, N) if channel_first.
      y: (*, M, C) or (*, C, M) if channel_first.
      normalized: points are unit-norm, so d^2 = 2 - 2 x.y.
      channel_first: channel dim is -2.

    Returns:
      (*, N, M) squared distances, clamped at 0.
    """
    # Coordinate geometry needs true f32 accumulation: on TPU the MXU
    # defaults to bf16 inputs, which is fine for neural features but not
    # for metric distances feeding pose scoring. HIGHEST forces f32.
    hi = jax.lax.Precision.HIGHEST
    if channel_first:
        xy = jnp.einsum("...cn,...cm->...nm", x, y, precision=hi)
        channel_axis = -2
    else:
        xy = jnp.einsum("...nc,...mc->...nm", x, y, precision=hi)
        channel_axis = -1
    if normalized:
        sq = 2.0 - 2.0 * xy
    else:
        x2 = jnp.sum(x * x, axis=channel_axis)
        y2 = jnp.sum(y * y, axis=channel_axis)
        if channel_first:
            sq = x2[..., :, None] - 2.0 * xy + y2[..., None, :]
        else:
            sq = x2[..., :, None] - 2.0 * xy + y2[..., None, :]
    return jnp.maximum(sq, 0.0)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """F.normalize(p=2) equivalent: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def compute_feature_similarity(
    feat1: jax.Array,
    feat2: jax.Array,
    sim_type: str = "cosine",
    temp: float = 1.0,
    normalize_feat: bool = True,
) -> jax.Array:
    """Similarity matrix between feature sets.

    Args:
      feat1: (B, N, C), feat2: (B, M, C).

    Returns:
      (B, N, M) attention/similarity matrix scaled by 1/temp.
    """
    if normalize_feat:
        feat1 = l2_normalize(feat1)
        feat2 = l2_normalize(feat2)
    if sim_type == "cosine":
        atten = jnp.einsum("bnc,bmc->bnm", feat1, feat2)
    elif sim_type == "L2":
        atten = jnp.sqrt(pairwise_distance(feat1, feat2))
    else:
        raise ValueError(f"unknown sim_type {sim_type}")
    # Attention matrices feed the pose solvers and the training CE loss;
    # always hand them over in f32 even when the network runs bf16.
    return atten.astype(jnp.float32) / temp


def transform_points(pts: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Apply rigid transform: p' = R p + t.

    Args:
      pts: (..., N, 3); R: (..., 3, 3); t: (..., 3).
    """
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def inverse_transform_points(pts: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Apply inverse rigid transform: p' = R^T (p - t).

    Matches the reference's `(pts - t) @ R` convention
    (model_utils.py:267, fine_point_matching.py:45) where R maps model
    frame -> camera frame and points are row vectors.
    """
    return jnp.einsum("...nj,...ji->...ni", pts - t[..., None, :], R)


def depth_to_pointcloud(
    depth: jax.Array, K: jax.Array
) -> jax.Array:
    """Back-project a depth map to an organized (H, W, 3) point cloud.

    Reference: utils/data_utils.py:92-110 (get_point_cloud_from_depth).

    Args:
      depth: (H, W) metric depth.
      K: (3, 3) camera intrinsics.
    """
    H, W = depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xmap = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ymap = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    z = depth.astype(jnp.float32)
    x = (xmap - cx) * z / fx
    y = (ymap - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def project_points(pts: jax.Array, K: jax.Array) -> jax.Array:
    """Project camera-frame 3D points to pixel coordinates.

    Args:
      pts: (..., N, 3); K: (3, 3).

    Returns:
      (..., N, 2) (u, v) pixel coordinates.
    """
    homo = jnp.einsum("ij,...nj->...ni", K, pts)
    return homo[..., :2] / jnp.maximum(homo[..., 2:3], 1e-9)


def masked_mean(x: jax.Array, mask: jax.Array, axis, eps: float = 1e-8):
    """Mean of `x` over `axis` counting only entries where mask != 0."""
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / (jnp.sum(m, axis=axis) + eps)
