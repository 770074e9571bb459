"""Point-cloud grouping primitives as XLA-native compositions.

These replace the reference's CUDA/OpenCL/C++ custom ops
(Pose_Estimation_Model/model/pointnet2/_ext_src/, model/ov_pointnet2_op/):
gather_points, ball_query, group_points, three_nn, three_interpolate.

Layout note (TPU-first): features are channel-LAST (B, N, C) throughout —
gathers then move contiguous C-lanes and the downstream MLPs are plain
Dense matmuls on the MXU.  The reference uses channel-first (B, C, N)
because its CUDA kernels want coalesced loads per channel; that layout
choice does not transfer to TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sam6d_tpu.ops.geometry import pairwise_distance


def batched_row_gather(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-batch row gather via ONE flat global-index gather.

    jnp.take_along_axis with a leading batch dim lowers to a batched
    XLA gather that measures ~5x slower per row than the unbatched form
    (8.2 vs 1.5 ns/row at (8, 2048, 32) x 131k rows/batch on v5e), so
    batch offsets are folded into the indices instead.

    Args:
      feats: (B, N, C); idx: (B, ...) int32 indices into N.

    Returns:
      (B, ..., C).
    """
    B, N, C = feats.shape
    if B == 1:
        flat = jnp.take(feats[0], idx.reshape(-1), axis=0)
        return flat.reshape(*idx.shape, C)
    offs = (jnp.arange(B, dtype=idx.dtype) * N).reshape(
        (B,) + (1,) * (idx.ndim - 1)
    )
    flat = jnp.take(
        feats.reshape(B * N, C), (idx + offs).reshape(-1), axis=0
    )
    return flat.reshape(*idx.shape, C)


def gather_neighbors(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """batched_row_gather with a matmul-formulated backward.

    The forward is the same flat row gather (row-count bound, ~2 ns/row).
    The default XLA backward — a scatter-add where every target row is
    hit ~nsample times — costs 16 ns/row on v5e (33 ms at the fine-stage
    PositionalEncoding shapes, 93 ms/train-step total across its two
    scales x two sides).  Here the backward instead builds one-hot
    scatter tiles on-chip and accumulates on the MXU
    (ops/pallas/scatter_rows.py), which is worth it exactly when the
    target block (N, C) is small enough to live in VMEM: use this for
    neighbor-grouped gathers (C <= ~64, N <= ~4096); keep plain
    batched_row_gather for wide-row gathers (the one-hot FLOPs
    B*N*Q*C stop paying for themselves around C ~ 128).

    Args:
      feats: (B, N, C); idx: (B, ...) int32 indices into N.

    Returns:
      (B, ..., C).
    """
    return _gather_neighbors_impl(feats, idx, feats.shape[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_neighbors_impl(feats, idx, n):
    return batched_row_gather(feats, idx)


def _gather_neighbors_fwd(feats, idx, n):
    return batched_row_gather(feats, idx), idx


def _gather_neighbors_bwd(n, idx, dy):
    import numpy as np

    from sam6d_tpu.ops.pallas.scatter_rows import (
        scatter_rows_pallas,
        scatter_rows_xla,
    )

    B = idx.shape[0]
    C = dy.shape[-1]
    idx2 = idx.reshape(B, -1)
    dy2 = dy.reshape(B, -1, C)
    if jax.default_backend() == "tpu" and n % 8 == 0:
        df = scatter_rows_pallas(idx2, dy2, n)
    else:
        df = scatter_rows_xla(idx2, dy2, n)
    return df.astype(dy.dtype), np.zeros(idx.shape, jax.dtypes.float0)


_gather_neighbors_impl.defvjp(_gather_neighbors_fwd, _gather_neighbors_bwd)


def gather_points(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of a per-point feature array.

    Replaces reference `gather_operation` (pointnet2_utils.py:90-128,
    _ext_src/src/sampling_gpu.cu:13-61) in channel-last layout.

    Args:
      feats: (B, N, C) per-point features (C may be 3 for xyz).
      idx: (B, M) int32 indices into N.

    Returns:
      (B, M, C).
    """
    return batched_row_gather(feats, idx)


def group_points(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighborhoods of per-point features.

    Replaces reference `grouping_operation` (pointnet2_utils.py:228-280,
    _ext_src/src/group_points_gpu.cu) in channel-last layout.

    Args:
      feats: (B, N, C).
      idx: (B, M, S) int32 neighbor indices into N.

    Returns:
      (B, M, S, C).
    """
    return batched_row_gather(feats, idx)


def ball_query_from_d2(
    d2: jax.Array, radius: float, nsample: int
) -> jax.Array:
    """Ball query given a precomputed squared-distance matrix.

    Lets callers that query the same point set at multiple radii (the
    fine-stage PE uses r=0.1/ns=32 and r=0.2/ns=64 on identical inputs,
    fine_point_matching.py:102-144) share one pairwise-distance pass.
    """
    N = d2.shape[-1]
    mask = d2 < radius * radius
    idx = _first_k_true(mask, nsample)
    valid = idx < N
    first = jnp.where(valid[..., :1], idx[..., :1], 0)
    return jnp.where(valid, idx, first).astype(jnp.int32)


def _first_k_true(mask: jax.Array, k: int, group: int = 256) -> jax.Array:
    """Indices of the first k True entries per row (N where fewer).

    The sort key IS the payload (the scan-order index itself), so this
    is a single-operand ascending sort — top_k would drag a dead index
    payload through every compare-exchange pass (measured as 2-operand
    s32 sorts in the trace).  Narrow int dtypes pack 2-4 values per
    32-bit lane on TPU, so the key is i16 whenever N fits.  Wide rows
    sort hierarchically (G groups of `group`, then the G*k candidates),
    which is exact for smallest-k and measured 2.5x faster at
    (4, 2048, 2048) -> 64 on v5e.
    """
    N = mask.shape[-1]
    dt = jnp.int16 if N < 2**15 - 1 else jnp.int32
    scan_order = jax.lax.broadcasted_iota(dt, mask.shape, mask.ndim - 1)
    key = jnp.where(mask, scan_order, jnp.asarray(N, dt))

    def smallest(x, kk):
        return jax.lax.sort(x, dimension=-1, is_stable=False)[..., :kk]

    G = N // group
    if G <= 1 or N % group or G * k >= N:
        return smallest(key, k).astype(jnp.int32)
    grouped = key.reshape(key.shape[:-1] + (G, group))
    cand = smallest(grouped, min(k, group))
    cand = cand.reshape(key.shape[:-1] + (-1,))
    return smallest(cand, k).astype(jnp.int32)


def ball_query(
    new_xyz: jax.Array,
    xyz: jax.Array,
    radius: float,
    nsample: int,
) -> jax.Array:
    """Fixed-size radius neighborhoods with first-hit backfill.

    Matches the reference CUDA/C++ semantics
    (_ext_src/src/ball_query_gpu.cu, ov_pointnet2_op/ball_query.cpp:46-131):
    for each query point take the first `nsample` points (in scan order)
    with squared distance < radius^2; rows with fewer hits repeat the first
    hit; rows with zero hits return index 0.

    TPU formulation: instead of a sequential scan, build a sort key that is
    the point index for in-radius points and a big sentinel otherwise, then
    top-k the negated keys — the k smallest keys are exactly the first k
    in-scan-order hits.

    Args:
      new_xyz: (B, M, 3) query centers.
      xyz: (B, N, 3) source points.
      radius: ball radius.
      nsample: neighbors per query (static).

    Returns:
      (B, M, nsample) int32 indices into N.
    """
    d2 = pairwise_distance(new_xyz, xyz)  # (B, M, N)
    return ball_query_from_d2(d2, radius, nsample)


def query_and_group(
    xyz: jax.Array,
    new_xyz: jax.Array,
    feats: jax.Array | None,
    radius: float,
    nsample: int,
    use_xyz: bool = True,
) -> jax.Array:
    """Ball query + gather + center-subtract (+ optional feature concat).

    Replaces reference `QueryAndGroup` (pointnet2_utils.py:303-403) in
    channel-last layout.

    Args:
      xyz: (B, N, 3) source points.
      new_xyz: (B, M, 3) query centers.
      feats: optional (B, N, C) per-point features.
      radius, nsample: ball-query parameters.
      use_xyz: prepend centered xyz offsets to the grouped features.

    Returns:
      (B, M, nsample, 3 + C) if use_xyz and feats is not None,
      else (B, M, nsample, C) or (B, M, nsample, 3).
    """
    idx = ball_query(new_xyz, xyz, radius, nsample)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if feats is not None:
        grouped_feats = group_points(feats, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        return grouped_feats
    if not use_xyz:
        raise ValueError("cannot have neither features nor xyz")
    return grouped_xyz


def cylinder_query(
    new_xyz: jax.Array,
    xyz: jax.Array,
    rot: jax.Array,
    radius: float,
    hmin: float,
    hmax: float,
    nsample: int,
) -> jax.Array:
    """Fixed-size cylinder neighborhoods with first-hit backfill.

    Replaces the reference's cylinder_query custom op
    (ov_pointnet2_op/cylinder_query.cpp:74-158, unbuilt in the main OV
    lib and unused on the PEM hot path; kept for pointnet2 API parity):
    each query center carries a rotation matrix from cylinder frame to
    world; a point is a hit when, expressed in the cylinder frame
    (offset rotated by R^T), its radial distance y^2+z^2 < radius^2 and
    its height hmin < x < hmax.  The first `nsample` hits in scan order
    are kept, backfilled with the first hit (the reference leaves
    zero-hit rows uninitialized, cylinder_query.cpp:144-148 commented
    out; we return index 0 like ball_query).

    Component-wise math throughout: no (B, M, N, 3) tensor with a
    trailing size-3 dim is materialized (TPU layout poison — see
    ops/svd3.py for the measured effect).

    Args:
      new_xyz: (B, M, 3) query centers (world frame).
      xyz: (B, N, 3) source points.
      rot: (B, M, 9) row-major cylinder-to-world rotation matrices.
      radius: cylinder radius (around the local x axis).
      hmin, hmax: height bounds along the local x axis.
      nsample: neighbors per query (static).

    Returns:
      (B, M, nsample) int32 indices into N.
    """
    dx = xyz[:, None, :, 0] - new_xyz[:, :, None, 0]  # (B, M, N)
    dy = xyz[:, None, :, 1] - new_xyz[:, :, None, 1]
    dz = xyz[:, None, :, 2] - new_xyz[:, :, None, 2]
    r = rot.reshape(rot.shape[:-1] + (3, 3))
    # Local coords: l_i = sum_j R[j, i] * d_j  (R^T, world -> cylinder).
    def col(i):
        return (
            r[..., 0, i][..., None] * dx
            + r[..., 1, i][..., None] * dy
            + r[..., 2, i][..., None] * dz
        )

    lx, ly, lz = col(0), col(1), col(2)
    mask = (
        (ly * ly + lz * lz < radius * radius) & (lx > hmin) & (lx < hmax)
    )
    N = xyz.shape[1]
    idx = _first_k_true(mask, nsample)
    valid = idx < N
    first = jnp.where(valid[..., :1], idx[..., :1], 0)
    return jnp.where(valid, idx, first).astype(jnp.int32)


def three_nn(unknown: jax.Array, known: jax.Array):
    """3 nearest neighbors of each `unknown` point among `known` points.

    Replaces reference `three_nn` (_ext_src/src/interpolate_gpu.cu).

    Args:
      unknown: (B, N, 3); known: (B, M, 3).

    Returns:
      (dist, idx): (B, N, 3) distances (not squared) and int32 indices.
    """
    d2 = pairwise_distance(unknown, known)
    neg_d2, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg_d2, 0.0)), idx.astype(jnp.int32)


def three_interpolate(feats: jax.Array, idx: jax.Array, weight: jax.Array):
    """Weighted interpolation of features from 3 neighbors.

    Replaces reference `three_interpolate` (_ext_src/src/interpolate_gpu.cu).

    Args:
      feats: (B, M, C) features of known points.
      idx: (B, N, 3) neighbor indices.
      weight: (B, N, 3) interpolation weights.

    Returns:
      (B, N, C).
    """
    gathered = group_points(feats, idx)  # (B, N, 3, C)
    return jnp.einsum("bnkc,bnk->bnc", gathered, weight)


def interpolation_weights(dist: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse-distance weights for three_interpolate (pointnet2 FP module)."""
    recip = 1.0 / jnp.maximum(dist, eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
