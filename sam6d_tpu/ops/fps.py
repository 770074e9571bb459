"""Furthest point sampling (FPS) for TPU.

Replaces the reference's sequential CUDA/OpenCL kernels
(_ext_src/src/sampling_gpu.cu:75-229, ov_pointnet2_op/furthest_point_sampling.cl).

FPS is inherently sequential (each selection depends on the running
min-distance field), so the TPU formulation keeps the (B, N) distance field
as loop-carried state in a `lax.fori_loop`: each step is one fused
VPU pass (distance update + argmax reduction) over the point set.  A Pallas
variant that pins the distance field in VMEM lives in
sam6d_tpu/ops/pallas/fps_kernel.py and is used on TPU backends for large N.

Unlike the reference CUDA kernel we do not skip points with ||p||^2<=1e-3
(sampling_gpu.cu's `mag` check) — that is a legacy pointnet2 quirk, not a
semantic requirement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("npoint", "use_pallas"))
def furthest_point_sample(
    pts: jax.Array, npoint: int, use_pallas: bool | None = None
) -> jax.Array:
    """Iterative max-min selection of `npoint` of N points.

    Matches reference semantics (pointnet2_utils.py:52-87): the first
    selected index is 0; each subsequent selection is the point with
    maximal distance to the selected set.

    Args:
      pts: (B, N, 3) float point cloud.
      npoint: number of points to select (static).

    Returns:
      (B, npoint) int32 indices.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from sam6d_tpu.ops.pallas.fps_kernel import fps_pallas

        return fps_pallas(pts, npoint)
    return _fps_xla(pts, npoint)


def _fps_xla(pts: jax.Array, npoint: int) -> jax.Array:
    B, N, _ = pts.shape
    pts = pts.astype(jnp.float32)

    def step(carry, _):
        dists, last_idx = carry
        last_pt = jnp.take_along_axis(pts, last_idx[:, None, None], axis=1)
        delta = pts - last_pt
        d2 = jnp.sum(delta * delta, axis=-1)  # (B, N)
        dists = jnp.minimum(dists, d2)
        nxt = jnp.argmax(dists, axis=-1).astype(jnp.int32)
        return (dists, nxt), nxt

    init_idx = jnp.zeros((B,), jnp.int32)
    init_dists = jnp.full((B, N), jnp.inf, jnp.float32)
    (_, _), rest = jax.lax.scan(step, (init_dists, init_idx), None, length=npoint - 1)
    idx = jnp.concatenate([init_idx[None], rest], axis=0)  # (npoint, B)
    return idx.T


def sample_pts_feats(
    pts: jax.Array,
    feats: jax.Array,
    npoint: int,
    return_index: bool = False,
):
    """FPS-downsample a point cloud and its features together.

    Replaces reference `sample_pts_feats` (utils/model_utils.py:70-84).

    Args:
      pts: (B, N, 3); feats: (B, N, C).

    Returns:
      (pts', feats') each downsampled to npoint, plus indices if requested.
    """
    from sam6d_tpu.ops.pointcloud import gather_points

    idx = furthest_point_sample(pts, npoint)
    pts_s = gather_points(pts, idx)
    feats_s = gather_points(feats, idx)
    if return_index:
        return pts_s, feats_s, idx
    return pts_s, feats_s
