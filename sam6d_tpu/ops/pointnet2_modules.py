"""PointNet++ set-abstraction / feature-propagation modules (flax).

Re-derivation of reference Pose_Estimation_Model/model/pointnet2/
pointnet2_modules.py (:1-237): SA = FPS centers -> multi-radius
QueryAndGroup -> SharedMLP -> max-pool; FP = three_nn inverse-distance
interpolation -> SharedMLP.  The PEM hot path uses QueryAndGroup/FPS
directly, but these modules complete the pointnet2 surface for
downstream users (channel-last layout).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sam6d_tpu.models.pem.matching import SharedMLP
from sam6d_tpu.ops.fps import furthest_point_sample
from sam6d_tpu.ops.pointcloud import (
    gather_points,
    interpolation_weights,
    query_and_group,
    three_interpolate,
    three_nn,
)


class PointnetSAModule(nn.Module):
    """Single-scale set abstraction.

    Attrs:
      npoint: number of FPS centers (None = group all).
      radius: ball radius; nsample: neighbors per ball.
      mlp: SharedMLP channel list (first entry is input C [+3 for xyz]).
    """

    mlp: Sequence[int]
    npoint: int | None = None
    radius: float = 0.2
    nsample: int = 64
    use_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats=None, train: bool = False):
        """xyz: (B, N, 3); feats: (B, N, C) -> (new_xyz, new_feats)."""
        if self.npoint is not None:
            idx = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, idx)
            grouped = query_and_group(
                xyz, new_xyz, feats, self.radius, self.nsample,
                use_xyz=self.use_xyz,
            )  # (B, npoint, nsample, C')
        else:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            grouped = (
                jnp.concatenate([xyz, feats], axis=-1)
                if feats is not None and self.use_xyz
                else (feats if feats is not None else xyz)
            )[:, None, :, :]
        out = SharedMLP(list(self.mlp), dtype=self.dtype, name="mlp")(
            grouped, train
        )
        return new_xyz, jnp.max(out, axis=2)


class PointnetFPModule(nn.Module):
    """Feature propagation from sparse (known) to dense (unknown)."""

    mlp: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 train: bool = False):
        """unknown (B, N, 3), known (B, M, 3), feats channel-last."""
        dist, idx = three_nn(unknown, known)
        w = interpolation_weights(dist)
        interp = three_interpolate(known_feats, idx, w)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        out = SharedMLP(list(self.mlp), dtype=self.dtype, name="mlp")(
            interp[:, :, None, :], train
        )
        return out[:, :, 0, :]
