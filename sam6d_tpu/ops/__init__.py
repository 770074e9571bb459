"""TPU-native op suite replacing the reference's CUDA/OpenCL/C++ custom ops.

Mapping from reference native components (SURVEY.md §2.4):
  furthest_point_sampling  -> sam6d_tpu.ops.fps (lax.fori_loop + Pallas kernel)
  gather_points            -> sam6d_tpu.ops.pointcloud.gather_points (XLA gather)
  ball_query               -> sam6d_tpu.ops.pointcloud.ball_query (top-k by order)
  cylinder_query           -> sam6d_tpu.ops.pointcloud.cylinder_query
  grouping_operation       -> sam6d_tpu.ops.pointcloud.group_points (XLA gather)
  three_nn/interpolate     -> sam6d_tpu.ops.pointcloud.three_nn / three_interpolate
  CustomSVD / SVDu / SVDv  -> sam6d_tpu.ops.svd3.svd3x3 (closed-form batched)
  CustomDet                -> sam6d_tpu.ops.svd3.det3x3
  CustomSearchSorted       -> jnp.searchsorted via ops.sampling.weighted_sample
  CustomDebugNode          -> sam6d_tpu.ops.debug.debug_tap (jax.debug.callback)
"""

from sam6d_tpu.ops.geometry import (  # noqa: F401
    pairwise_distance,
    compute_feature_similarity,
    transform_points,
    inverse_transform_points,
)
from sam6d_tpu.ops.pointcloud import (  # noqa: F401
    gather_points,
    group_points,
    ball_query,
    cylinder_query,
    query_and_group,
    three_nn,
    three_interpolate,
)
from sam6d_tpu.ops.fps import furthest_point_sample, sample_pts_feats  # noqa: F401
from sam6d_tpu.ops.svd3 import svd3x3, det3x3, eigh3x3  # noqa: F401
from sam6d_tpu.ops.procrustes import weighted_procrustes  # noqa: F401
from sam6d_tpu.ops.sampling import weighted_sample  # noqa: F401
