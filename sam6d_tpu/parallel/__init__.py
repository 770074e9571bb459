"""Mesh-based scaling: data/tensor-parallel training, instance/hypothesis
parallel inference.

The reference's parallelism surface (SURVEY.md §2.5) is PyTorch-Lightning
DDP + single-process DataParallel + a host-orchestrated CPU/GPU/XPU
submodel pipeline.  Here everything is one `jax.sharding.Mesh`:

  * `dp` axis: frames / proposal crops / training batch (the DDP analog);
    gradient all-reduce rides ICI via pjit.
  * `tp` axis: ViT MLP hidden + attention heads (tensor parallel), and at
    inference the pose-hypothesis blocks (the reference's 6000-hypothesis
    scoring loop, its CPU-pinned bottleneck).
"""

from sam6d_tpu.parallel.mesh import make_mesh  # noqa: F401
from sam6d_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_partition_spec,
    shard_train_state,
)
