"""sam6d_tpu — TPU-native zero-shot 6D object pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the SAM-6D pipeline
(reference: 18582088138/OpenVINO-SAM-6D): an Instance Segmentation Model
(ISM) proposes and scores object masks against rendered CAD templates, and
a Pose Estimation Model (PEM) solves the 6D pose by two-stage
(coarse sparse -> fine dense) background-token point matching with weighted
Procrustes over sampled hypotheses.

Design stance (not a port):
  * All compute is pure-JAX under `jit`; the reference's 5-submodel /
    3-device OpenVINO partition (reference ov_demo.sh, run_inference_custom_openvino_gpu.py)
    collapses into single jitted programs for ISM and PEM.
  * Point-cloud primitives (FPS, ball query, gather/group) are XLA-native
    compositions with Pallas kernels on the hot paths, replacing the
    reference's CUDA/OpenCL/C++ custom ops.
  * Batched 3x3 SVD / weighted Procrustes is a closed-form vectorized
    implementation (no host fallback, unlike reference sub2/sub4 CPU pinning).
  * Scaling is mesh-based (jax.sharding + shard_map): frames/crops on a
    `data` axis, pose hypotheses on a `hyp` axis, with psum/argmax
    collectives for score reduction.
"""

__version__ = "0.1.0"

from sam6d_tpu.config import PEMConfig, ISMConfig, default_pem_config  # noqa: F401
