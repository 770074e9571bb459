"""Unified configuration for the TPU SAM-6D framework.

One dataclass tree replaces the reference's three config systems (Hydra for
ISM, gorilla.Config for PEM training, ad-hoc yaml+argparse for the OV
runners — see reference SAM-6D/Pose_Estimation_Model/config/base.yaml and
Instance_Segmentation_Model/configs/).  Parameter names and default values
match the reference (base.yaml:16-105, configs/model/ISM_sam.yaml) so
configs are portable between the two codebases.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass(frozen=True)
class ViTConfig:
    """MAE-style ViT backbone for PEM feature extraction.

    Reference: Pose_Estimation_Model/model/feature_extraction.py:50-57 and
    config/base.yaml:19-25.
    """

    vit_type: str = "vit_base"
    up_type: str = "linear"
    embed_dim: int = 768
    out_dim: int = 256
    use_pyramid_feat: bool = True
    patch_size: int = 16
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    img_size: int = 224
    dtype: Any = None  # compute dtype; None -> float32
    # Remat ViT blocks in training (memory for FLOPs; 600k-iter runs at
    # ViT-base scale need it on small per-chip batches).
    remat: bool = False

    # Canonical (embed_dim, depth, num_heads) per vit_type label; the
    # architecture comes from the explicit fields, the label is only
    # checked against them so a vit_large checkpoint is never silently
    # loaded into a depth-12 model (see train/checkpoint.py guard).
    _PRESETS = {
        "vit_small": (384, 12, 6),
        "vit_base": (768, 12, 12),
        "vit_large": (1024, 24, 16),
    }

    def __post_init__(self):
        preset = self._PRESETS.get(self.vit_type)
        dims = (self.embed_dim, self.depth, self.num_heads)
        # Warn only when dims form a DIFFERENT real architecture than
        # the label claims (toy/test configs with tiny dims match no
        # preset and stay silent).
        if preset and preset != dims and dims in self._PRESETS.values():
            import warnings

            warnings.warn(
                f"ViTConfig vit_type={self.vit_type!r} implies "
                f"(embed_dim, depth, num_heads)={preset} but config has "
                f"({self.embed_dim}, {self.depth}, {self.num_heads}); "
                f"the explicit fields win — checkpoints for "
                f"{self.vit_type} will not load into this architecture.",
                stacklevel=3,
            )


@dataclass(frozen=True)
class GeoEmbeddingConfig:
    """Geometric structure embedding (GeoTransformer-style).

    Reference: Pose_Estimation_Model/model/transformer.py:288-363 and
    config/base.yaml:26-31.
    """

    sigma_d: float = 0.2
    sigma_a: float = 15.0
    angle_k: int = 3
    reduction_a: str = "max"
    hidden_dim: int = 256
    # Chebyshev-matmul angle embedding (0 = exact transcendentals).  The
    # angle index is bounded in [0, 180/sigma_a], so sin/cos of the
    # (B, N, N, k, d/2) tensor — ~15M transcendentals per 197-pt frame —
    # become a degree-(P-1) Chebyshev basis (P cheap VPU recurrence
    # steps) times a static (P, d) coefficient matrix with proj_a folded
    # in — one MXU matmul, no transcendentals, no gathers (a lookup
    # table was tried and is row-count-bound: ~3 ns/row x 116k rows).
    # Max abs error vs exact at P=28: < 2e-5.
    angle_cheb_terms: int = 28
    # Fused Pallas fwd/bwd for the Chebyshev + max-over-k embedding
    # (ops/pallas/geo_embed.py): "auto" = on TPU only (CPU tests run
    # the XLA formulation), "on"/"off" force it.  For multi-chip pjit
    # training set "off" (the custom_vjp pallas_call carries no
    # sharding rule; XLA would replicate) — single-chip training and
    # the CPU dryrun are unaffected.
    fused: str = "auto"
    # Same trick for the distance branch: every real pair of
    # radius-normalized points has dist <= dist_cheb_hi * sigma_d = 4
    # (generous: the union ball has diameter ~2-3); the far bg sentinel
    # row/col is overwritten with exact values.  0 = exact everywhere.
    dist_cheb_terms: int = 40
    dist_cheb_hi: float = 20.0


@dataclass(frozen=True)
class CoarseMatchingConfig:
    """Coarse point matching head. Reference: config/base.yaml:32-42."""

    nblock: int = 3
    input_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 256
    temp: float = 0.1
    sim_type: str = "cosine"
    normalize_feat: bool = True
    loss_dis_thres: float = 0.15
    nproposal1: int = 6000
    nproposal2: int = 300
    num_heads: int = 4


@dataclass(frozen=True)
class FineMatchingConfig:
    """Fine point matching head. Reference: config/base.yaml:43-54."""

    nblock: int = 3
    input_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 256
    pe_radius1: float = 0.1
    pe_radius2: float = 0.2
    pe_nsample1: int = 32
    pe_nsample2: int = 64
    focusing_factor: float = 3.0
    temp: float = 0.1
    sim_type: str = "cosine"
    normalize_feat: bool = True
    loss_dis_thres: float = 0.15
    dis_thres: float = 0.15
    num_heads: int = 4


@dataclass(frozen=True)
class PEMConfig:
    """Pose Estimation Model. Reference: config/base.yaml:16-54."""

    coarse_npoint: int = 196
    fine_npoint: int = 2048
    feature_extraction: ViTConfig = field(default_factory=ViTConfig)
    geo_embedding: GeoEmbeddingConfig = field(default_factory=GeoEmbeddingConfig)
    coarse_point_matching: CoarseMatchingConfig = field(
        default_factory=CoarseMatchingConfig
    )
    fine_point_matching: FineMatchingConfig = field(default_factory=FineMatchingConfig)
    n_template_view: int = 42
    n_sample_template_point: int = 5000
    n_sample_model_point: int = 1024
    n_sample_observed_point: int = 2048


@dataclass(frozen=True)
class SegmentorConfig:
    """SAM automatic-mask-generation settings.

    Reference: Instance_Segmentation_Model/configs/model/segmentor_model/sam.yaml
    (stability_score_thresh 0.85, iou_threshold 0.88, points_per_batch 64).
    """

    model_type: str = "vit_h"
    points_per_side: int = 32
    points_per_batch: int = 64
    stability_score_thresh: float = 0.85
    pred_iou_thresh: float = 0.88
    stability_score_offset: float = 1.0
    box_nms_thresh: float = 0.7
    mask_threshold: float = 0.0
    segmentor_width_size: int = 640
    # Post-filter: drop disconnected regions / fill holes smaller than
    # this many pixels (reference sam.yaml min_mask_region_area, 0 = off).
    min_mask_region_area: int = 0
    # Fused Pallas decode tail (ops/pallas/decode_tail.py): None = auto
    # (on TPU); True/False force.  The plain-XLA path stays for parity.
    fused_tail: bool | None = None


@dataclass(frozen=True)
class FastSAMConfig:
    """FastSAM (YOLOv8-seg) proposal-generation settings.

    Reference: Instance_Segmentation_Model/configs/model/segmentor_model/
    fast_sam.yaml + model/fast_sam.py CustomYOLO overrides (iou 0.9,
    conf 0.05, max_det 200, imgsz 640); FastSAM-x is the released
    checkpoint (YOLOv8x scale).
    """

    scale: str = "x"
    img_size: int = 640
    iou_threshold: float = 0.9
    conf_threshold: float = 0.05
    max_det: int = 200


@dataclass(frozen=True)
class DescriptorConfig:
    """DINOv2 descriptor settings.

    Reference: Instance_Segmentation_Model/configs/model/descriptor_model/dinov2.yaml
    (vitl14, 224x224 crops, chunk 42) and model/dinov2.py.
    """

    model_type: str = "vitl14"
    image_size: int = 224
    patch_size: int = 14
    chunk_size: int = 42
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    validpatch_thresh: float = 0.5


@dataclass(frozen=True)
class ISMConfig:
    """Instance Segmentation Model.

    Reference: Instance_Segmentation_Model/configs/model/ISM_sam.yaml
    (nms_thresh 0.25, confidence_thresh 0.2, aggregation avg_5, chunk 16).
    """

    segmentor: SegmentorConfig = field(default_factory=SegmentorConfig)
    fastsam: FastSAMConfig = field(default_factory=FastSAMConfig)
    descriptor: DescriptorConfig = field(default_factory=DescriptorConfig)
    # Network compute dtype (params stay f32; scoring/geometry stay f32).
    # bf16 halves HBM traffic on the SAM/DINOv2 forwards (matmul-bound).
    compute_dtype: str = "bfloat16"
    max_proposals: int = 256  # static padding size for proposal batches
    matching_chunk_size: int = 16
    aggregation_function: str = "avg_5"
    confidence_thresh: float = 0.2
    nms_thresh: float = 0.25
    min_box_size: float = 0.05
    min_mask_size: float = 3e-4
    visible_thred: float = 0.5
    pointcloud_sample_num: int = 2048


@dataclass(frozen=True)
class OptimConfig:
    """Training optimizer/schedule. Reference: config/base.yaml:3-14."""

    lr: float = 1e-4
    betas: Sequence[float] = (0.5, 0.999)
    eps: float = 1e-6
    weight_decay: float = 0.0
    max_iters: int = 600_000
    warmup_factor: float = 0.001
    warmup_iters: int = 1000
    # TPU mixed-precision additions (no reference counterpart — the
    # reference trains f32 on CUDA): global-norm gradient clipping and
    # skip-update-on-nonfinite-grads.  Measured necessary at flagship
    # scale in bf16: an unguarded run NaN'd at ~step 1400 after healthy
    # early learning (BASELINE.md round-3 training notes).  grad_clip=0
    # disables.
    grad_clip: float = 1.0
    skip_nonfinite: bool = True
    # Drop updates from gradient-SPIKE batches (finite but 10x+ above
    # the healthy range): the round-4 forensics showed collapse begins
    # with a 6.7e3-norm batch whose clip-preserved direction, repeated
    # ~50 steps, lands the net in an unrecoverable all-background basin
    # (BASELINE.md round-4 training notes).  0 disables.
    spike_skip_norm: float = 150.0
    # Gradient accumulation: apply the optimizer every accum_steps
    # microbatches (optax.MultiSteps).  The reference's effective batch
    # 28-32 (config/base.yaml:3, README.md:27) exceeds one v5e's HBM at
    # the flagship config (BENCH_TRAIN.json bs-32 OOM); bs 16 x 2
    # reproduces it.  1 disables.
    accum_steps: int = 1


@dataclass(frozen=True)
class TrainConfig:
    """Training loop settings. Reference: config/base.yaml:58-104."""

    batch_size: int = 28
    training_epoch: int = 15
    iters_to_print: int = 50
    rd_seed: int = 1
    img_size: int = 224
    n_sample_observed_point: int = 2048
    n_sample_model_point: int = 2048
    n_sample_template_point: int = 5000
    optim: OptimConfig = field(default_factory=OptimConfig)


def default_pem_config() -> PEMConfig:
    return PEMConfig()


def default_ism_config() -> ISMConfig:
    return ISMConfig()


def replace(cfg, **kwargs):
    """Functional config update (dataclasses.replace passthrough)."""
    return dataclasses.replace(cfg, **kwargs)
