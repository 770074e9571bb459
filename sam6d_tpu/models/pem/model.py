"""PEM: end-to-end pose estimation network as ONE jittable program.

Re-derivation of reference Pose_Estimation_Model/model/pose_estimation_model.py
(:12-58).  The reference's OpenVINO deployment split this graph into five
submodels across GPU/CPU/XPU with host numpy handoffs at every boundary
(run_inference_custom_openvino_gpu.py:432-583); on TPU the whole thing —
ViT features, FPS, geometric embeddings, coarse+fine transformers, SVD
pose solves — is a single XLA computation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from sam6d_tpu.config import PEMConfig
from sam6d_tpu.models.pem.feature_extraction import ViTEncoder
from sam6d_tpu.models.pem.geo_embedding import GeometricStructureEmbedding
from sam6d_tpu.models.pem.matching import CoarsePointMatching, FinePointMatching
from sam6d_tpu.ops.fps import sample_pts_feats


class PEM(nn.Module):
    """Two-stage background-token point-matching pose estimator."""

    cfg: PEMConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.feature_extraction = ViTEncoder(
            self.cfg.feature_extraction, self.cfg.fine_npoint, dtype=self.dtype
        )
        self.geo_embedding = GeometricStructureEmbedding(
            self.cfg.geo_embedding, dtype=self.dtype
        )
        self.coarse_point_matching = CoarsePointMatching(
            self.cfg.coarse_point_matching, dtype=self.dtype
        )
        self.fine_point_matching = FinePointMatching(
            self.cfg.fine_point_matching, dtype=self.dtype
        )

    def make_template_bank(self, dense_po, dense_fo, model_pts=None):
        """Precompute every template-static quantity once per object.

        The reference recomputes the template-side FPS, geometric
        embedding, and fine-stage positional encoding on EVERY frame
        (they live inside its per-frame sub1/sub3 submodels); all of it
        depends only on the onboarded template cloud, so the serving path
        computes it here once and threads it through `__call__` via
        `template_bank`.

        Args:
          dense_po: (1, N, 3) FPS'd template cloud (metric).
          dense_fo: (1, N, C) template features.
          model_pts: optional (1, M, 3) CAD model samples (metric) used
            to build the coarse-rescore min-distance field; defaults to
            the template cloud.

        Returns:
          dict bank (leading dim 1; tiled to the batch at use).
        """
        from sam6d_tpu.ops.distance_field import build_min_dist_field

        radius = jnp.max(jnp.linalg.norm(dense_po, axis=2), axis=1)
        denom = radius[:, None, None] + 1e-6
        dense_po_n = dense_po / denom
        bg_point = jnp.full((1, 1, 3), 100.0, dense_po.dtype)
        sparse_po, sparse_fo, fps_idx_o = sample_pts_feats(
            dense_po_n, dense_fo, self.cfg.coarse_npoint, return_index=True
        )
        geo_o = self.geo_embedding(
            jnp.concatenate([bg_point, sparse_po], axis=1)
        )
        pe_o = self.fine_point_matching.compute_pe(dense_po_n)
        fine_f2 = self.fine_point_matching.compute_f2_init(
            dense_fo.astype(self.dtype), pe_o
        )
        norm_model = (
            model_pts / denom if model_pts is not None else dense_po_n
        )
        dist_field = build_min_dist_field(norm_model.astype(jnp.float32))
        return {
            "radius": radius,
            "dense_po_n": dense_po_n,
            "dense_fo": dense_fo,
            "sparse_po": sparse_po,
            "sparse_fo": sparse_fo,
            "fps_idx_o": fps_idx_o,
            "geo_o": geo_o,
            "pe_o": pe_o,
            "fine_f2": fine_f2,
            "dist_field": dist_field,
        }

    def forward_with_bank(self, pts, rgb, rgb_choose, model_pts,
                          template_bank, key, coarse_solver=None):
        """Serving forward: all template-side quantities from the bank.

        coarse_solver: optional override for the coarse hypothesis solve
        (signature (key, atten, p1, p2, norm_model, dist_field) ->
        (R, t)) — the hypothesis-parallel shard_map path plugs in here
        (parallel/hyp_parallel.sharded_compute_coarse_Rt)."""
        k_coarse, k_fine = jax.random.split(key)
        B = pts.shape[0]

        def tile(x):
            return jnp.broadcast_to(x, (B,) + x.shape[1:])

        radius = jnp.broadcast_to(template_bank["radius"], (B,))
        dense_pm = pts / (radius[:, None, None] + 1e-6)
        dense_fm = self.feature_extraction.get_img_feats(rgb, rgb_choose)

        bg_point = jnp.full((B, 1, 3), 100.0, dense_pm.dtype)
        sparse_pm, sparse_fm, fps_idx_m = sample_pts_feats(
            dense_pm, dense_fm, self.cfg.coarse_npoint, return_index=True
        )
        geo_m = self.geo_embedding(
            jnp.concatenate([bg_point, sparse_pm], axis=1)
        )

        init_R, init_t, _ = self.coarse_point_matching(
            sparse_pm, sparse_fm, geo_m,
            tile(template_bank["sparse_po"]),
            tile(template_bank["sparse_fo"]),
            tile(template_bank["geo_o"]),
            radius, model_pts, k_coarse,
            # NOT tiled: sample_min_dist indexes a shared (1, ...) field
            # for every instance without materializing B copies.
            dist_field=template_bank.get("dist_field"),
            solver=coarse_solver,
        )
        pred_R, pred_t, pred_pose_score, _ = self.fine_point_matching(
            dense_pm, dense_fm, geo_m, fps_idx_m,
            tile(template_bank["dense_po_n"]),
            tile(template_bank["dense_fo"]),
            tile(template_bank["geo_o"]),
            tile(template_bank["fps_idx_o"]),
            radius, model_pts, init_R, init_t,
            f2_init=tile(template_bank["fine_f2"])
            if "fine_f2" in template_bank
            else None,
            pe_p2=tile(template_bank["pe_o"]),
        )
        return {
            "pred_R": pred_R,
            "pred_t": pred_t,
            "pred_pose_score": pred_pose_score,
            "init_R": init_R,
            "init_t": init_t,
            "radius": radius,
        }

    def __call__(self, pts, rgb, rgb_choose, model_pts, dense_po, dense_fo,
                 key, train: bool = False, gt_r=None, gt_t=None,
                 dist_field=None):
        """Forward pass.

        Args:
          pts: (B, N, 3) observed cloud (camera frame, metric).
          rgb: (B, H, W, 3) masked, normalized crop.
          rgb_choose: (B, N) flattened pixel index per observed point.
          model_pts: (B, M, 3) CAD model samples (metric).
          dense_po: (B, N, 3) FPS'd template cloud (model frame, metric).
          dense_fo: (B, N, C) template features.
          key: PRNG key (hypothesis sampling / train-time pose noise).
          train: enables BN updates, per-block attens, GT-noise init.
          gt_r, gt_t: (B, 3, 3)/(B, 3) ground truth (train only).

        Returns:
          dict with pred_R (B,3,3), pred_t (B,3), pred_pose_score (B,)
          plus radius and (train) per-block attention lists.
        """
        k_coarse, k_fine = jax.random.split(key)

        dense_pm, dense_fm, dense_po_n, dense_fo_n, radius = (
            self.feature_extraction(pts, rgb, rgb_choose, dense_po, dense_fo)
        )

        B = dense_pm.shape[0]
        bg_point = jnp.full((B, 1, 3), 100.0, dense_pm.dtype)

        # Both sides (observed + template) share the FPS and geometric
        # embedding computation — run them as one 2B batch instead of two
        # sequential dispatches (the reference computes them separately,
        # pose_estimation_model.py:31-41).
        both_pts = jnp.concatenate([dense_pm, dense_po_n], axis=0)
        both_feats = jnp.concatenate(
            [dense_fm, dense_fo_n.astype(dense_fm.dtype)], axis=0
        )
        sparse_both, sparse_feat_both, fps_idx_both = sample_pts_feats(
            both_pts, both_feats, self.cfg.coarse_npoint, return_index=True
        )
        geo_both = self.geo_embedding(
            jnp.concatenate(
                [jnp.concatenate([bg_point, bg_point], axis=0), sparse_both],
                axis=1,
            )
        )
        sparse_pm, sparse_po = sparse_both[:B], sparse_both[B:]
        sparse_fm, sparse_fo = sparse_feat_both[:B], sparse_feat_both[B:]
        fps_idx_m, fps_idx_o = fps_idx_both[:B], fps_idx_both[B:]
        geo_m, geo_o = geo_both[:B], geo_both[B:]

        # Normalize GT translation into radius-normalized space for train.
        gt_t_n = None
        if train and gt_t is not None:
            gt_t_n = gt_t / (radius[:, None] + 1e-6)

        init_R, init_t, coarse_attens = self.coarse_point_matching(
            sparse_pm, sparse_fm, geo_m,
            sparse_po, sparse_fo, geo_o,
            radius, model_pts, k_coarse,
            train=train, gt_r=gt_r, gt_t=gt_t_n,
            dist_field=dist_field,
        )

        pred_R, pred_t, pred_pose_score, fine_attens = self.fine_point_matching(
            dense_pm, dense_fm, geo_m, fps_idx_m,
            dense_po_n, dense_fo_n, geo_o, fps_idx_o,
            radius, model_pts, init_R, init_t,
            train=train,
        )

        out = {
            "pred_R": pred_R,
            "pred_t": pred_t,
            "pred_pose_score": pred_pose_score,
            "init_R": init_R,
            "init_t": init_t,
            "radius": radius,
        }
        if train:
            out["coarse_attens"] = coarse_attens
            out["fine_attens"] = fine_attens
            out["sparse_pm"] = sparse_pm
            out["sparse_po"] = sparse_po
            out["dense_pm"] = dense_pm
            out["dense_po"] = dense_po_n
        return out

    def get_obj_feats(self, tem_rgb, tem_pts, tem_choose, npoint=None):
        """Template onboarding: per-view ViT features -> FPS bank."""
        return self.feature_extraction.get_obj_feats(
            tem_rgb, tem_pts, tem_choose, npoint
        )

    def train_forward(self, pts, rgb, rgb_choose, tem_rgb, tem_pts,
                      tem_choose, key, gt_r, gt_t):
        """Training forward with in-graph template feature extraction.

        The reference's train-capable Net runs get_obj_feats over 2
        template views per sample inside the forward (training uses 2
        views, inference 42 — provider/training_dataset.py:164-167);
        this fork dropped that path, restored here.

        Args:
          tem_rgb: (B, T, S, S, 3); tem_pts: (B, T, Np, 3);
          tem_choose: (B, T, Np).
        """
        from sam6d_tpu.ops.fps import sample_pts_feats

        B, T = tem_rgb.shape[:2]
        S = tem_rgb.shape[2]
        feat = self.feature_extraction.get_img_feats(
            tem_rgb.reshape(B * T, S, S, 3),
            tem_choose.reshape(B * T, -1),
        )  # (B*T, Np, C)
        feat = feat.reshape(B, -1, feat.shape[-1])
        all_pts = tem_pts.reshape(B, -1, 3)
        dense_po, dense_fo = sample_pts_feats(
            all_pts, feat, self.cfg.fine_npoint
        )
        return self(
            pts, rgb, rgb_choose, model_pts=dense_po,
            dense_po=dense_po, dense_fo=dense_fo, key=key, train=True,
            gt_r=gt_r, gt_t=gt_t,
        )
