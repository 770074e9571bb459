"""InfoNCE-style correspondence loss over matching attention maps.

Re-derivation of reference Pose_Estimation_Model/utils/loss_utils.py
(compute_correspondence_loss :7-52, Loss :56-68): per-block cross-entropy
between each side's attention logits and the nearest-neighbor
correspondence labels under the ground-truth pose (label 0 = background
token for points with no neighbor within dis_thres), plus diagnostic
metrics (acc, fg_num, mean foreground distance).  The total is the sum of
per-block coarse+fine losses clamped at 100.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from sam6d_tpu.ops.geometry import pairwise_distance


def correspondence_labels(pts1, pts2, gt_r, gt_t, dis_thres=0.15):
    """Nearest-neighbor labels under the GT pose.

    Args:
      pts1: (B, N1, 3) observed (normalized); pts2: (B, N2, 3) template.
      gt_r: (B, 3, 3); gt_t: (B, 3) (normalized space).

    Returns:
      (label1, label2): int labels in [0, N2] / [0, N1] (0 = background).
    """
    gt_pts = (pts1 - gt_t[:, None, :]) @ gt_r
    dis_mat = jnp.sqrt(pairwise_distance(gt_pts, pts2))

    dis1 = jnp.min(dis_mat, axis=2)
    nn1 = jnp.argmin(dis_mat, axis=2)
    label1 = jnp.where(dis1 <= dis_thres, nn1 + 1, 0)

    dis2 = jnp.min(dis_mat, axis=1)
    nn2 = jnp.argmin(dis_mat, axis=1)
    label2 = jnp.where(dis2 <= dis_thres, nn2 + 1, 0)
    return label1, label2, gt_pts


def compute_correspondence_loss(
    atten_list,
    pts1,
    pts2,
    gt_r,
    gt_t,
    dis_thres: float = 0.15,
    prefix: str = "coarse",
):
    """Per-block CE losses + diagnostics for one matching stage.

    Returns:
      dict of (B,)-shaped entries: {prefix}_loss{i}, {prefix}_acc,
      {prefix}_fg_num, {prefix}_dis.
    """
    label1, label2, gt_pts = correspondence_labels(
        pts1, pts2, gt_r, gt_t, dis_thres
    )
    out = {}
    for i, atten in enumerate(atten_list):
        # Observed->template: logits (B, N1, 1+N2), labels in [0, N2].
        logits1 = atten[:, 1:, :]
        l1 = optax.softmax_cross_entropy_with_integer_labels(
            logits1, label1
        ).mean(axis=1)
        # Template->observed: logits (B, N2, 1+N1), labels in [0, N1].
        logits2 = jnp.swapaxes(atten[:, :, 1:], 1, 2)
        l2 = optax.softmax_cross_entropy_with_integer_labels(
            logits2, label2
        ).mean(axis=1)
        out[f"{prefix}_loss{i}"] = 0.5 * (l1 + l2)

    pred_label = jnp.argmax(atten_list[-1][:, 1:, :], axis=2)
    out[f"{prefix}_acc"] = (pred_label == label1).astype(jnp.float32).mean(axis=1)

    fg_mask = (pred_label > 0).astype(jnp.float32)
    out[f"{prefix}_fg_num"] = fg_mask.sum(axis=1)

    fg_label = (fg_mask * (pred_label - 1)).astype(jnp.int32)
    pred_pts = jnp.take_along_axis(pts2, fg_label[..., None], axis=1)
    pred_dis = jnp.linalg.norm(pred_pts - gt_pts, axis=2)
    out[f"{prefix}_dis"] = (pred_dis * fg_mask).sum(axis=1) / (
        fg_mask.sum(axis=1) + 1e-8
    )
    return out


def total_loss(end_points: dict) -> tuple[jax.Array, dict]:
    """Sum per-block losses, clamp at 100, mean over batch
    (reference loss_utils.py:56-68)."""
    loss = 0.0
    metrics = {}
    for key, val in end_points.items():
        if "coarse_" in key or "fine_" in key:
            metrics[key] = val.mean()
            if "loss" in key:
                loss = loss + val
    loss = jnp.clip(loss, max=100.0).mean()
    metrics["loss"] = loss
    return loss, metrics


def pem_loss(out: dict, gt_r, gt_t, coarse_dis_thres: float = 0.15,
             fine_dis_thres: float = 0.15):
    """Full PEM training loss from the model's train-mode outputs.

    Labels are computed in the radius-normalized space the attens live in
    (gt_t is divided by the per-sample template radius).

    The per-stage thresholds matter: a point's GT label is background
    when its nearest cross-cloud neighbor is farther than dis_thres x
    radius, so the threshold must exceed the typical template point
    spacing (~2/sqrt(N) x radius for N surface points) or labels
    degenerate to all-background and the net correctly learns to predict
    nothing — the reference's 0.15 assumes its 196/2048 point counts
    (config/base.yaml loss_dis_thres).
    """
    radius = out["radius"]
    gt_t_n = gt_t / (radius[:, None] + 1e-6)
    end_points = {}
    end_points.update(
        compute_correspondence_loss(
            out["coarse_attens"], out["sparse_pm"], out["sparse_po"],
            gt_r, gt_t_n, coarse_dis_thres, prefix="coarse",
        )
    )
    end_points.update(
        compute_correspondence_loss(
            out["fine_attens"], out["dense_pm"], out["dense_po"],
            gt_r, gt_t_n, fine_dis_thres, prefix="fine",
        )
    )
    return total_loss(end_points)
