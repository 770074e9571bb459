"""Proposal-vs-template scoring for the ISM.

Re-derivation of reference Instance_Segmentation_Model/model/loss.py
(PairwiseSimilarity :21-44, MaskedPatch_MatrixSimilarity :46-116) and the
score assembly in model/detector.py (compute_semantic_score :260-296,
compute_appearance_score :298-308, compute_geometric_score :310-322) and
run_inference_custom.py:255 (final score).

All scores are static-shape jnp over padded proposal batches: the
reference's python chunk loops (chunk 16/42/64) become one batched
einsum per score — proposals are just a batch axis on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sam6d_tpu.ops.geometry import l2_normalize


def semantic_similarity_matrix(
    query_desc: jax.Array, ref_desc: jax.Array
) -> jax.Array:
    """Cosine similarity of proposal vs template CLS descriptors.

    Args:
      query_desc: (Q, D) proposal descriptors.
      ref_desc: (O, T, D) per-object template descriptors.

    Returns:
      (Q, O, T) similarities clamped to [0, 1].
    """
    q = l2_normalize(query_desc)
    r = l2_normalize(ref_desc)
    sim = jnp.einsum("qd,otd->qot", q, r)
    return jnp.clip(sim, 0.0, 1.0)


def aggregate_semantic_score(
    sim: jax.Array, aggregation: str = "avg_5"
) -> jax.Array:
    """Aggregate per-template similarities to a per-object score
    (reference detector.py:265-279)."""
    if aggregation == "mean":
        return jnp.mean(sim, axis=-1)
    if aggregation == "median":
        return jnp.median(sim, axis=-1)
    if aggregation == "max":
        return jnp.max(sim, axis=-1)
    if aggregation == "avg_5":
        top5, _ = jax.lax.top_k(sim, min(5, sim.shape[-1]))
        return jnp.mean(top5, axis=-1)
    raise ValueError(f"unknown aggregation {aggregation}")


def semantic_score(
    query_desc: jax.Array,
    ref_desc: jax.Array,
    aggregation: str = "avg_5",
):
    """Best-object assignment + best-template index per proposal.

    Returns:
      (score, obj_idx, best_template, sim): per-proposal best-object
      score (Q,), assigned object (Q,), best template index for the
      assigned object (Q,), and the full (Q, O, T) matrix.
    """
    sim = semantic_similarity_matrix(query_desc, ref_desc)
    per_obj = aggregate_semantic_score(sim, aggregation)  # (Q, O)
    obj_idx = jnp.argmax(per_obj, axis=-1)
    score = jnp.max(per_obj, axis=-1)
    best_template_all = jnp.argmax(sim, axis=-1)  # (Q, O)
    best_template = jnp.take_along_axis(
        best_template_all, obj_idx[:, None], axis=1
    )[:, 0]
    return score, obj_idx, score, best_template, sim


def appearance_score(
    query_patches: jax.Array, ref_patches: jax.Array
) -> jax.Array:
    """Masked patch-matrix appearance similarity
    (reference loss.py compute_straight :52-62).

    Args:
      query_patches: (Q, Np, D) masked patch descriptors (zeros where
        invalid).
      ref_patches: (Q, Nr, D) best-template patch descriptors.

    Returns:
      (Q,) appearance scores in [0, 1].
    """
    sim = jnp.einsum("qnd,qmd->qnm", query_patches, ref_patches)
    max_ref = jnp.max(sim, axis=-1)  # (Q, Np)
    valid = jnp.sum(jnp.abs(query_patches), axis=-1) > 0
    factor = jnp.sum(valid, axis=-1) + 1e-6
    scores = jnp.sum(max_ref * valid, axis=-1) / factor
    return jnp.clip(scores, 0.0, 1.0)


def visible_ratio(
    query_patches: jax.Array, ref_patches: jax.Array, thred: float = 0.5
) -> jax.Array:
    """Fraction of template patches matched above `thred`
    (reference loss.py compute_visible_ratio :64-76)."""
    sim = jnp.einsum("qnd,qmd->qnm", query_patches, ref_patches)
    best = jnp.max(sim, axis=1)  # (Q, Nr)
    valid_patches = jnp.sum(best != 0.0, axis=-1) + 1e-6
    matched = jnp.sum((best > thred), axis=-1)
    return matched / valid_patches


def bbox_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise-free elementwise IoU of (N, 4) xyxy boxes
    (reference utils/bbox_utils.py:197-221 compute_iou)."""
    x1 = jnp.maximum(a[:, 0], b[:, 0])
    y1 = jnp.maximum(a[:, 1], b[:, 1])
    x2 = jnp.minimum(a[:, 2], b[:, 2])
    y2 = jnp.minimum(a[:, 3], b[:, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a + area_b - inter + 1e-9)


def geometric_score(
    projected_uv: jax.Array,
    proposal_boxes: jax.Array,
) -> jax.Array:
    """IoU between the projected-template bbox and the proposal bbox
    (reference detector.py:310-322)."""
    lo = jnp.min(projected_uv, axis=1)  # (Q, 2)
    hi = jnp.max(projected_uv, axis=1)
    proj_boxes = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    return bbox_iou(proj_boxes, proposal_boxes)


def final_score(
    sem: jax.Array, appe: jax.Array, geo: jax.Array, vis: jax.Array
) -> jax.Array:
    """(sem + appe + geo*vis) / (2 + vis)
    (reference run_inference_custom.py:255)."""
    return (sem + appe + geo * vis) / (2.0 + vis)
