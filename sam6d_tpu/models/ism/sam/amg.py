"""Automatic mask generation (AMG): grid-prompted all-instance proposals.

Re-derivation of reference segment_anything/automatic_mask_generator.py
(:35, _process_crop :225, _process_batch :266) + utils/amg.py
(calculate_stability_score :156, build_point_grid :179,
batched_mask_to_box :303) and the 640-width pre/post resize wrapper
CustomSamAutomaticMaskGenerator (model/sam.py:52-155).

TPU re-design: the reference loops 64-point batches through the decoder
and filters each batch on host with variable shapes.  Here ALL grid
prompts decode inside one jitted program (lax.map over fixed 64-point
chunks), filtering (pred-IoU, stability) and mask->box reduction happen
on device at the 256^2 logit resolution, and a fixed top-K candidate set
returns to host, where only greedy NMS (variable-length, trivially cheap)
runs.  Masks upscale to full resolution on device for the kept set only.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from sam6d_tpu.config import SegmentorConfig
from sam6d_tpu.utils.detections import nms


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) evenly spaced points in [0,1]^2 (x, y) order."""
    offset = 1.0 / (2 * n_per_side)
    coords = np.linspace(offset, 1.0 - offset, n_per_side)
    xs, ys = np.meshgrid(coords, coords)
    return np.stack([xs.flatten(), ys.flatten()], axis=-1).astype(np.float32)


def calculate_stability_score(
    logits: jax.Array, mask_threshold: float, offset: float
) -> jax.Array:
    """IoU between high/low thresholded masks (reference amg.py:156-177)."""
    high = jnp.sum(logits > mask_threshold + offset, axis=(-2, -1))
    low = jnp.sum(logits > mask_threshold - offset, axis=(-2, -1))
    return high / jnp.maximum(low, 1)


def mask_to_box(mask: jax.Array) -> jax.Array:
    """(..., H, W) bool -> (..., 4) xyxy (0s for empty masks)."""
    H, W = mask.shape[-2:]
    ys = jax.lax.broadcasted_iota(jnp.int32, mask.shape[-2:], 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, mask.shape[-2:], 1)
    big = jnp.int32(10**8)
    y_min = jnp.min(jnp.where(mask, ys, big), axis=(-2, -1))
    x_min = jnp.min(jnp.where(mask, xs, big), axis=(-2, -1))
    y_max = jnp.max(jnp.where(mask, ys, -1), axis=(-2, -1))
    x_max = jnp.max(jnp.where(mask, xs, -1), axis=(-2, -1))
    empty = y_max < 0
    box = jnp.stack(
        [x_min, y_min, x_max + 1, y_max + 1], axis=-1
    ).astype(jnp.float32)
    return jnp.where(empty[..., None], 0.0, box)


class SamAutomaticMaskGenerator:
    """Grid-prompted mask proposal generator over a SAM model."""

    def __init__(self, sam_model, cfg: SegmentorConfig):
        """sam_model: object with .encode(image), .decode_points(emb, pts)
        (see models/ism/sam/model.py SAM)."""
        self.sam = sam_model
        self.cfg = cfg
        self.point_grid = build_point_grid(cfg.points_per_side)
        on_tpu = jax.default_backend() == "tpu"
        fused = cfg.fused_tail if cfg.fused_tail is not None else on_tpu
        if fused:
            decode_fn = functools.partial(
                _decode_and_filter_fused, interpret=not on_tpu
            )
        else:
            decode_fn = _decode_and_filter_all
        self._decode_all = jax.jit(
            functools.partial(
                decode_fn,
                sam=self.sam,
                points_per_batch=cfg.points_per_batch,
                mask_threshold=cfg.mask_threshold,
                stability_offset=cfg.stability_score_offset,
                top_k=getattr(cfg, "max_candidates", 256),
            )
        )
        self._upscale = jax.jit(
            _upscale_masks,
            static_argnames=("eff_h", "eff_w", "out_h", "out_w",
                             "mid_h", "mid_w"),
        )

    def generate_masks(self, image: np.ndarray) -> dict:
        """image: (H, W, 3) uint8 -> {"masks": (N, H, W) bool,
        "boxes": (N, 4) xyxy float} (reference model/sam.py:103-148).

        cfg.segmentor_width_size pre-resizes the frame to a fixed width
        before SAM (reference preprocess_resize/postprocess_resize,
        model/sam.py:77-101 — the released weights were evaluated this
        way).  The post-resize back to the original resolution is one
        more linear factor composed into the SAME upscale matmul, so it
        costs nothing on device; boxes scale + clamp on host.
        """
        H, W = image.shape[:2]
        ws = self.cfg.segmentor_width_size or 0
        mid_h = mid_w = None
        box_scale = 1.0
        work = image
        if ws and ws != W:
            from PIL import Image

            mid_h, mid_w = int(ws * H / W), ws
            work = np.asarray(
                Image.fromarray(image).resize((mid_w, mid_h),
                                              Image.BILINEAR)
            )
            box_scale = W / ws
        img_1024, scale_1024, (eff_h, eff_w) = self.sam.preprocess_numpy(work)
        embedding = self.sam.encode(jnp.asarray(img_1024)[None])

        # Grid points over the effective (unpadded) image region in
        # 1024-input coordinates.
        pts = self.point_grid * np.array([eff_w, eff_h], np.float32)
        pts = jnp.asarray(pts)[None]  # (1, P, 2)

        logits_k, iou_k, stab_k, boxes_k = [
            np.asarray(v)
            for v in self._decode_all(embedding=embedding, points=pts)
        ]

        keep = (iou_k > self.cfg.pred_iou_thresh) & (
            stab_k > self.cfg.stability_score_thresh
        )
        # Drop empty/degenerate boxes.
        keep &= (boxes_k[:, 2] > boxes_k[:, 0]) & (boxes_k[:, 3] > boxes_k[:, 1])
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            return {
                "masks": np.zeros((0, H, W), bool),
                "boxes": np.zeros((0, 4), np.float32),
            }
        boxes = boxes_k[idx]
        scores = iou_k[idx]
        kept = nms(boxes, scores, self.cfg.box_nms_thresh)
        idx = idx[kept]

        # Upscale kept 256^2 logits to the original resolution on device
        # (the optional width-size post-resize is composed in).
        masks = np.asarray(
            self._upscale(
                jnp.asarray(logits_k[idx]),
                eff_h=eff_h,
                eff_w=eff_w,
                out_h=H,
                out_w=W,
                mask_threshold=self.cfg.mask_threshold,
                mid_h=mid_h,
                mid_w=mid_w,
            )
        )
        # Boxes: 1024-space -> work-image space -> original pixel space.
        boxes = boxes_k[idx] / scale_1024 * box_scale
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, W - 1)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, H - 1)

        if self.cfg.min_mask_region_area > 0:
            masks, changed = remove_small_regions_batch(
                masks, self.cfg.min_mask_region_area
            )
            # Re-NMS preferring untouched masks, on boxes recomputed
            # from the PROCESSED masks (reference
            # postprocess_small_regions recalculates boxes after hole/
            # island editing, automatic_mask_generator.py).
            boxes = masks_to_boxes(masks)
            rescue = nms(
                boxes, (~changed).astype(np.float32),
                self.cfg.box_nms_thresh,
            )
            masks, boxes = masks[rescue], boxes[rescue]

        nonempty = masks.reshape(len(masks), -1).any(axis=1)
        return {
            "masks": masks[nonempty],
            "boxes": boxes[nonempty].astype(np.float32),
        }


def _decode_and_filter_all(
    embedding,
    points,
    *,
    sam,
    points_per_batch: int,
    mask_threshold: float,
    stability_offset: float,
    top_k: int,
):
    """Decode every grid point, score, and keep a fixed top-K candidate
    set — all on device (the plain-XLA path; the TPU default is the
    fused-tail variant below)."""
    P = points.shape[1]
    n_batches = P // points_per_batch

    pts = points.reshape(n_batches, points_per_batch, 2)

    def one_batch(p):
        # Each point prompts independently: batch = points.
        logits, iou = sam.decode_points(embedding, p[:, None, :])
        # Drop the single-mask token 0; keep the 3 multimask outputs
        # (reference predictor multimask_output=True path).
        return logits[:, 1:], iou[:, 1:]

    logits, iou = jax.lax.map(one_batch, pts)
    # (n_batches, ppb, 3, h, w) -> (N, h, w)
    h, w = logits.shape[-2:]
    logits = logits.reshape(-1, h, w)
    iou = iou.reshape(-1)

    stability = calculate_stability_score(
        logits, mask_threshold, stability_offset
    )

    score = iou + 1e-3 * stability
    top_k = min(top_k, score.shape[0])
    _, keep = jax.lax.top_k(score, top_k)
    logits_k = logits[keep]
    iou_k = iou[keep]
    stab_k = stability[keep]
    # Boxes only for the kept candidates: the 4 iota-reductions over ALL
    # n_points*3 masks at 256^2 cost ~12 ms/frame of pure HBM traffic
    # and only the kept set's boxes are ever consumed.
    boxes_k = mask_to_box(logits_k > mask_threshold) * (
        sam.input_size / h
    )  # to 1024-input coords
    return logits_k, iou_k, stab_k, boxes_k


def _decode_and_filter_fused(
    embedding,
    points,
    *,
    sam,
    points_per_batch: int,
    mask_threshold: float,
    stability_offset: float,
    top_k: int,
    interpret: bool = False,
):
    """Fused-tail AMG decode (VERDICT r2 #3): the transformer runs per
    prompt chunk as before, but the upscale tail + hypernetwork +
    stability/box statistics run in ONE Pallas kernel per prompt
    (ops/pallas/decode_tail.py) that never writes the (P*3, 256, 256)
    logits or any stage intermediate to HBM.  Full logits are then
    recomputed ONLY for the kept top-K candidates (a ~12x smaller set).

    Output contract identical to _decode_and_filter_all; numerics
    differ at bf16-rounding level (keys stored bf16 between the
    transformer and the tail when the model computes in bf16)."""
    from sam6d_tpu.ops.pallas.decode_tail import (
        decode_tail_stats,
        fold_stats,
    )

    P = points.shape[1]
    n_batches = P // points_per_batch
    pts = points.reshape(n_batches, points_per_batch, 2)
    keys_dtype = getattr(sam, "dtype", jnp.float32)

    def one_batch(p):
        keys, hyper, iou = sam.decode_points_pre(embedding, p[:, None, :])
        return keys.astype(keys_dtype), hyper, iou[:, 1:]

    keys, hyper, iou = jax.lax.map(one_batch, pts)
    N, C = keys.shape[-2:]
    keys = keys.reshape(P, N, C)
    hyper3 = hyper.reshape(P, hyper.shape[-2], hyper.shape[-1])[:, 1:]
    iou = iou.reshape(P * 3)

    params = sam.decoder_tail_params()
    stats = decode_tail_stats(
        keys, hyper3, **params,
        mask_threshold=mask_threshold,
        stability_offset=stability_offset,
        interpret=interpret,
    )
    h = int(np.sqrt(N))
    stability, boxes, _ = fold_stats(stats, sam.input_size / (4 * h))
    stability = stability.reshape(P * 3)
    boxes = boxes.reshape(P * 3, 4)

    score = iou + 1e-3 * stability
    top_k = min(top_k, P * 3)
    _, keep = jax.lax.top_k(score, top_k)
    prompt_idx = keep // 3
    tok = keep % 3
    keys_k = keys[prompt_idx]  # (K, N, C)
    hyper_k = hyper3[prompt_idx, tok][:, None]  # (K, 1, c8)
    logits_k = sam.decode_tail(keys_k, hyper_k, h, h)[:, 0]
    return logits_k, iou[keep], stability[keep], boxes[keep]


def _resize_matrix(src: int, dst: int) -> jax.Array:
    """(dst, src) matrix reproducing jax.image.resize('bilinear') along
    one axis — extracted by resizing the identity (resize is linear)."""
    return jax.image.resize(
        jnp.eye(src, dtype=jnp.float32), (dst, src), method="bilinear"
    )


def _upscale_masks(
    logits, eff_h: int, eff_w: int, out_h: int, out_w: int, mask_threshold,
    mid_h: int | None = None, mid_w: int | None = None,
):
    """(K, 256, 256) logits -> (K, out_h, out_w) bool at original size.

    The reference chain is resize(256->1024, bilinear) -> crop padding
    -> resize(crop -> work size) [-> resize(work -> original) when the
    segmentor_width_size pre-resize is active, mid_h/mid_w].  Every step
    is linear per axis, so the whole chain collapses into ONE
    (out_h, h) x (K, h, w) x (w, out_w) matmul pair — mathematically
    identical, but never materializes the (K, 1024, 1024) intermediate
    (measured 38.6 -> ~1 ms at K=256)."""
    K, h, w = logits.shape
    input_size = 4 * h  # 1024
    if mid_h is None:
        A = _resize_matrix(eff_h, out_h) @ _resize_matrix(h, input_size)[:eff_h]
        Bm = _resize_matrix(eff_w, out_w) @ _resize_matrix(w, input_size)[:eff_w]
    else:
        A = (
            _resize_matrix(mid_h, out_h)
            @ _resize_matrix(eff_h, mid_h)
            @ _resize_matrix(h, input_size)[:eff_h]
        )
        Bm = (
            _resize_matrix(mid_w, out_w)
            @ _resize_matrix(eff_w, mid_w)
            @ _resize_matrix(w, input_size)[:eff_w]
        )
    full = jnp.einsum("yh,khw,xw->kyx", A, logits, Bm)
    return full > mask_threshold


def remove_small_regions_batch(masks: np.ndarray, area_thresh: int):
    """Remove small disconnected islands and fill small holes, per mask
    (reference segment_anything/utils/amg.py remove_small_regions via
    cv2.connectedComponents; scipy.ndimage here).

    Returns (masks, changed) where changed marks edited masks."""
    from scipy import ndimage

    out = masks.copy()
    changed = np.zeros(len(masks), bool)
    for i, m in enumerate(masks):
        for mode in ("holes", "islands"):
            work = ~m if mode == "holes" else m
            labels, n = ndimage.label(work)
            if n == 0:
                continue
            sizes = ndimage.sum_labels(
                np.ones_like(work, np.int32), labels, np.arange(1, n + 1)
            )
            small = np.flatnonzero(sizes < area_thresh) + 1
            if len(small) == 0:
                continue
            if mode == "islands" and len(small) == n:
                # Every island is below threshold: keep the largest one
                # instead of emptying the mask (reference
                # remove_small_regions fill_labels fallback).
                small = small[small != (int(np.argmax(sizes)) + 1)]
                if len(small) == 0:
                    continue
            fill = np.isin(labels, small)
            if mode == "holes":
                m = m | fill
            else:
                m = m & ~fill
            changed[i] = True
        out[i] = m
    return out, changed


def masks_to_boxes(masks: np.ndarray) -> np.ndarray:
    """XYXY boxes from (K, H, W) bool masks; zeros for empty masks
    (reference utils/amg.py batched_mask_to_box, host-side).

    Same convention as the device mask_to_box + generate_masks clip
    (exclusive max+1, clipped to W-1/H-1) so downstream consumers see
    ONE convention regardless of the min_mask_region_area flag."""
    K = len(masks)
    H, W = masks.shape[-2:]
    boxes = np.zeros((K, 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if len(ys) == 0:
            continue
        boxes[i] = (xs.min(), ys.min(),
                    min(xs.max() + 1, W - 1), min(ys.max() + 1, H - 1))
    return boxes
