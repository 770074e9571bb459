"""Bounding-box and crop utilities.

Re-derivation of reference Instance_Segmentation_Model/utils/bbox_utils.py:
CropResizePad (:89-126), xyxy_to_xywh (:129), compute_iou (:197) and the
square-bbox crop of PEM data prep (Pose_Estimation_Model/utils/
data_utils.py:126-160 get_bbox).

TPU formulation of CropResizePad: the reference loops over proposals
calling F.interpolate per crop; here a single vmapped
jax.image.scale_and_translate resamples all proposals from the full image
in one static-shape batched op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def xyxy_to_xywh(boxes: np.ndarray) -> np.ndarray:
    out = np.array(boxes, np.float32).copy()
    out[..., 2] = boxes[..., 2] - boxes[..., 0]
    out[..., 3] = boxes[..., 3] - boxes[..., 1]
    return out


def xywh_to_xyxy(boxes: np.ndarray) -> np.ndarray:
    out = np.array(boxes, np.float32).copy()
    out[..., 2] = boxes[..., 0] + boxes[..., 2]
    out[..., 3] = boxes[..., 1] + boxes[..., 3]
    return out


def compute_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, M) IoU matrix of xyxy boxes."""
    ax1, ay1, ax2, ay2 = a[:, 0, None], a[:, 1, None], a[:, 2, None], a[:, 3, None]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]
    ix1 = np.maximum(ax1, bx1)
    iy1 = np.maximum(ay1, by1)
    ix2 = np.minimum(ax2, bx2)
    iy2 = np.minimum(ay2, by2)
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    return inter / (area_a + area_b - inter + 1e-9)


def crop_resize_pad(
    image: jax.Array,
    boxes: jax.Array,
    target_size: int = 224,
) -> jax.Array:
    """Square crop-scale-pad of proposal boxes from one image, batched.

    Each box is cropped, isotropically scaled so its longer side equals
    `target_size`, and zero-padded bottom/right (reference
    bbox_utils.py:98-126 semantics).

    Args:
      image: (H, W, C) float image.
      boxes: (Q, 4) float xyxy boxes.

    Returns:
      (Q, target_size, target_size, C).
    """
    H, W, C = image.shape

    def one(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        h = y2 - y1
        w = x2 - x1
        scale = target_size / jnp.maximum(jnp.maximum(h, w), 1e-6)
        out = jax.image.scale_and_translate(
            image,
            (target_size, target_size, C),
            (0, 1),
            jnp.array([scale, scale]),
            jnp.array([-scale * y1, -scale * x1]),
            method="bilinear",
        )
        # Mask out regions beyond the scaled crop (scale_and_translate
        # samples the full image, not just the crop window).
        yy = jnp.arange(target_size)[:, None]
        xx = jnp.arange(target_size)[None, :]
        valid = (yy < scale * h) & (xx < scale * w)
        return out * valid[..., None]

    return jax.vmap(one)(boxes)


def square_bbox(mask: np.ndarray) -> tuple[int, int, int, int]:
    """Square bbox around a binary mask, clipped in-image
    (reference data_utils.py:126-160 get_bbox)."""
    H, W = mask.shape
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    rmax += 1
    cmax += 1
    b = min(max(rmax - rmin, cmax - cmin), min(H, W))
    center = [int((rmin + rmax) / 2), int((cmin + cmax) / 2)]
    rmin = center[0] - b // 2
    rmax = center[0] + b // 2
    cmin = center[1] - b // 2
    cmax = center[1] + b // 2
    if rmin < 0:
        rmax += -rmin
        rmin = 0
    if cmin < 0:
        cmax += -cmin
        cmin = 0
    if rmax > H:
        rmin -= rmax - H
        rmax = H
    if cmax > W:
        cmin -= cmax - W
        cmax = W
    return int(rmin), int(rmax), int(cmin), int(cmax)


def get_resize_rgb_choose(
    choose: np.ndarray, bbox: tuple[int, int, int, int], img_size: int
) -> np.ndarray:
    """Map in-crop flat pixel indices to indices in the resized crop
    (reference data_utils.py:113-123)."""
    rmin, rmax, cmin, cmax = bbox
    crop_h = rmax - rmin
    crop_w = cmax - cmin
    ratio_h = img_size / crop_h
    ratio_w = img_size / crop_w
    row_idx = choose // crop_w
    col_idx = choose % crop_w
    return (
        np.floor(row_idx * ratio_h) * img_size + np.floor(col_idx * ratio_w)
    ).astype(np.int64)
