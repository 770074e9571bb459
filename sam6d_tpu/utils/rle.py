"""COCO-style run-length encoding for masks.

Re-derivation of reference mask_to_rle / rle_to_binary_mask
(Instance_Segmentation_Model/model/utils.py:25-43,
Pose_Estimation_Model/utils/data_utils.py:72-89): column-major ('F')
order, counts starting with the zero run.
"""

from __future__ import annotations

import numpy as np


def mask_to_rle(mask: np.ndarray) -> dict:
    """Binary (H, W) mask -> {"counts": [...], "size": [H, W]}."""
    flat = np.asarray(mask, bool).flatten(order="F")
    # Runs of equal values; counts start with the leading zero run.
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    boundaries = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(boundaries).tolist()
    if flat.size and flat[0]:
        counts = [0] + counts
    return {"counts": counts, "size": list(mask.shape)}


def rle_to_mask(rle: dict) -> np.ndarray:
    """{"counts", "size"} -> binary (H, W) mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in counts:
        if val:
            flat[pos : pos + c] = True
        pos += c
        val = not val
    return flat.reshape((h, w), order="F")
