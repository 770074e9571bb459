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
    from sam6d_tpu.utils import native

    counts = native.rle_encode(mask)
    if counts is not None:
        return {"counts": counts, "size": list(mask.shape)}
    flat = np.asarray(mask, bool).flatten(order="F")
    # Runs of equal values; counts start with the leading zero run.
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    boundaries = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(boundaries).tolist()
    if flat.size and flat[0]:
        counts = [0] + counts
    return {"counts": counts, "size": list(mask.shape)}


def rle_to_mask(rle: dict) -> np.ndarray:
    """{"counts", "size"} -> binary (H, W) mask.  Accepts both the
    uncompressed list form and COCO's compressed string form
    (pycocotools-compatible, used in reference-produced jsons)."""
    from sam6d_tpu.utils import native

    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = _decode_compressed_counts(counts)
    out = native.rle_decode(counts, h, w)
    if out is not None:
        return out
    counts = np.asarray(counts, np.int64)
    vals = np.zeros(len(counts), bool)
    vals[1::2] = True
    flat = np.repeat(vals, counts)
    if flat.size < h * w:
        flat = np.concatenate([flat, np.zeros(h * w - flat.size, bool)])
    return flat[: h * w].reshape((h, w), order="F")


def _decode_compressed_counts(s) -> list[int]:
    """COCO compressed RLE string -> run counts (LEB128-style with
    delta coding, cf. pycocotools rleFrString)."""
    if isinstance(s, str):
        s = s.encode("ascii")
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _encode_compressed_counts(counts: list[int]) -> str:
    """Run counts -> COCO compressed RLE string."""
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return out.decode("ascii")
