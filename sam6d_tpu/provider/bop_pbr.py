"""BOP PBR-image onboarding for the ISM.

Re-derivation of reference Instance_Segmentation_Model/provider/
bop_pbr.py (BOPTemplatePBR :28): instead of BlenderProc-rendered
templates, the template bank is built from the dataset's own
train_pbr renders — scan a bounded number of scenes/frames, keep
instances with visib_fract above threshold, and for each of the 42
level-0 template viewpoints pick the real PBR crop whose ground-truth
object rotation views the object most similarly (viewing-direction
nearest neighbor, reference load_processed_metaData :154-198 +
NearestTemplateFinder).

Host-side, offline (runs once per dataset); outputs feed
ISMDetector.onboard_templates directly.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
from PIL import Image

from sam6d_tpu.provider.bop import list_scenes
from sam6d_tpu.utils.template_poses import get_obj_poses_from_template_level


@dataclass
class PBRInstance:
    """One visible object instance in a train_pbr frame."""

    scene_dir: str
    frame_id: int
    idx_obj: int  # index within the frame's GT list (mask file suffix)
    obj_id: int
    R: np.ndarray  # (3, 3) cam_R_m2c
    visib_fract: float


def scan_pbr_instances(
    dataset_dir: str,
    split: str = "train_pbr",
    max_scenes: int = 10,
    max_frames: int = 1000,
    min_visib_fract: float = 0.8,
) -> dict[int, list[PBRInstance]]:
    """Index train_pbr instances per object id.

    Mirrors reference load_metaData (bop_pbr.py:81-143) with the same
    scene/frame bounds ("not need to search all scenes since it is
    slow").
    """
    per_obj: dict[int, list[PBRInstance]] = {}
    for scene_dir in list_scenes(dataset_dir, split)[:max_scenes]:
        gt_path = os.path.join(scene_dir, "scene_gt.json")
        info_path = os.path.join(scene_dir, "scene_gt_info.json")
        if not (os.path.exists(gt_path) and os.path.exists(info_path)):
            continue
        scene_gt = json.load(open(gt_path))
        scene_info = json.load(open(info_path))
        for n_frame, frame_id in enumerate(sorted(scene_gt, key=int)):
            if n_frame > max_frames:
                break
            for idx_obj, (gt, info) in enumerate(
                zip(scene_gt[frame_id], scene_info[frame_id])
            ):
                vis = float(info.get("visib_fract", 0.0))
                if vis <= min_visib_fract:
                    continue
                inst = PBRInstance(
                    scene_dir=scene_dir,
                    frame_id=int(frame_id),
                    idx_obj=idx_obj,
                    obj_id=int(gt["obj_id"]),
                    R=np.array(gt["cam_R_m2c"], np.float32).reshape(3, 3),
                    visib_fract=vis,
                )
                per_obj.setdefault(inst.obj_id, []).append(inst)
    return per_obj


def select_views_per_template(
    instances: list[PBRInstance], level: int = 0
) -> list[PBRInstance]:
    """For each template viewpoint, the PBR instance whose viewing
    direction (third row of R) is nearest (reference
    NearestTemplateFinder usage in load_processed_metaData)."""
    template_poses = get_obj_poses_from_template_level(level)
    t_dirs = template_poses[:, 2, :3]  # (T, 3)
    q_dirs = np.stack([inst.R[2] for inst in instances])  # (N, 3)
    q_dirs = q_dirs / np.maximum(
        np.linalg.norm(q_dirs, axis=1, keepdims=True), 1e-9
    )
    best = np.argmax(t_dirs @ q_dirs.T, axis=1)  # (T,)
    return [instances[i] for i in best]


def _load_instance_crop(
    inst: PBRInstance, image_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Masked square crop + mask at image_size (reference
    __getitem__ masked-composite + CropResizePad semantics)."""
    rgb_path = os.path.join(
        inst.scene_dir, "rgb", f"{inst.frame_id:06d}.png"
    )
    if not os.path.exists(rgb_path):
        rgb_path = os.path.join(
            inst.scene_dir, "rgb", f"{inst.frame_id:06d}.jpg"
        )
    rgb = np.asarray(Image.open(rgb_path).convert("RGB"), np.float32) / 255.0
    mask = (
        np.asarray(
            Image.open(
                os.path.join(
                    inst.scene_dir,
                    "mask_visib",
                    f"{inst.frame_id:06d}_{inst.idx_obj:06d}.png",
                )
            )
        )
        > 127
    )
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return (
            np.zeros((image_size, image_size, 3), np.float32),
            np.zeros((image_size, image_size), bool),
        )
    y1, y2, x1, x2 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    # Square window centered on the bbox (pad-to-square like
    # CropResizePad, bbox_utils.py:98-126).
    side = max(y2 - y1, x2 - x1)
    cy, cx = (y1 + y2) // 2, (x1 + x2) // 2
    y1s, x1s = cy - side // 2, cx - side // 2
    H, W = mask.shape
    crop = np.zeros((side, side, 3), np.float32)
    mcrop = np.zeros((side, side), bool)
    sy1, sx1 = max(y1s, 0), max(x1s, 0)
    sy2, sx2 = min(y1s + side, H), min(x1s + side, W)
    crop[sy1 - y1s : sy2 - y1s, sx1 - x1s : sx2 - x1s] = (
        rgb[sy1:sy2, sx1:sx2] * mask[sy1:sy2, sx1:sx2, None]
    )
    mcrop[sy1 - y1s : sy2 - y1s, sx1 - x1s : sx2 - x1s] = mask[
        sy1:sy2, sx1:sx2
    ]
    crop_r = np.asarray(
        Image.fromarray((crop * 255).astype(np.uint8)).resize(
            (image_size, image_size), Image.BILINEAR
        ),
        np.float32,
    ) / 255.0
    mask_r = (
        np.asarray(
            Image.fromarray(mcrop.astype(np.uint8) * 255).resize(
                (image_size, image_size), Image.BILINEAR
            )
        )
        > 127
    )
    return crop_r, mask_r


def load_pbr_onboarding_templates(
    dataset_dir: str,
    obj_id: int,
    split: str = "train_pbr",
    level: int = 0,
    image_size: int = 224,
    per_obj: dict[int, list[PBRInstance]] | None = None,
    **scan_kwargs,
):
    """Full PBR onboarding for one object.

    Returns:
      (images (T, S, S, 3) float [0,1], masks (T, S, S) bool,
       poses (T, 4, 4)) — the ISMDetector.onboard_templates inputs.
    """
    if per_obj is None:
        per_obj = scan_pbr_instances(dataset_dir, split, **scan_kwargs)
    if obj_id not in per_obj or not per_obj[obj_id]:
        raise ValueError(
            f"no train_pbr instances for obj {obj_id} in {dataset_dir}"
        )
    selected = select_views_per_template(per_obj[obj_id], level=level)
    images, masks = zip(
        *[_load_instance_crop(inst, image_size) for inst in selected]
    )
    poses = get_obj_poses_from_template_level(level)
    return np.stack(images), np.stack(masks), poses
