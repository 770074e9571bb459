"""Multi-host ISM evaluation over BOP scenes.

Re-derivation of reference Instance_Segmentation_Model/run_inference.py
(:9-80): sweep all test frames of a BOP dataset, run the detector, write
BOP23 detection json.  The PL-Trainer/ddp/slurm machinery is replaced by
process_index frame sharding + the filesystem merge (same pattern as
pipeline/bop_eval.py).
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax

from sam6d_tpu.models.ism.onboarding import (
    onboard_objects,
    onboard_objects_pbr,
)
from sam6d_tpu.pipeline.bop_eval import shard_frames
from sam6d_tpu.provider.bop import (
    list_frames,
    list_scenes,
    load_frame,
    load_objects,
)


def run_ism_eval(
    detector,
    dataset_dir: str,
    template_root: str,
    output_dir: str,
    n_views: int = 42,
    max_frames: int | None = None,
    obj_id_offset: int = 1,
    onboarding: str = "render",
):
    """ISM sweep: onboard all dataset objects, detect on every frame.

    onboarding: "render" uses template_root's rendered views (reference
    BOPTemplate); "pbr" builds the banks from the dataset's train_pbr
    images (reference BOPTemplatePBR).

    Writes per-host `ism_shard_*.json` and the merged
    `detection_ism_bop.json` on host 0.
    """
    process_index = jax.process_index()
    process_count = jax.process_count()

    objects = load_objects(
        os.path.join(dataset_dir, "models"),
        n_sample=detector.cfg.pointcloud_sample_num,
        template_root=template_root,
    )
    os.makedirs(output_dir, exist_ok=True)
    if onboarding == "pbr":
        obj_ids = onboard_objects_pbr(
            detector,
            dataset_dir,
            obj_ids=sorted(objects),
            pointclouds={oid: o.model_points for oid, o in objects.items()},
            cache_path=os.path.join(output_dir, "ism_descriptors.pkl"),
        )
    else:
        template_dirs = {
            oid: o.template_dir
            for oid, o in objects.items()
            if o.template_dir and os.path.isdir(o.template_dir)
        }
        obj_ids = onboard_objects(
            detector,
            template_dirs,
            pointclouds={
                oid: objects[oid].model_points for oid in template_dirs
            },
            n_views=n_views,
            cache_path=os.path.join(output_dir, "ism_descriptors.pkl"),
        )

    frames = []
    for scene_dir in list_scenes(dataset_dir):
        scene_id = int(os.path.basename(scene_dir))
        for im_id in list_frames(scene_dir):
            frames.append((scene_id, im_id, scene_dir))
    frames = shard_frames(frames, process_index, process_count)
    if max_frames:
        frames = frames[:max_frames]

    os.makedirs(output_dir, exist_ok=True)
    rows = []
    for scene_id, im_id, scene_dir in frames:
        rgb, depth, K = load_frame(scene_dir, im_id)
        t0 = time.perf_counter()
        dets = detector.detect(rgb, depth, K)
        dt = time.perf_counter() - t0
        if len(dets) and dets.object_ids is not None:
            # Map onboarded object index -> BOP object id.
            dets.object_ids = np.asarray(
                [obj_ids[i] for i in dets.object_ids]
            )
        rows.extend(
            dets.to_bop23(scene_id, im_id, runtime=dt, object_id_offset=0)
        )

    from sam6d_tpu.pipeline.bop_eval import write_shard_and_merge

    merged = write_shard_and_merge(
        output_dir, rows, prefix="ism_shard",
        merged_name="detection_ism_bop.json",
    )
    return merged if merged is not None else rows
