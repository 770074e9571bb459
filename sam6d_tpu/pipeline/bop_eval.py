"""Multi-host BOP evaluation sweep with filesystem result merge.

Re-derivation of the reference's distributed-eval pattern
(Instance_Segmentation_Model/model/detector.py:425-461 test_epoch_end:
every rank writes per-frame files, rank 0 globs and merges — "the
filesystem as the collective"), kept deliberately: it is restart-friendly
and makes partial sweeps resumable.  Frames shard over hosts by
process_index; each host batches its frames' instances through the
jitted PEM forward on its local chips.

Output: BOP-format pose csv rows (scene_id, im_id, obj_id, score, R, t,
time) ready for bop_toolkit scoring.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import jax

from sam6d_tpu.config import PEMConfig
from sam6d_tpu.pipeline.pem_runner import PEMRunner
from sam6d_tpu.provider.bop import BOPTestset, load_objects


def shard_frames(frames: list, process_index: int, process_count: int):
    """Static round-robin frame sharding across hosts."""
    return frames[process_index::process_count]


def run_bop_eval(
    cfg: PEMConfig,
    dataset_dir: str,
    detections_path: str,
    template_root: str,
    output_dir: str,
    runner: PEMRunner | None = None,
    max_frames: int | None = None,
):
    """Evaluate PEM on every frame with ISM detections.

    Writes per-host shard jsons and (on host 0) the merged result.
    """
    process_index = jax.process_index()
    process_count = jax.process_count()

    objects = load_objects(
        os.path.join(dataset_dir, "models"),
        n_sample=cfg.n_sample_model_point,
        template_root=template_root,
    )
    testset = BOPTestset(cfg, dataset_dir, objects).load_detections(
        detections_path
    )
    frames = shard_frames(
        testset.frames(), process_index, process_count
    )
    if max_frames:
        frames = frames[:max_frames]

    if runner is None:
        runner = PEMRunner(cfg)
        runner.init_random()

    os.makedirs(output_dir, exist_ok=True)
    rows = []
    onboarded: dict[int, tuple] = {}
    for scene_id, image_id in frames:
        batch, _ = testset.get_frame_instances(scene_id, image_id)
        if batch is None:
            continue
        t0 = time.perf_counter()
        # Group instances by object so each uses its own template bank.
        for obj_id in np.unique(batch["obj_id"]):
            sel = np.flatnonzero(batch["obj_id"] == obj_id)
            obj = objects[int(obj_id)]
            if obj.template_dir and int(obj_id) not in onboarded:
                runner.onboard(
                    obj.template_dir,
                    cache_path=os.path.join(
                        obj.template_dir, "feat_cache.npz"
                    ),
                )
                onboarded[int(obj_id)] = (
                    runner.tem_pts, runner.tem_feat, runner.template_bank
                )
            elif int(obj_id) in onboarded:
                runner.tem_pts, runner.tem_feat, runner.template_bank = (
                    onboarded[int(obj_id)]
                )
            if runner.template_bank is None:
                continue
            sub = {
                k: batch[k][sel]
                for k in ("pts", "rgb", "rgb_choose", "model_pts", "score")
            }
            out = runner.infer(sub)
            dt = time.perf_counter() - t0
            for j, i in enumerate(sel):
                rows.append(
                    {
                        "scene_id": int(scene_id),
                        "im_id": int(image_id),
                        "obj_id": int(obj_id),
                        "score": float(out["score"][j]),
                        "R": out["pred_R"][j].reshape(-1).tolist(),
                        "t": (out["pred_t"][j] * 1000.0).tolist(),
                        "time": dt,
                    }
                )

    merged = write_shard_and_merge(output_dir, rows, prefix="pem_shard",
                                   merged_name="detection_pem_bop.json")
    if merged is not None:
        write_bop_csv(merged, os.path.join(output_dir, "result_bop.csv"))
        return merged
    return rows


def write_shard_and_merge(
    output_dir: str,
    rows: list,
    prefix: str,
    merged_name: str,
):
    """Filesystem result collective with a cross-host barrier.

    Every host writes `<prefix>_<rank>.json`, then ALL hosts synchronize
    (the reference's PL end-of-test barrier, detector.py:425-461 —
    without it host 0 can glob a partial shard set), then host 0 globs
    and merges.  Returns the merged rows on host 0, None elsewhere.
    """
    from sam6d_tpu.parallel.distributed import sync_hosts

    os.makedirs(output_dir, exist_ok=True)
    shard_path = os.path.join(
        output_dir, f"{prefix}_{jax.process_index():04d}.json"
    )
    with open(shard_path, "w") as f:
        json.dump(rows, f)

    sync_hosts(f"{prefix}-merge")

    if jax.process_index() == 0:
        merged = []
        for p in sorted(
            glob.glob(os.path.join(output_dir, f"{prefix}_*.json"))
        ):
            with open(p) as f:
                merged.extend(json.load(f))
        with open(os.path.join(output_dir, merged_name), "w") as f:
            json.dump(merged, f)
        return merged
    return None


def write_bop_csv(rows: list[dict], path: str):
    """bop_toolkit-compatible csv: scene_id,im_id,obj_id,score,R,t,time."""
    with open(path, "w") as f:
        f.write("scene_id,im_id,obj_id,score,R,t,time\n")
        for r in rows:
            R = " ".join(f"{v:.6f}" for v in r["R"])
            t = " ".join(f"{v:.6f}" for v in r["t"])
            f.write(
                f"{r['scene_id']},{r['im_id']},{r['obj_id']},"
                f"{r['score']:.6f},{R},{t},{r['time']:.3f}\n"
            )
