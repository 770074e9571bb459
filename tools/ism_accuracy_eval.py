"""ISM accuracy loop WITHOUT GT masks (VERDICT r2 #4): the trained tiny
descriptor (tools/train_ism_descriptor.py) drives the REAL 3-score
detector on held-out objects, with proposals from a depth
connected-component segmenter, then chains into PEM for an e2e AR.

What this closes: the semantic/appearance/geometric scoring path
(models/ism/detector.py) had only ever run on random weights; here it
must (a) pick the correct object out of a multi-object template bank,
(b) retrieve a near-correct template view, and (c) produce detections
good enough that the ISM->PEM AR approaches the GT-mask ceiling
(0.666 at the smoke config; see BASELINE.md).

Proposal source: SAM cannot run meaningfully here (no checkpoint, zero
egress), so proposals come from connected components of the depth
foreground + distractor box proposals — mirroring the reference's
segmentor-agnostic design (SAM and FastSAM are swappable,
configs/model/ISM_*.yaml; the detector consumes any {masks, boxes}).
The DESCRIPTOR and all three scores are the real learned path.

Usage:
  python -u tools/train_ism_descriptor.py --ckpt_dir /root/repo/.ckpt_ism_desc
  python -u tools/smoke_train_eval.py --steps 2000 --objects 128 \
      --ckpt_dir /root/repo/.ckpt_smoke
  python -u tools/ism_accuracy_eval.py \
      --desc_ckpt /root/repo/.ckpt_ism_desc --pem_ckpt /root/repo/.ckpt_smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class DepthCCSegmentor:
    """Proposal generator: connected components of the depth foreground
    plus a few random distractor boxes (so selection is non-trivial)."""

    def __init__(self, background_mm: float = 890.0, n_distractors: int = 4,
                 seed: int = 0):
        self.background_mm = background_mm
        self.n_distractors = n_distractors
        self.rng = np.random.RandomState(seed)
        self.depth = None  # set per frame by the caller

    def generate_masks(self, image: np.ndarray) -> dict:
        from scipy import ndimage

        assert self.depth is not None, "set .depth before detect()"
        fg = self.depth < self.background_mm
        labels, n = ndimage.label(fg)
        masks, boxes = [], []
        H, W = fg.shape
        for i in range(1, n + 1):
            m = labels == i
            if m.sum() < 32:
                continue
            ys, xs = np.nonzero(m)
            masks.append(m)
            boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
        for _ in range(self.n_distractors):
            w = self.rng.randint(W // 8, W // 2)
            h = self.rng.randint(H // 8, H // 2)
            x0 = self.rng.randint(0, W - w)
            y0 = self.rng.randint(0, H - h)
            m = np.zeros((H, W), bool)
            m[y0:y0 + h, x0:x0 + w] = True
            masks.append(m)
            boxes.append([x0, y0, x0 + w - 1, y0 + h - 1])
        return {
            "masks": np.stack(masks) if masks else np.zeros((0, H, W), bool),
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
        }


def viewing_angle_deg(R_est_tem, R_gt):
    """Angle between the template's viewing direction and the GT one."""
    v1 = R_est_tem[2] / np.linalg.norm(R_est_tem[2])
    v2 = R_gt[2] / np.linalg.norm(R_gt[2])
    return float(np.degrees(np.arccos(np.clip(v1 @ v2, -1, 1))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--desc_ckpt", default="/root/repo/.ckpt_ism_desc")
    p.add_argument("--pem_ckpt", default="")
    p.add_argument("--bank_objects", type=int, default=4)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--out", default="/tmp/ism_acc")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.config import ISMConfig, replace
    from sam6d_tpu.models.ism.detector import ISMDetector
    from sam6d_tpu.models.ism.dinov2 import DescriptorModel
    from sam6d_tpu.train.checkpoint import restore_params
    from sam6d_tpu.utils.template_poses import get_camera_poses
    from tools.e2e_synthetic_ar import build_dataset
    from tools.train_ism_descriptor import (
        render_object_views,
        tiny_descriptor_config,
    )
    from sam6d_tpu.provider.training_dataset import make_procedural_mesh

    dcfg = tiny_descriptor_config()
    model = DescriptorModel(dcfg)
    variables = model.init(jax.random.PRNGKey(0))
    variables = restore_params(args.desc_ckpt, variables)

    # --- scene dataset: ONE held-out object (id 1 in the bank),
    # plus distractor objects onboarded alongside it.  Seed 424242
    # matches tools/e2e_synthetic_ar.build_dataset, whose object was
    # never in the descriptor's training pool (different seed space).
    cad, tdir, scene, gt_dets = build_dataset(args.out,
                                              frames=args.frames)
    scene_cam = json.load(
        open(os.path.join(scene, "scene_camera.json"))
    )["0"]
    json.dump(scene_cam, open(os.path.join(args.out, "camera.json"), "w"))

    # --- template bank: the target object's rendered 42 views (from
    # build_dataset's renderer) + distractor procedural objects.
    from sam6d_tpu.models.ism.onboarding import load_template_crops
    from sam6d_tpu.utils.mesh import load_mesh

    target_imgs, target_masks = load_template_crops(
        tdir, n_views=42, crop_size=dcfg.image_size
    )
    rngd = np.random.RandomState(777)
    bank_imgs, bank_masks, pointclouds = [target_imgs], [target_masks], []
    mesh = load_mesh(cad)
    pc = mesh.vertices[
        np.random.RandomState(0).choice(len(mesh.vertices), 1024,
                                        replace=True)
    ] / 1000.0
    pointclouds.append(pc)
    for _ in range(args.bank_objects - 1):
        dmesh = make_procedural_mesh(rngd)
        imgs, msks = render_object_views(
            dmesh, 42, dcfg.image_size, rngd, jitter=False
        )
        # pad/trim to 42 views
        while len(imgs) < 42:
            imgs = np.concatenate([imgs, imgs[: 42 - len(imgs)]])
            msks = np.concatenate([msks, msks[: 42 - len(msks)]])
        bank_imgs.append(imgs[:42])
        bank_masks.append(msks[:42])
        dpc = dmesh.vertices[
            np.random.RandomState(1).choice(len(dmesh.vertices), 1024,
                                            replace=True)
        ] / 1000.0
        pointclouds.append(dpc)

    # Template OBJECT poses (reference level-0 library): cam poses ->
    # object-in-camera rotations for best-template geometry.
    cam_poses = get_camera_poses(0, radius=1.0)[:42]
    tem_poses = np.zeros((42, 4, 4), np.float32)
    for i, cp in enumerate(cam_poses):
        tem_poses[i, :3, :3] = cp[:3, :3].T
        tem_poses[i, 3, 3] = 1.0

    icfg = ISMConfig()
    icfg = replace(icfg, descriptor=dcfg, compute_dtype="float32")
    seg = DepthCCSegmentor()
    det = ISMDetector(icfg, seg, model, variables)
    det.onboard_templates(
        np.stack(bank_imgs), np.stack(bank_masks), tem_poses,
        pointcloud=np.stack(pointclouds),
    )

    # --- per-frame detection (no GT masks anywhere).
    from PIL import Image

    from sam6d_tpu.utils.rle import mask_to_rle

    gt = json.load(open(os.path.join(scene, "scene_gt.json")))
    K = np.asarray(scene_cam["cam_K"], np.float32).reshape(3, 3)
    n_frames = 0
    n_obj_correct = 0
    view_errs = []
    det_json = []
    for sid in sorted(gt, key=int):
        i = int(sid)
        rgb_p = os.path.join(scene, "rgb", f"{i:06d}.png")
        dep_p = os.path.join(scene, "depth", f"{i:06d}.png")
        if not os.path.exists(rgb_p):
            continue
        image = np.asarray(Image.open(rgb_p))[..., :3]
        depth = np.asarray(Image.open(dep_p)).astype(np.float32)
        seg.depth = depth
        dets = det.detect(image, depth=depth * 1e-3, K=K)
        n_frames += 1
        if len(dets) == 0:
            continue
        best = int(np.argmax(dets.scores))
        obj = int(dets.object_ids[best])
        if obj == 0:  # bank index 0 == the target object
            n_obj_correct += 1
            R_gt = np.asarray(
                gt[sid][0]["cam_R_m2c"], np.float32
            ).reshape(3, 3)
            ti = int(dets.extras["best_template"][best])
            view_errs.append(
                viewing_angle_deg(tem_poses[ti, :3, :3], R_gt)
            )
            rle = mask_to_rle(dets.masks[best])
            det_json.append({
                "scene_id": 0, "image_id": i, "category_id": 1,
                "score": float(dets.scores[best]),
                "segmentation": {
                    "size": list(rle["size"]),
                    "counts": list(map(int, rle["counts"])),
                },
            })

    obj_acc = n_obj_correct / max(n_frames, 1)
    med_view = float(np.median(view_errs)) if view_errs else float("nan")
    print(f"[ism] frames {n_frames}, object-selection acc {obj_acc:.3f}, "
          f"median template-view error {med_view:.1f} deg "
          f"(random would be ~90)", flush=True)

    rec = {
        "frames": n_frames,
        "object_selection_acc": obj_acc,
        "median_template_view_err_deg": med_view,
        "bank_objects": args.bank_objects,
    }

    # --- e2e: ISM detections -> PEM -> BOP AR (no GT masks).
    if args.pem_ckpt:
        from sam6d_tpu.config import OptimConfig
        from sam6d_tpu.train.checkpoint import restore_train_state
        from sam6d_tpu.train.state import create_train_state
        from tools.e2e_synthetic_ar import run_eval, smoke_pem_config

        pcfg = smoke_pem_config()
        dummy = {
            "pts": np.zeros((2, 128, 3), np.float32),
            "rgb": np.zeros((2, 32, 32, 3), np.float32),
            "rgb_choose": np.zeros((2, 128), np.int32),
            "model_pts": np.zeros((2, 128, 3), np.float32),
            "dense_po": np.zeros((2, 128, 3), np.float32),
            "dense_fo": np.zeros((2, 128, 32), np.float32),
        }
        state = create_train_state(
            jax.random.PRNGKey(0), pcfg, OptimConfig(), dummy
        )
        state = restore_train_state(args.pem_ckpt, state)
        out = run_eval(
            {"params": state.params, "batch_stats": state.batch_stats},
            pcfg, cad, tdir, scene, det_json, args.out, "ism->pem",
        )
        rec["e2e_ar_no_gt_masks"] = out["ar"]
        rec["e2e_detail"] = out

    with open("BENCH_ISM_ACC.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
