"""End-to-end BOP AR on synthetic scenes: trained PEM vs random weights.

Closes the full accuracy loop through the REAL file pipeline and the
north-star metric: procedural NOCS-colored object -> BOP-layout dataset
(models/ + test scenes with depth + scene_gt) + rendered template bank
-> PEMRunner.run_file_pipeline per frame (GT-mask detections, as if ISM
were perfect) -> pipeline/bop_score BOP19 AR.

The checkpoint comes from tools/smoke_train_eval.py --ckpt_dir (same
small PEM config).  A random-weights pass is scored for contrast.

Usage:
  python tools/smoke_train_eval.py --steps 2000 --objects 128 \
      --ckpt_dir /tmp/smoke_ckpt
  python tools/e2e_synthetic_ar.py --ckpt_dir /tmp/smoke_ckpt \
      [--frames 12] [--out /tmp/e2e_ar]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_dataset(out_root: str, seed: int = 424242, frames: int = 12,
                  template_size: int = 96, obj_id: int = 1,
                  scene_id: int = 0, template_root: str | None = None):
    """Synthetic single-object BOP-layout dataset + rendered templates.

    obj_id/scene_id parameterization lets build_multi_dataset assemble a
    SHARED dataset root with one scene per held-out object (bop_score
    resolves scene_id -> test/<scene_id:06d> natively); models_info.json
    entries are merged across calls."""
    import jax  # noqa: F401  (forces platform config first)

    from PIL import Image

    from sam6d_tpu.pipeline.make_example import write_ply
    from sam6d_tpu.pipeline.renderer import render_templates
    from sam6d_tpu.provider.training_dataset import (
        _render_view,
        make_procedural_mesh,
        random_rotation,
    )
    from sam6d_tpu.utils.rle import mask_to_rle

    rng = np.random.RandomState(seed)
    mesh = make_procedural_mesh(rng, radius_mm=50.0)

    models = os.path.join(out_root, "models")
    scene = os.path.join(out_root, "test", f"{scene_id:06d}")
    os.makedirs(models, exist_ok=True)
    os.makedirs(os.path.join(scene, "depth"), exist_ok=True)
    os.makedirs(os.path.join(scene, "rgb"), exist_ok=True)

    cad = os.path.join(models, f"obj_{obj_id:06d}.ply")
    write_ply(mesh, cad)
    diameter = 2.0 * float(np.linalg.norm(mesh.vertices, axis=1).max())
    info_path = os.path.join(models, "models_info.json")
    info = json.load(open(info_path)) if os.path.exists(info_path) else {}
    info[str(obj_id)] = {"diameter": diameter}
    json.dump(info, open(info_path, "w"))

    # Template bank (level-0 icosphere, same rasterizer as training).
    # Each object gets its own templates dir under template_root.
    troot = template_root or out_root
    os.makedirs(troot, exist_ok=True)
    tdir = render_templates(cad, troot, image_size=template_size)

    S = 160
    f = 4.0 * S
    K = np.array([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)
    gt, cam, dets = {}, {}, []
    for i in range(frames):
        R = random_rotation(rng)
        z = rng.uniform(400.0, 600.0)
        lat = z / f
        t = np.array([rng.uniform(-20, 20) * lat,
                      rng.uniform(-20, 20) * lat, z], np.float32)
        rgb, mask, _, depth_mm = _render_view(mesh, R, t, K, (S, S))
        if mask.sum() < 64:
            continue
        Image.fromarray(rgb).save(
            os.path.join(scene, "rgb", f"{i:06d}.png"))
        Image.fromarray(
            np.where(mask, depth_mm, 900.0).astype(np.uint16)
        ).save(os.path.join(scene, "depth", f"{i:06d}.png"))
        gt[str(i)] = [{"obj_id": obj_id,
                       "cam_R_m2c": R.flatten().tolist(),
                       "cam_t_m2c": t.tolist()}]
        cam[str(i)] = {"cam_K": K.flatten().tolist(), "depth_scale": 1.0}
        rle = mask_to_rle(mask)
        dets.append({
            "scene_id": scene_id, "image_id": i, "category_id": obj_id,
            "score": 0.9,
            "segmentation": {"size": list(rle["size"]),
                             "counts": list(map(int, rle["counts"]))},
        })
    json.dump(gt, open(os.path.join(scene, "scene_gt.json"), "w"))
    json.dump(cam, open(os.path.join(scene, "scene_camera.json"), "w"))
    json.dump(
        {k: [{"visib_fract": 1.0}] for k in gt},
        open(os.path.join(scene, "scene_gt_info.json"), "w"),
    )
    return cad, tdir, scene, dets


def build_multi_dataset(out_root: str, n_objects: int = 2,
                        frames: int = 50, seed0: int = 424242,
                        template_size: int = 96):
    """Shared BOP-layout dataset with one scene per held-out object.

    Object 0 reuses seed0 exactly (the round-2/3 held-out object, so
    numbers stay comparable); each further object draws a fresh
    procedural mesh.  Returns a list of per-object dicts."""
    objects = []
    for j in range(n_objects):
        cad, tdir, scene, dets = build_dataset(
            out_root, seed=seed0 + 100001 * j, frames=frames,
            template_size=template_size, obj_id=j + 1, scene_id=j,
            template_root=os.path.join(out_root, f"obj{j + 1}"),
        )
        objects.append({
            "obj_id": j + 1, "scene_id": j, "cad": cad, "tdir": tdir,
            "scene": scene, "dets": dets,
        })
    return objects


def smoke_pem_config():
    from sam6d_tpu.config import (
        CoarseMatchingConfig,
        FineMatchingConfig,
        GeoEmbeddingConfig,
        PEMConfig,
        ViTConfig,
    )

    return PEMConfig(
        coarse_npoint=32,
        fine_npoint=128,
        feature_extraction=ViTConfig(
            embed_dim=48, out_dim=32, img_size=32, patch_size=8
        ),
        geo_embedding=GeoEmbeddingConfig(hidden_dim=64),
        coarse_point_matching=CoarseMatchingConfig(
            input_dim=32, hidden_dim=64, out_dim=64, nproposal1=512,
            nproposal2=64, loss_dis_thres=0.4,
        ),
        fine_point_matching=FineMatchingConfig(
            input_dim=32, hidden_dim=64, out_dim=64, pe_nsample1=8,
            pe_nsample2=16, pe_radius1=0.3, pe_radius2=0.6,
            loss_dis_thres=0.25, dis_thres=0.25,
        ),
        n_template_view=8,
        n_sample_template_point=128,
        n_sample_model_point=128,
        n_sample_observed_point=128,
    )


def run_eval_multi(variables, cfg, objects, out_dir, tag,
                   det_score_thresh: float = 0.2):
    """Multi-object variant of run_eval: ONE runner (onboarding is
    memoized per template dir), frames grouped per object, one merged
    BOP19 scoring pass over every scene."""
    from sam6d_tpu.pipeline.bop_score import score_dataset
    from sam6d_tpu.pipeline.pem_runner import PEMRunner

    runner = PEMRunner(cfg, variables=variables)
    rows = []
    os.makedirs(out_dir, exist_ok=True)
    dataset_dir = None
    for o in objects:
        scene = o["scene"]
        dataset_dir = os.path.dirname(os.path.dirname(scene))
        scene_cam = json.load(
            open(os.path.join(scene, "scene_camera.json"))
        )
        cam_path = os.path.join(out_dir, f"camera_{o['obj_id']}.json")
        json.dump(next(iter(scene_cam.values())), open(cam_path, "w"))
        for det in o["dets"]:
            i = det["image_id"]
            seg_path = os.path.join(
                out_dir, f"det_{o['obj_id']}_{i}.json"
            )
            json.dump([det], open(seg_path, "w"))
            results, _, _ = runner.run_file_pipeline(
                os.path.join(scene, "rgb", f"{i:06d}.png"),
                os.path.join(scene, "depth", f"{i:06d}.png"),
                cam_path, o["cad"], seg_path, o["tdir"],
                det_score_thresh=det_score_thresh,
            )
            for r in results:
                rows.append({
                    "scene_id": o["scene_id"], "im_id": i,
                    "obj_id": o["obj_id"], "score": r["score"],
                    "R": r["R"], "t": r["t"], "time": 0.0,
                })
    out = score_dataset(rows, dataset_dir)
    print(f"[{tag}] AR={out['ar']:.3f} (vsd {out.get('ar_vsd', 0):.3f} "
          f"mssd {out['ar_mssd']:.3f} mspd {out['ar_mspd']:.3f}) "
          f"over {out['n_gt']} GT", flush=True)
    return out


def run_eval(variables, cfg, cad, tdir, scene, dets, out_dir, tag):
    import jax

    from sam6d_tpu.pipeline.bop_score import score_dataset
    from sam6d_tpu.pipeline.pem_runner import PEMRunner

    runner = PEMRunner(cfg, variables=variables)
    rows = []
    os.makedirs(out_dir, exist_ok=True)
    for det in dets:
        i = det["image_id"]
        seg_path = os.path.join(out_dir, f"det_{i}.json")
        json.dump([det], open(seg_path, "w"))
        results, _, _ = runner.run_file_pipeline(
            os.path.join(scene, "rgb", f"{i:06d}.png"),
            os.path.join(scene, "depth", f"{i:06d}.png"),
            os.path.join(out_dir, "camera.json"),
            cad, seg_path, tdir, det_score_thresh=0.2,
        )
        for r in results:
            rows.append({
                "scene_id": 0, "im_id": i, "obj_id": 1,
                "score": r["score"], "R": r["R"], "t": r["t"],
                "time": 0.0,
            })
    dataset_dir = os.path.dirname(os.path.dirname(scene))
    out = score_dataset(rows, dataset_dir)
    print(f"[{tag}] AR={out['ar']:.3f} (vsd {out.get('ar_vsd', 0):.3f} "
          f"mssd {out['ar_mssd']:.3f} mspd {out['ar_mspd']:.3f}) "
          f"over {out['n_gt']} GT", flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--out", default="/tmp/e2e_ar")
    p.add_argument("--cpu", action="store_true", default=True)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sam6d_tpu.config import OptimConfig
    from sam6d_tpu.train.checkpoint import restore_train_state
    from sam6d_tpu.train.state import create_train_state

    cfg = smoke_pem_config()
    cad, tdir, scene, dets = build_dataset(args.out, frames=args.frames)

    # Scene camera for the runner (same K for every frame).
    scene_cam = json.load(
        open(os.path.join(scene, "scene_camera.json"))
    )["0"]
    json.dump(scene_cam, open(os.path.join(args.out, "camera.json"), "w"))

    # Random-weights contrast.
    rng = np.random.RandomState(0)
    dummy = {
        "pts": np.zeros((2, 128, 3), np.float32),
        "rgb": np.zeros((2, 32, 32, 3), np.float32),
        "rgb_choose": np.zeros((2, 128), np.int32),
        "model_pts": np.zeros((2, 128, 3), np.float32),
        "dense_po": np.zeros((2, 128, 3), np.float32),
        "dense_fo": np.zeros((2, 128, 32), np.float32),
    }
    state = create_train_state(
        jax.random.PRNGKey(0), cfg, OptimConfig(), dummy
    )
    rand_vars = {"params": state.params, "batch_stats": state.batch_stats}
    out_rand = run_eval(rand_vars, cfg, cad, tdir, scene, dets,
                        args.out, "random")

    state = restore_train_state(args.ckpt_dir, state)
    trained_vars = {
        "params": state.params, "batch_stats": state.batch_stats
    }
    out_tr = run_eval(trained_vars, cfg, cad, tdir, scene, dets,
                      args.out, f"trained(step {int(state.step)})")
    print(
        f"AR improvement random -> trained: "
        f"{out_rand['ar']:.3f} -> {out_tr['ar']:.3f}"
    )


if __name__ == "__main__":
    main()
