"""BOP provider + multi-host-style eval sweep on a synthetic mini dataset."""

import json
import os

import numpy as np
import pytest
import jax
from PIL import Image

from sam6d_tpu.pipeline.bop_eval import run_bop_eval, shard_frames
from sam6d_tpu.provider.bop import BOPTestset, list_frames, load_objects
from sam6d_tpu.utils.detections import Detections, save_json_bop23

from tests.test_pem_model import tiny_pem_config
from tests.test_pipeline import make_cube_ply


@pytest.fixture(scope="module")
def mini_bop(tmp_path_factory):
    """One-scene, one-frame BOP dataset with a cube object + templates."""
    from sam6d_tpu.pipeline.renderer import render_templates

    root = tmp_path_factory.mktemp("bop")
    ds = root / "lmo"
    models = ds / "models"
    scene = ds / "test" / "000001"
    (models).mkdir(parents=True)
    (scene / "rgb").mkdir(parents=True)
    (scene / "depth").mkdir(parents=True)

    cad = str(models / "obj_000001.ply")
    make_cube_ply(cad, size=60.0)
    with open(models / "models_info.json", "w") as f:
        json.dump({"1": {"diameter": 103.9}}, f)

    # Frame: depth blob at 0.5m.
    H, W = 60, 80
    rng = np.random.RandomState(0)
    rgb = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    depth = np.zeros((H, W), np.uint16)
    depth[20:50, 30:70] = 500
    Image.fromarray(rgb).save(scene / "rgb" / "000000.png")
    Image.fromarray(depth).save(scene / "depth" / "000000.png")
    K = [80.0, 0, 40, 0, 80.0, 30, 0, 0, 1]
    with open(scene / "scene_camera.json", "w") as f:
        json.dump({"0": {"cam_K": K, "depth_scale": 1.0}}, f)

    # Templates for obj 1.
    tdir = root / "templates" / "obj_000001"
    tdir.mkdir(parents=True)
    rendered = render_templates(cad, str(tdir), image_size=96, level=0)

    # ISM detections json.
    mask = np.zeros((H, W), bool)
    mask[25:45, 35:65] = True
    dets = Detections(
        masks=mask[None],
        boxes=np.array([[35, 25, 65, 45]], np.float32),
        scores=np.array([0.9], np.float32),
        object_ids=np.array([0]),
    )
    det_path = str(root / "detection_ism.json")
    rows = dets.to_bop23(scene_id=1, image_id=0)
    save_json_bop23(det_path, rows)
    # Move templates to the location load_objects expects
    # (template_root/obj_000001 contains the rendered templates dir).
    os.rename(rendered, str(tdir / "templates_tmp"))
    for f_ in os.listdir(str(tdir / "templates_tmp")):
        os.rename(str(tdir / "templates_tmp" / f_), str(tdir / f_))
    return {
        "dataset_dir": str(ds),
        "det_path": det_path,
        "template_root": str(root / "templates"),
        "out_dir": str(root / "out"),
    }


class TestBOPProvider:
    def test_load_objects(self, mini_bop):
        objs = load_objects(
            os.path.join(mini_bop["dataset_dir"], "models"), n_sample=32,
            template_root=mini_bop["template_root"],
        )
        assert 1 in objs
        assert abs(objs[1].diameter - 0.1039) < 1e-4
        assert objs[1].model_points.shape == (32, 3)
        assert os.path.isdir(objs[1].template_dir)

    def test_frames_listing(self, mini_bop):
        frames = list_frames(
            os.path.join(mini_bop["dataset_dir"], "test", "000001")
        )
        assert frames == [0]

    def test_testset_instances(self, mini_bop):
        cfg = tiny_pem_config()
        objs = load_objects(
            os.path.join(mini_bop["dataset_dir"], "models"),
            n_sample=cfg.n_sample_model_point,
        )
        ts = BOPTestset(cfg, mini_bop["dataset_dir"], objs).load_detections(
            mini_bop["det_path"]
        )
        assert ts.frames() == [(1, 0)]
        batch, (rgb, depth, K) = ts.get_frame_instances(1, 0)
        assert batch is not None
        assert batch["pts"].shape == (1, cfg.n_sample_observed_point, 3)
        # All observed points at ~0.5m depth.
        np.testing.assert_allclose(batch["pts"][0, :, 2], 0.5, atol=0.01)

    def test_shard_frames(self):
        frames = list(range(10))
        shards = [shard_frames(frames, i, 3) for i in range(3)]
        assert sorted(sum(shards, [])) == frames
        assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


class TestBOPEval:
    @pytest.mark.slow
    def test_eval_sweep_end_to_end(self, mini_bop):
        cfg = tiny_pem_config()
        merged = run_bop_eval(
            cfg,
            mini_bop["dataset_dir"],
            mini_bop["det_path"],
            mini_bop["template_root"],
            mini_bop["out_dir"],
        )
        assert len(merged) == 1
        row = merged[0]
        assert row["scene_id"] == 1 and row["obj_id"] == 1
        R = np.array(row["R"]).reshape(3, 3)
        assert abs(np.linalg.det(R) - 1) < 1e-2
        assert os.path.exists(
            os.path.join(mini_bop["out_dir"], "result_bop.csv")
        )
        csv = open(
            os.path.join(mini_bop["out_dir"], "result_bop.csv")
        ).read()
        assert csv.startswith("scene_id,im_id,obj_id")
