"""In-repo BOP AR scorer: GT poses must score AR=1.0, perturbations must
degrade monotonically, symmetries must be respected.

Reference protocol: Pose_Estimation_Model/README.md:110-121 (external
bop_toolkit eval_bop19_pose); this repo implements the metric itself
(pipeline/bop_score.py) since bop_toolkit is unavailable here.
"""

import json
import os

import numpy as np
import pytest

from sam6d_tpu.pipeline import bop_score
from sam6d_tpu.pipeline.make_example import make_cube_mesh, write_ply
from sam6d_tpu.pipeline.renderer import rasterize


def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.radians(deg)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * K @ K


@pytest.fixture(scope="module")
def bop_dir(tmp_path_factory):
    """Tiny single-frame BOP-layout dataset with a rendered depth map."""
    root = tmp_path_factory.mktemp("bop") / "synth"
    models = root / "models"
    scene = root / "test" / "000000"
    (scene / "depth").mkdir(parents=True)
    models.mkdir(parents=True)

    mesh = make_cube_mesh(60.0)
    write_ply(mesh, str(models / "obj_000001.ply"))
    diameter = 2.0 * np.linalg.norm(mesh.vertices, axis=1).max()
    json.dump(
        {"1": {"diameter": float(diameter)}},
        open(models / "models_info.json", "w"),
    )

    K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1]])
    R = _rot([1, 0.3, 0.2], 30.0)
    t = np.array([10.0, -5.0, 500.0])

    verts_cam = mesh.vertices @ R.T + t
    _, mask, depth = rasterize(
        verts_cam.astype(np.float32), mesh.faces, K.astype(np.float32),
        (240, 320), np.zeros((len(mesh.vertices), 1), np.float32),
    )
    depth_img = np.where(mask, depth, 900.0).astype(np.uint16)
    from PIL import Image

    Image.fromarray(depth_img).save(scene / "depth" / "000000.png")

    json.dump(
        {"0": [{"obj_id": 1, "cam_R_m2c": R.flatten().tolist(),
                "cam_t_m2c": t.tolist()}]},
        open(scene / "scene_gt.json", "w"),
    )
    json.dump(
        {"0": {"cam_K": K.flatten().tolist(), "depth_scale": 1.0}},
        open(scene / "scene_camera.json", "w"),
    )
    json.dump(
        {"0": [{"visib_fract": 1.0}]},
        open(scene / "scene_gt_info.json", "w"),
    )
    return str(root), R, t


def _rows(R, t, score=0.9):
    return [
        {
            "scene_id": 0,
            "im_id": 0,
            "obj_id": 1,
            "score": score,
            "R": R.flatten().tolist(),
            "t": list(map(float, t)),
            "time": 0.1,
        }
    ]


class TestErrors:
    def test_mssd_zero_at_gt(self):
        pts = np.random.RandomState(0).randn(50, 3) * 30
        syms = np.eye(4)[None]
        R = _rot([0, 0, 1], 40.0)
        t = np.array([1.0, 2.0, 500.0])
        assert bop_score.mssd(R, t, R, t, pts, syms) < 1e-9

    def test_mssd_translation_equals_offset(self):
        pts = np.random.RandomState(0).randn(50, 3) * 30
        syms = np.eye(4)[None]
        R = np.eye(3)
        t = np.array([0.0, 0.0, 500.0])
        t2 = t + np.array([3.0, 4.0, 0.0])
        assert abs(bop_score.mssd(R, t2, R, t, pts, syms) - 5.0) < 1e-9

    def test_continuous_symmetry_forgives_axis_rotation(self):
        """A z-symmetric object rotated about z must score ~0 MSSD."""
        rng = np.random.RandomState(1)
        theta = rng.rand(64) * 2 * np.pi
        pts = np.stack(
            [np.cos(theta) * 20, np.sin(theta) * 20, rng.randn(64) * 10],
            axis=1,
        )
        meta = {"symmetries_continuous": [{"axis": [0, 0, 1]}]}
        syms = bop_score.symmetry_transforms(meta, n_continuous=128)
        R_gt = _rot([1, 0, 0], 25.0)
        t = np.array([0.0, 0.0, 400.0])
        R_est = R_gt @ _rot([0, 0, 1], 90.0)  # object-frame z-spin
        e_sym = bop_score.mssd(R_est, t, R_gt, t, pts, syms)
        e_nosym = bop_score.mssd(R_est, t, R_gt, t, pts, np.eye(4)[None])
        assert e_nosym > 10.0
        assert e_sym < 1.5  # discretization residual only

    def test_vsd_zero_at_gt_one_when_far(self, bop_dir):
        root, R, t = bop_dir
        mesh_path = os.path.join(root, "models", "obj_000001.ply")
        from sam6d_tpu.utils.mesh import load_mesh

        mesh = load_mesh(mesh_path)
        K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1]])
        from PIL import Image

        depth = np.asarray(
            Image.open(
                os.path.join(root, "test/000000/depth/000000.png")
            )
        ).astype(np.float64)
        e0 = bop_score.vsd(R, t, R, t, depth, K, mesh, 104.0)
        assert np.all(e0 < 0.05)
        t_far = t + np.array([200.0, 0.0, 0.0])
        e1 = bop_score.vsd(R, t_far, R, t, depth, K, mesh, 104.0)
        assert np.all(e1 > 0.9)


class TestDatasetAR:
    def test_gt_scores_perfect(self, bop_dir):
        root, R, t = bop_dir
        out = bop_score.score_dataset(_rows(R, t), root)
        assert out["n_gt"] == 1
        assert out["ar_mssd"] == 1.0
        assert out["ar_mspd"] == 1.0
        assert out["ar_vsd"] > 0.99
        assert out["ar"] > 0.99

    def test_perturbation_degrades_monotonically(self, bop_dir):
        root, R, t = bop_dir
        ars = []
        for deg in (0.0, 4.0, 15.0, 60.0, 150.0):
            Rp = R @ _rot([0.3, 1, 0.1], deg)
            out = bop_score.score_dataset(_rows(Rp, t), root)
            ars.append(out["ar"])
        assert all(a >= b - 1e-9 for a, b in zip(ars, ars[1:])), ars
        assert ars[0] > 0.99
        assert ars[-1] < 0.2

    def test_missing_estimate_scores_zero(self, bop_dir):
        root, R, t = bop_dir
        out = bop_score.score_dataset([], root)
        assert out["n_gt"] == 1  # unmatched GT still counted (as a miss)
        assert out["ar"] == 0.0

    def test_csv_roundtrip(self, bop_dir, tmp_path):
        root, R, t = bop_dir
        from sam6d_tpu.pipeline.bop_eval import write_bop_csv

        rows = _rows(R, t)
        path = str(tmp_path / "result_bop.csv")
        write_bop_csv(rows, path)
        parsed = bop_score.read_bop_csv(path)
        out = bop_score.score_dataset(parsed, root)
        assert out["ar"] > 0.99


class TestProtocolExact:
    """Hand-computed exact recalls + BOP19 per-threshold matching
    semantics (bop_toolkit pose_matching): matching is rerun at every
    threshold considering only pairs below it, sub-visibility GTs stay
    matchable but unscored."""

    def _write_frame(self, root, gts, infos):
        """Minimal no-depth BOP frame (MSSD/MSPD only)."""
        import pathlib

        root = pathlib.Path(root)
        models = root / "models"
        scene = root / "test" / "000000"
        (scene / "rgb").mkdir(parents=True)
        models.mkdir(parents=True)
        mesh = make_cube_mesh(60.0)
        write_ply(mesh, str(models / "obj_000001.ply"))
        diameter = 2.0 * np.linalg.norm(mesh.vertices, axis=1).max()
        json.dump(
            {"1": {"diameter": float(diameter)}},
            open(models / "models_info.json", "w"),
        )
        K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1]])
        from PIL import Image

        Image.new("RGB", (320, 240)).save(scene / "rgb" / "000000.png")
        json.dump({"0": gts}, open(scene / "scene_gt.json", "w"))
        json.dump(
            {"0": {"cam_K": K.flatten().tolist(), "depth_scale": 1.0}},
            open(scene / "scene_camera.json", "w"),
        )
        json.dump({"0": infos}, open(scene / "scene_gt_info.json", "w"))
        return str(root), diameter

    def test_exact_recall_translation_offset(self, tmp_path):
        """28 mm x-offset on a 103.92 mm-diameter cube at z=500:
        MSSD err = 28 exactly -> passes {0.3..0.5}xd = 5/10 thresholds;
        MSPD err = fx*28/470 = 16.68 px exactly (max shift at the
        nearest cube face), w=320 -> thresholds r/2 -> passes
        r in {35,40,45,50} = 4/10."""
        t = [0.0, 0.0, 500.0]
        root, d = self._write_frame(
            tmp_path,
            gts=[{"obj_id": 1, "cam_R_m2c": list(np.eye(3).flatten()),
                  "cam_t_m2c": t}],
            infos=[{"visib_fract": 1.0}],
        )
        est_t = [28.0, 0.0, 500.0]
        rows = [{"scene_id": 0, "im_id": 0, "obj_id": 1, "score": 1.0,
                 "R": list(np.eye(3).flatten()), "t": est_t, "time": 0.0}]
        out = bop_score.score_dataset(rows, root, use_vsd=False)
        assert out["n_gt"] == 1
        assert out["ar_mssd"] == 0.5
        assert out["ar_mspd"] == 0.4
        assert abs(out["ar"] - 0.45) < 1e-12

    def test_multi_instance_confidence_stealing(self, tmp_path):
        """A high-confidence bad estimate must NOT permanently claim the
        GT that a low-confidence exact estimate would match at small
        thresholds.  est1 (conf .9) is 40 mm off GT1; est2 (conf .5) is
        exact at GT1; GT2 is 100 mm away.  Per-threshold matching gives
        TP=1 at EVERY threshold -> ar_mssd = 10/(10*2) = 0.5 (one-shot
        raw-error matching would give 3/20 = 0.15)."""
        I = list(np.eye(3).flatten())
        root, d = self._write_frame(
            tmp_path,
            gts=[
                {"obj_id": 1, "cam_R_m2c": I, "cam_t_m2c": [0, 0, 500.0]},
                {"obj_id": 1, "cam_R_m2c": I, "cam_t_m2c": [100.0, 0, 500.0]},
            ],
            infos=[{"visib_fract": 1.0}, {"visib_fract": 1.0}],
        )
        rows = [
            {"scene_id": 0, "im_id": 0, "obj_id": 1, "score": 0.9,
             "R": I, "t": [40.0, 0.0, 500.0], "time": 0.0},
            {"scene_id": 0, "im_id": 0, "obj_id": 1, "score": 0.5,
             "R": I, "t": [0.0, 0.0, 500.0], "time": 0.0},
        ]
        out = bop_score.score_dataset(rows, root, use_vsd=False)
        assert out["n_gt"] == 2
        assert out["ar_mssd"] == 0.5

    def test_subvisibility_gt_consumes_estimate(self, tmp_path):
        """A GT below visib_gt_min is matchable (consumes the estimate
        aimed at it, as in bop_toolkit) but excluded from the recall
        denominator: est1 exact at the invisible GT2, est2 exact at the
        visible GT1 -> ar 1.0 over a denominator of 1."""
        I = list(np.eye(3).flatten())
        root, d = self._write_frame(
            tmp_path,
            gts=[
                {"obj_id": 1, "cam_R_m2c": I, "cam_t_m2c": [0, 0, 500.0]},
                {"obj_id": 1, "cam_R_m2c": I, "cam_t_m2c": [100.0, 0, 500.0]},
            ],
            infos=[{"visib_fract": 1.0}, {"visib_fract": 0.02}],
        )
        rows = [
            {"scene_id": 0, "im_id": 0, "obj_id": 1, "score": 0.9,
             "R": I, "t": [100.0, 0.0, 500.0], "time": 0.0},
            {"scene_id": 0, "im_id": 0, "obj_id": 1, "score": 0.5,
             "R": I, "t": [0.0, 0.0, 500.0], "time": 0.0},
        ]
        out = bop_score.score_dataset(rows, root, use_vsd=False)
        assert out["n_gt"] == 1
        assert out["ar_mssd"] == 1.0

    def test_toolkit_symmetry_step_count(self):
        """Default continuous-symmetry discretization follows the
        toolkit's arc-length bound: ceil(pi/0.01) = 315 steps."""
        meta = {"symmetries_continuous": [{"axis": [0, 0, 1]}]}
        syms = bop_score.symmetry_transforms(meta)
        assert len(syms) == 315
