"""Pipeline tests: mesh IO, software renderer, template loading, and the
file-based PEM stage end-to-end on a synthetic scene with a tiny model.
"""

import json
import os

import numpy as np
import pytest
import jax

from sam6d_tpu.utils.mesh import TriMesh, load_mesh
from sam6d_tpu.utils.rle import (
    _decode_compressed_counts,
    _encode_compressed_counts,
    mask_to_rle,
    rle_to_mask,
)


def make_cube_ply(path, size=50.0, ascii_fmt=True):
    """Write a cube PLY (vertices in mm)."""
    s = size / 2
    verts = np.array(
        [
            [-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
            [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s],
        ],
        np.float32,
    )
    faces = [
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
    ]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write("3 " + " ".join(str(i) for i in face) + "\n")
    return verts, faces


class TestMesh:
    def test_load_ascii_ply(self, tmp_path):
        path = str(tmp_path / "cube.ply")
        verts, faces = make_cube_ply(path)
        mesh = load_mesh(path)
        np.testing.assert_allclose(mesh.vertices, verts)
        assert len(mesh.faces) == 12
        assert abs(mesh.radius - np.linalg.norm([25, 25, 25])) < 1e-4

    def test_surface_sampling(self, tmp_path):
        path = str(tmp_path / "cube.ply")
        make_cube_ply(path, size=2.0)
        mesh = load_mesh(path)
        pts = mesh.sample(500, seed=0)
        assert pts.shape == (500, 3)
        # All samples on the cube surface: max-coordinate == 1.
        maxc = np.abs(pts).max(axis=1)
        np.testing.assert_allclose(maxc, 1.0, atol=1e-5)

    def test_binary_ply_roundtrip(self, tmp_path):
        # Write a small binary_little_endian PLY by hand.
        import struct

        path = str(tmp_path / "tri.ply")
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        with open(path, "wb") as f:
            f.write(header.encode())
            for v in verts:
                f.write(struct.pack("<fff", *v))
            f.write(struct.pack("<Biii", 3, 0, 1, 2))
        mesh = load_mesh(path)
        np.testing.assert_allclose(mesh.vertices, verts)
        np.testing.assert_array_equal(mesh.faces, [[0, 1, 2]])


class TestCompressedRLE:
    def test_counts_roundtrip(self, rng):
        counts = [0, 5, 3, 100, 7, 2000, 1]
        enc = _encode_compressed_counts(list(counts))
        dec = _decode_compressed_counts(enc)
        assert dec == counts

    def test_mask_via_compressed_counts(self, rng):
        mask = rng.rand(17, 23) > 0.5
        rle = mask_to_rle(mask)
        compressed = {
            "size": rle["size"],
            "counts": _encode_compressed_counts(list(rle["counts"])),
        }
        np.testing.assert_array_equal(rle_to_mask(compressed), mask)


@pytest.fixture(scope="module")
def rendered_templates(tmp_path_factory):
    from sam6d_tpu.pipeline.renderer import render_templates

    tmp = tmp_path_factory.mktemp("render")
    cad = str(tmp / "cube.ply")
    make_cube_ply(cad, size=60.0)
    out = render_templates(cad, str(tmp), image_size=96, level=0)
    return cad, str(tmp), out


class TestRenderer:
    def test_contract_files_exist(self, rendered_templates):
        _, _, out = rendered_templates
        for i in (0, 21, 41):
            assert os.path.exists(os.path.join(out, f"rgb_{i}.png"))
            assert os.path.exists(os.path.join(out, f"mask_{i}.png"))
            assert os.path.exists(os.path.join(out, f"xyz_{i}.npy"))

    def test_mask_nonempty_and_xyz_on_object(self, rendered_templates):
        from PIL import Image

        _, _, out = rendered_templates
        mask = np.asarray(Image.open(os.path.join(out, "mask_0.png"))) == 255
        assert mask.sum() > 50  # object visible
        xyz = np.load(os.path.join(out, "xyz_0.npy")).astype(np.float32)
        on_obj = xyz[mask]
        # Cube surface points: max |coord| == 30 mm.
        maxc = np.abs(on_obj).max(axis=1)
        np.testing.assert_allclose(maxc, 30.0, atol=2.0)

    def test_template_loader(self, rendered_templates):
        from sam6d_tpu.pipeline.pem_data import load_template
        from tests.test_pem_model import tiny_pem_config

        _, _, out = rendered_templates
        cfg = tiny_pem_config()
        rng = np.random.RandomState(0)
        rgb, choose, xyz = load_template(out, cfg, 0, rng)
        S = cfg.feature_extraction.img_size
        assert rgb.shape == (S, S, 3)
        assert choose.shape == (cfg.n_sample_template_point,)
        assert (choose < S * S).all()
        assert xyz.shape == (cfg.n_sample_template_point, 3)
        # Meters now.
        assert np.abs(xyz).max() < 0.05


class TestPEMFilePipeline:
    def test_end_to_end_synthetic_scene(self, rendered_templates, tmp_path):
        from PIL import Image

        from sam6d_tpu.pipeline.pem_runner import PEMRunner
        from sam6d_tpu.utils.detections import Detections, save_json_bop23
        from tests.test_pem_model import tiny_pem_config

        cad, tdir, templates = rendered_templates

        # Synthetic frame: a fronto-parallel depth plane blob.
        H, W = 60, 80
        rgb = (np.random.RandomState(0).rand(H, W, 3) * 255).astype(np.uint8)
        depth_mm = np.zeros((H, W), np.uint16)
        depth_mm[20:50, 30:70] = 500
        mask = np.zeros((H, W), bool)
        mask[25:45, 35:65] = True
        K = np.array([[80.0, 0, 40], [0, 80.0, 30], [0, 0, 1]])

        rgb_path = str(tmp_path / "rgb.png")
        depth_path = str(tmp_path / "depth.png")
        cam_path = str(tmp_path / "camera.json")
        seg_path = str(tmp_path / "detection_ism.json")
        Image.fromarray(rgb).save(rgb_path)
        Image.fromarray(depth_mm).save(depth_path)
        with open(cam_path, "w") as f:
            json.dump(
                {"cam_K": K.flatten().tolist(), "depth_scale": 1.0}, f
            )
        dets = Detections(
            masks=mask[None],
            boxes=np.array([[35, 25, 65, 45]], np.float32),
            scores=np.array([0.9], np.float32),
            object_ids=np.array([0]),
        )
        save_json_bop23(seg_path, dets.to_bop23(0, 0))

        cfg = tiny_pem_config()
        runner = PEMRunner(cfg)
        runner.init_random()
        results, img, model_points = runner.run_file_pipeline(
            rgb_path, depth_path, cam_path, cad, seg_path, templates,
            det_score_thresh=0.5,
        )
        assert len(results) == 1
        R = np.array(results[0]["R"]).reshape(3, 3)
        assert abs(np.linalg.det(R) - 1.0) < 1e-2
        t_m = np.array(results[0]["t"]) / 1000.0
        assert np.isfinite(t_m).all()
        assert 0.0 <= results[0]["score"] <= 1.0


class TestPEMRunnerMaxBucket:
    def test_chunked_matches_per_chunk_calls(self, rng):
        """max_bucket=2 serving (the production B-cap policy, BASELINE.md
        round 5) must equal running each 2-instance chunk through an
        uncapped runner: same bucket shapes, same key, same pad rule."""
        import jax.numpy as jnp

        from sam6d_tpu.pipeline.pem_runner import PEMRunner
        from tests.test_pem_model import tiny_pem_config

        cfg = tiny_pem_config()
        runner = PEMRunner(cfg)
        variables = runner.init_random()
        runner_cap = PEMRunner(cfg, variables=variables, max_bucket=2)

        N = cfg.fine_npoint
        S = cfg.feature_extraction.img_size
        tem_pts = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.02)
        tem_feat = jnp.asarray(
            rng.randn(1, N, cfg.feature_extraction.out_dim).astype(
                np.float32
            )
        )
        for r in (runner, runner_cap):
            r.template_bank = r._make_bank(variables, tem_pts, tem_feat)

        n_inst = 5  # 2 full chunks + a padded singleton tail
        input_data = {
            "pts": rng.randn(n_inst, N, 3).astype(np.float32) * 0.02,
            "rgb": rng.rand(n_inst, S, S, 3).astype(np.float32),
            "rgb_choose": rng.randint(
                0, S * S, (n_inst, N)
            ).astype(np.int32),
            "model_pts": rng.randn(
                n_inst, cfg.n_sample_model_point, 3
            ).astype(np.float32) * 0.02,
            "score": np.ones(n_inst, np.float32),
        }
        out_cap = runner_cap.infer(dict(input_data))

        def sub(lo, hi):
            return {k: v[lo:hi] for k, v in input_data.items()}

        # The padded tail chunk [4:5] runs as a bucket-2 call whose pad
        # row repeats the chunk's first row — reproduce exactly.
        tail = {
            k: np.stack([v[4], v[4]]) for k, v in input_data.items()
        }
        refs = [runner.infer(sub(0, 2)), runner.infer(sub(2, 4)),
                runner.infer(tail)]
        lens = (2, 2, 1)
        for name in ("pred_R", "pred_t", "pose_score"):
            ref = np.concatenate(
                [np.asarray(r[name])[:m] for r, m in zip(refs, lens)]
            )
            np.testing.assert_allclose(
                np.asarray(out_cap[name]), ref, atol=1e-5,
                err_msg=name,
            )


class TestPEMRunnerDataParallel:
    @pytest.mark.slow
    def test_dp_mesh_matches_single_device(self, rng):
        """Serving with the instance batch sharded over a dp mesh must
        produce the same poses as the unsharded runner."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from sam6d_tpu.pipeline.pem_runner import PEMRunner
        from tests.test_pem_model import tiny_pem_config

        cfg = tiny_pem_config()
        runner = PEMRunner(cfg)
        variables = runner.init_random()
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("dp", "tp"))
        runner_dp = PEMRunner(cfg, variables=variables, mesh=mesh)

        N = cfg.fine_npoint
        S = cfg.feature_extraction.img_size
        tem_pts = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.02)
        tem_feat = jnp.asarray(
            rng.randn(1, N, cfg.feature_extraction.out_dim).astype(np.float32)
        )
        for r in (runner, runner_dp):
            r.template_bank = r._make_bank(variables, tem_pts, tem_feat)

        n_inst = 3  # pads to the dp-size bucket (4)
        input_data = {
            "pts": rng.randn(n_inst, N, 3).astype(np.float32) * 0.02,
            "rgb": rng.rand(n_inst, S, S, 3).astype(np.float32),
            "rgb_choose": rng.randint(0, S * S, (n_inst, N)).astype(np.int32),
            "model_pts": rng.randn(
                n_inst, cfg.n_sample_model_point, 3
            ).astype(np.float32) * 0.02,
            "score": np.ones(n_inst, np.float32),
        }
        out_ref = runner.infer(dict(input_data))
        out_dp = runner_dp.infer(dict(input_data))
        np.testing.assert_allclose(
            out_dp["pred_R"], out_ref["pred_R"], atol=5e-3
        )
        np.testing.assert_allclose(
            out_dp["pred_t"], out_ref["pred_t"], atol=5e-3
        )


class TestParamsPlumbing:
    """Weights plumbing (VERDICT r1 item 2): save_params -> load_params
    must reproduce identical poses; tolerant restore must survive partial
    checkpoints; and the file pipeline must be seed-deterministic (the
    golden regression that locks behavior for real checkpoints)."""

    @pytest.mark.slow

    def test_save_load_params_identical_poses(self, rendered_templates,
                                              tmp_path, rng):
        from sam6d_tpu.pipeline.pem_runner import PEMRunner
        from sam6d_tpu.train.checkpoint import save_params
        from tests.test_pem_model import tiny_pem_config

        cfg = tiny_pem_config()
        runner = PEMRunner(cfg)
        variables = runner.init_random()
        pdir = str(tmp_path / "params")
        save_params(pdir, variables)

        runner2 = PEMRunner(cfg)
        runner2.load_params(pdir)

        import jax.numpy as jnp

        N = cfg.fine_npoint
        S = cfg.feature_extraction.img_size
        tem_pts = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.02)
        tem_feat = jnp.asarray(
            rng.randn(1, N, cfg.feature_extraction.out_dim).astype(
                np.float32
            )
        )
        inp = {
            "pts": rng.randn(2, N, 3).astype(np.float32) * 0.02,
            "rgb": rng.rand(2, S, S, 3).astype(np.float32),
            "rgb_choose": rng.randint(0, S * S, (2, N)).astype(np.int32),
            "model_pts": rng.randn(
                2, cfg.n_sample_model_point, 3
            ).astype(np.float32) * 0.02,
            "score": np.ones(2, np.float32),
        }
        for r in (runner, runner2):
            r.template_bank = r._make_bank(r.variables, tem_pts, tem_feat)
        out1 = runner.infer(dict(inp))
        out2 = runner2.infer(dict(inp))
        np.testing.assert_array_equal(out1["pred_R"], out2["pred_R"])
        np.testing.assert_array_equal(out1["pred_t"], out2["pred_t"])

    def test_tolerant_restore_partial_checkpoint(self, tmp_path):
        from sam6d_tpu.train.checkpoint import (
            restore_params_tolerant,
            save_params,
        )

        full = {
            "params": {
                "a": np.ones((2, 3), np.float32),
                "b": {"w": np.full((4,), 2.0, np.float32)},
            }
        }
        partial = {"params": {"a": np.full((2, 3), 7.0, np.float32)}}
        pdir = str(tmp_path / "partial")
        save_params(pdir, partial)

        merged, misses = restore_params_tolerant(pdir, full, verbose=False)
        np.testing.assert_array_equal(
            merged["params"]["a"], np.full((2, 3), 7.0)
        )
        np.testing.assert_array_equal(
            merged["params"]["b"]["w"], np.full((4,), 2.0)
        )
        assert any("b" in m for m in misses)

    @pytest.mark.slow

    def test_file_pipeline_deterministic(self, rendered_templates,
                                         tmp_path):
        """Same seeds -> bitwise-identical poses across two fresh runner
        instances (locks seed threading through the whole file
        pipeline)."""
        from PIL import Image

        from sam6d_tpu.pipeline.pem_runner import PEMRunner
        from sam6d_tpu.train.checkpoint import save_params
        from sam6d_tpu.utils.detections import Detections, save_json_bop23
        from tests.test_pem_model import tiny_pem_config

        cad, tdir, templates = rendered_templates
        H, W = 60, 80
        rng0 = np.random.RandomState(0)
        rgb = (rng0.rand(H, W, 3) * 255).astype(np.uint8)
        depth_mm = np.zeros((H, W), np.uint16)
        depth_mm[20:50, 30:70] = 500
        mask = np.zeros((H, W), bool)
        mask[25:45, 35:65] = True
        K = np.array([[80.0, 0, 40], [0, 80.0, 30], [0, 0, 1]])
        rgb_path = str(tmp_path / "rgb.png")
        depth_path = str(tmp_path / "depth.png")
        cam_path = str(tmp_path / "camera.json")
        seg_path = str(tmp_path / "detection_ism.json")
        Image.fromarray(rgb).save(rgb_path)
        Image.fromarray(depth_mm).save(depth_path)
        with open(cam_path, "w") as f:
            json.dump({"cam_K": K.flatten().tolist(), "depth_scale": 1.0}, f)
        dets = Detections(
            masks=mask[None],
            boxes=np.array([[35, 25, 65, 45]], np.float32),
            scores=np.array([0.9], np.float32),
            object_ids=np.array([0]),
        )
        save_json_bop23(seg_path, dets.to_bop23(0, 0))

        cfg = tiny_pem_config()
        pdir = str(tmp_path / "params")
        r0 = PEMRunner(cfg)
        save_params(pdir, r0.init_random())

        outs = []
        for _ in range(2):
            r = PEMRunner(cfg)
            r.load_params(pdir)
            results, _, _ = r.run_file_pipeline(
                rgb_path, depth_path, cam_path, cad, seg_path, templates,
                det_score_thresh=0.5,
            )
            outs.append(results)
        assert len(outs[0]) == len(outs[1]) == 1
        np.testing.assert_array_equal(outs[0][0]["R"], outs[1][0]["R"])
        np.testing.assert_array_equal(outs[0][0]["t"], outs[1][0]["t"])
        assert outs[0][0]["score"] == outs[1][0]["score"]
