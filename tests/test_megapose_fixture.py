"""MegaPoseDataset parsed against a byte-exact synthetic web-shard
fixture in the reference's on-disk format (round-1 VERDICT item 7: the
reader had never seen a real shard).

Format per reference Pose_Estimation_Model/provider/training_dataset.py
:32-130 and utils/data_utils.py io_load_gt/io_load_masks:
  <root>/MegaPose-GSO/train_pbr_web/key_to_shard.json     {key: shard}
  <root>/MegaPose-GSO/train_pbr_web/gso_models.json       [{obj_id, gso_id}]
  .../shard-000000/<key>.{rgb.jpg,depth.png,camera.json,gt.json,
                          gt_info.json,mask_visib.json}
  <root>/MegaPose-GSO/templates/<gso_id>/{rgb,mask,xyz}_{0,1}.*
  gt/gt_info are LISTS (one dict per instance); mask_visib is a DICT
  keyed by instance index with COLUMN-MAJOR uncompressed RLE starting
  with the zero run; template xyz stores 10x-meters (* 0.1 on load,
  reference :294).
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from sam6d_tpu.config import TrainConfig
from sam6d_tpu.pipeline.renderer import rasterize
from sam6d_tpu.provider.training_dataset import (
    MegaPoseDataset,
    make_procedural_mesh,
)
from sam6d_tpu.utils.rle import mask_to_rle


def _render(mesh, R, t_mm, K, hw):
    from sam6d_tpu.pipeline.renderer import compute_vertex_normals

    verts_cam = mesh.vertices @ R.T + t_mm
    normals_cam = compute_vertex_normals(mesh) @ R.T
    shade = np.clip(-normals_cam[:, 2], 0.2, 1.0)[:, None]
    colors = mesh.vertex_colors.astype(np.float32) / 255.0
    attrs = np.concatenate([colors * shade, mesh.vertices], axis=1)
    attr_img, mask, depth = rasterize(verts_cam, mesh.faces, K, hw, attrs)
    rgb = (np.clip(attr_img[..., :3], 0, 1) * 255).astype(np.uint8)
    return rgb, mask, attr_img[..., 3:6], depth


@pytest.fixture(scope="module")
def megapose_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("megapose")
    web = root / "MegaPose-GSO" / "train_pbr_web"
    shard = web / "shard-000000"
    tdir = root / "MegaPose-GSO" / "templates" / "fixture_obj"
    shard.mkdir(parents=True)
    tdir.mkdir(parents=True)

    rng = np.random.RandomState(5)
    mesh = make_procedural_mesh(rng, radius_mm=50.0)

    # Scene frame.
    H, W = 120, 160
    K = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]],
                 np.float32)
    from sam6d_tpu.provider.training_dataset import random_rotation

    R = random_rotation(rng)
    t_mm = np.array([5.0, -8.0, 450.0], np.float32)
    rgb, mask, _, depth_mm = _render(mesh, R, t_mm, K, (H, W))

    key = "000000_000123"
    base = str(shard / key)
    Image.fromarray(rgb).save(base + ".rgb.jpg", quality=95)
    Image.fromarray(
        np.where(mask, depth_mm, 0).astype(np.uint16)
    ).save(base + ".depth.png")
    json.dump(
        {"cam_K": K.flatten().tolist(), "depth_scale": 1.0},
        open(base + ".camera.json", "w"),
    )
    json.dump(
        [{"obj_id": 0, "cam_R_m2c": R.flatten().tolist(),
          "cam_t_m2c": t_mm.tolist()}],
        open(base + ".gt.json", "w"),
    )
    json.dump(
        [{"px_count_valid": int(mask.sum()), "visib_fract": 1.0}],
        open(base + ".gt_info.json", "w"),
    )
    # Column-major RLE, zero run first (bop webdataset io_load_masks).
    json.dump(
        {"0": {k: (list(v) if not np.isscalar(v) else v)
               for k, v in mask_to_rle(mask).items()}},
        open(base + ".mask_visib.json", "w"),
    )
    json.dump({key: 0}, open(web / "key_to_shard.json", "w"))
    json.dump(
        [{"obj_id": 0, "gso_id": "fixture_obj"}],
        open(web / "gso_models.json", "w"),
    )

    # Templates: 2 canonical views, xyz stored as 10x meters (NOCS-like
    # MegaPose convention: loader multiplies by 0.1).
    Kt = np.array([[96.0, 0, 48.0], [0, 96.0, 48.0], [0, 0, 1]],
                  np.float32)
    for vi, axis in enumerate(((0.0, 0.0), (np.pi / 2, 0.3))):
        cy, sy = np.cos(axis[0]), np.sin(axis[0])
        Rv = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
        Rx = np.array(
            [[1, 0, 0],
             [0, np.cos(axis[1]), -np.sin(axis[1])],
             [0, np.sin(axis[1]), np.cos(axis[1])]], np.float32
        )
        Rv = Rx @ Rv
        tv = np.array([0.0, 0.0, 160.0], np.float32)
        trgb, tmask, txyz_mm, _ = _render(mesh, Rv, tv, Kt, (96, 96))
        Image.fromarray(trgb).save(tdir / f"rgb_{vi}.png")
        Image.fromarray((tmask * 255).astype(np.uint8)).save(
            tdir / f"mask_{vi}.png"
        )
        np.save(tdir / f"xyz_{vi}.npy",
                (txyz_mm / 1000.0 * 10.0).astype(np.float16))
    return str(root)


class TestMegaPoseFixture:
    def test_reads_and_is_geometrically_consistent(self, megapose_root):
        cfg = TrainConfig(
            batch_size=2, img_size=32, n_sample_observed_point=128,
            n_sample_template_point=128,
        )
        ds = MegaPoseDataset(cfg, megapose_root, seed=3)
        assert len(ds) == 1
        s = ds[0]
        assert s["pts"].shape == (128, 3)
        assert s["tem_pts"].shape == (2, 128, 3)
        assert s["rgb"].shape == (32, 32, 3)
        # Observed points mapped into the (aug-rotated) object frame must
        # land on the template cloud.
        obj = (s["pts"] - s["gt_t"]) @ s["gt_r"]
        tem = s["tem_pts"].reshape(-1, 3)
        d = np.sqrt(((obj[:, None] - tem[None]) ** 2).sum(-1)).min(1)
        assert np.median(d) < 0.012, np.median(d)
        # Template scale really is meters after the x0.1 load.
        assert 0.02 < np.abs(tem).max() < 0.08

    def test_missing_files_are_skipped(self, megapose_root, tmp_path):
        cfg = TrainConfig(
            batch_size=2, img_size=32, n_sample_observed_point=64,
            n_sample_template_point=64,
        )
        ds = MegaPoseDataset(cfg, megapose_root, seed=0)
        # Index beyond range wraps; retry logic must still return a
        # valid sample.
        s = ds[7]
        assert s["pts"].shape == (64, 3)

    def test_dilate_mask_cross_matches_bruteforce(self):
        from sam6d_tpu.provider.training_dataset import dilate_mask_cross

        rng = np.random.RandomState(0)
        m = rng.rand(40, 50) < 0.05
        got = dilate_mask_cross(m, iterations=4)
        # Brute force: a pixel is set iff some source pixel lies within
        # L1 distance 4 (4 iterations of a radius-1 cross = L1 ball r=4).
        ys, xs = np.nonzero(m)
        want = np.zeros_like(m)
        H, W = m.shape
        for y in range(H):
            for x in range(W):
                if len(ys) and (np.abs(ys - y) + np.abs(xs - x)).min() <= 4:
                    want[y, x] = True
        np.testing.assert_array_equal(got, want)

    def test_dilated_sample_stays_geometrically_valid(self, megapose_root):
        # With dilate_mask on, the 50%-probability 4-iter dilation pulls
        # zero-depth background pixels into the crop; the radius filter
        # must drop them and the sample must stay consistent.
        cfg = TrainConfig(
            batch_size=2, img_size=32, n_sample_observed_point=128,
            n_sample_template_point=128,
        )
        hit = False
        for seed in range(6):
            ds = MegaPoseDataset(cfg, megapose_root, seed=seed,
                                 dilate_mask=True)
            # Consume the rng the same way read_data does to detect
            # whether this seed's draw dilates (rand() after template +
            # color-aug draws is opaque; just validate the output).
            s = ds[0]
            obj = (s["pts"] - s["gt_t"]) @ s["gt_r"]
            tem = s["tem_pts"].reshape(-1, 3)
            d = np.sqrt(((obj[:, None] - tem[None]) ** 2).sum(-1)).min(1)
            assert np.median(d) < 0.012, (seed, np.median(d))
            hit = True
        assert hit

    def test_reset_resamples_epoch_subset(self, megapose_root):
        cfg = TrainConfig(
            batch_size=2, img_size=32, n_sample_observed_point=64,
            n_sample_template_point=64,
        )
        ds = MegaPoseDataset(cfg, megapose_root, seed=0,
                             num_img_per_epoch=5)
        assert len(ds) == 5
        ds.reset()
        first = ds.img_idx.copy()
        assert first.shape == (5,)
        # Single-image corpus: every epoch index maps to image 0
        # (with-replacement branch, reference :115-116).
        assert set(first.tolist()) == {0}
        s = ds[3]
        assert s["pts"].shape == (64, 3)
