"""BOP PBR onboarding provider tests on a synthetic train_pbr layout."""

import json
import os

import numpy as np
from PIL import Image

from sam6d_tpu.provider.bop_pbr import (
    load_pbr_onboarding_templates,
    scan_pbr_instances,
    select_views_per_template,
)
from sam6d_tpu.utils.template_poses import get_obj_poses_from_template_level


def _random_rotation(rng):
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _make_pbr_dataset(root, n_scenes=2, n_frames=4, rng=None):
    rng = rng or np.random.RandomState(0)
    for s in range(n_scenes):
        scene = os.path.join(root, "train_pbr", f"{s:06d}")
        os.makedirs(os.path.join(scene, "rgb"))
        os.makedirs(os.path.join(scene, "mask_visib"))
        gt, info = {}, {}
        for f in range(n_frames):
            img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(scene, "rgb", f"{f:06d}.png"))
            gt[str(f)], info[str(f)] = [], []
            for idx, obj_id in enumerate((1, 2)):
                R = _random_rotation(rng)
                gt[str(f)].append({
                    "obj_id": obj_id,
                    "cam_R_m2c": R.flatten().tolist(),
                    "cam_t_m2c": [0, 0, 400],
                })
                # obj 2 in frame 0 is barely visible -> filtered out.
                vis = 0.3 if (obj_id == 2 and f == 0) else 0.95
                info[str(f)].append({"visib_fract": vis})
                mask = np.zeros((48, 64), np.uint8)
                y, x = 8 + 4 * idx, 10 + 6 * f
                mask[y:y + 12, x:x + 10] = 255
                Image.fromarray(mask).save(os.path.join(
                    scene, "mask_visib", f"{f:06d}_{idx:06d}.png"))
        json.dump(gt, open(os.path.join(scene, "scene_gt.json"), "w"))
        json.dump(info,
                  open(os.path.join(scene, "scene_gt_info.json"), "w"))
    return root


class TestScan:
    def test_counts_and_filtering(self, tmp_path):
        root = _make_pbr_dataset(str(tmp_path))
        per_obj = scan_pbr_instances(root)
        # obj 1: 2 scenes x 4 frames; obj 2: minus the vis-filtered frame 0.
        assert len(per_obj[1]) == 8
        assert len(per_obj[2]) == 6
        assert all(i.visib_fract > 0.8 for i in per_obj[2])

    def test_scene_frame_bounds(self, tmp_path):
        root = _make_pbr_dataset(str(tmp_path))
        per_obj = scan_pbr_instances(root, max_scenes=1)
        assert len(per_obj[1]) == 4


class TestSelection:
    def test_nearest_view_per_template(self, tmp_path):
        root = _make_pbr_dataset(str(tmp_path))
        per_obj = scan_pbr_instances(root)
        selected = select_views_per_template(per_obj[1], level=0)
        T = len(get_obj_poses_from_template_level(0))
        assert len(selected) == T
        # Every template picks the argmax viewing-direction instance.
        t_dirs = get_obj_poses_from_template_level(0)[:, 2, :3]
        q_dirs = np.stack([i.R[2] for i in per_obj[1]])
        best = np.argmax(t_dirs @ q_dirs.T, axis=1)
        for t, inst in enumerate(selected):
            np.testing.assert_array_equal(inst.R, per_obj[1][best[t]].R)


class TestTemplates:
    def test_onboarding_outputs(self, tmp_path):
        root = _make_pbr_dataset(str(tmp_path))
        imgs, masks, poses = load_pbr_onboarding_templates(
            root, obj_id=1, image_size=64)
        T = len(get_obj_poses_from_template_level(0))
        assert imgs.shape == (T, 64, 64, 3)
        assert masks.shape == (T, 64, 64)
        assert poses.shape == (T, 4, 4)
        assert imgs.min() >= 0 and imgs.max() <= 1
        # Content is masked: away from the (resized) mask boundary the
        # image is black; a few boundary pixels bleed from bilinear
        # resampling.
        from scipy import ndimage

        dilated = np.stack(
            [ndimage.binary_dilation(m, iterations=3) for m in masks])
        outside = imgs * (~dilated[..., None])
        assert float(np.abs(outside).max()) == 0.0
        # And the mask interiors are non-empty.
        assert masks.reshape(T, -1).any(axis=1).all()

    def test_missing_object_raises(self, tmp_path):
        root = _make_pbr_dataset(str(tmp_path))
        try:
            load_pbr_onboarding_templates(root, obj_id=99)
            raised = False
        except ValueError:
            raised = True
        assert raised
