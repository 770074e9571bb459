"""ISM tests: scoring math vs numpy oracles, host utilities, tiny-model
SAM AMG + DINOv2 descriptor pipeline, and the end-to-end detector smoke.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sam6d_tpu.config import DescriptorConfig, ISMConfig, SegmentorConfig
from sam6d_tpu.models.ism import scoring
from sam6d_tpu.utils.bbox import crop_resize_pad, square_bbox
from sam6d_tpu.utils.detections import Detections, nms
from sam6d_tpu.utils.rle import mask_to_rle, rle_to_mask
from sam6d_tpu.utils.template_poses import (
    get_camera_poses,
    get_obj_poses_from_template_level,
    icosphere,
)


class TestScoring:
    def test_semantic_identity(self, rng):
        # Query == one of the templates -> that template wins with sim 1.
        D = 16
        ref = rng.randn(2, 5, D).astype(np.float32)
        query = ref[1, 3][None]  # object 1, template 3
        score, obj_idx, _, best_template, sim = scoring.semantic_score(
            jnp.asarray(query), jnp.asarray(ref), "max"
        )
        assert int(np.asarray(obj_idx)[0]) == 1
        assert int(np.asarray(best_template)[0]) == 3
        assert float(np.asarray(score)[0]) > 0.99

    def test_avg5_aggregation(self, rng):
        sim = jnp.asarray(rng.rand(3, 2, 7).astype(np.float32))
        agg = np.asarray(scoring.aggregate_semantic_score(sim, "avg_5"))
        want = np.sort(np.asarray(sim), axis=-1)[..., -5:].mean(-1)
        np.testing.assert_allclose(agg, want, atol=1e-6)

    def test_appearance_perfect_match(self, rng):
        D, Np = 8, 10
        patches = rng.randn(2, Np, D).astype(np.float32)
        patches /= np.linalg.norm(patches, axis=-1, keepdims=True)
        score = np.asarray(
            scoring.appearance_score(jnp.asarray(patches), jnp.asarray(patches))
        )
        np.testing.assert_allclose(score, 1.0, atol=1e-4)

    def test_appearance_masked_patches_ignored(self, rng):
        D, Np = 8, 10
        patches = rng.randn(1, Np, D).astype(np.float32)
        patches /= np.linalg.norm(patches, axis=-1, keepdims=True)
        q = patches.copy()
        q[:, 5:] = 0.0  # half the query patches invalid
        score = np.asarray(
            scoring.appearance_score(jnp.asarray(q), jnp.asarray(patches))
        )
        np.testing.assert_allclose(score, 1.0, atol=1e-4)

    def test_final_score_formula(self):
        sem = jnp.asarray([0.8])
        appe = jnp.asarray([0.6])
        geo = jnp.asarray([0.5])
        vis = jnp.asarray([0.4])
        got = float(np.asarray(scoring.final_score(sem, appe, geo, vis))[0])
        want = (0.8 + 0.6 + 0.5 * 0.4) / (2 + 0.4)
        assert abs(got - want) < 1e-6


class TestHostUtils:
    def test_nms_suppresses_overlaps(self):
        boxes = np.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
        )
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        keep = nms(boxes, scores, 0.5)
        assert list(keep) == [0, 2]

    def test_rle_roundtrip(self, rng):
        mask = rng.rand(33, 47) > 0.6
        rle = mask_to_rle(mask)
        back = rle_to_mask(rle)
        np.testing.assert_array_equal(mask, back)

    def test_rle_empty_and_full(self):
        for mask in (np.zeros((5, 7), bool), np.ones((5, 7), bool)):
            np.testing.assert_array_equal(rle_to_mask(mask_to_rle(mask)), mask)

    def test_square_bbox(self):
        mask = np.zeros((100, 200), bool)
        mask[10:30, 50:90] = True
        rmin, rmax, cmin, cmax = square_bbox(mask)
        assert (rmax - rmin) == (cmax - cmin)  # square
        assert rmin >= 0 and cmin >= 0 and rmax <= 100 and cmax <= 200
        assert rmin <= 10 and rmax >= 30 and cmin <= 50 and cmax >= 90

    def test_crop_resize_pad_scales_long_side(self):
        img = jnp.ones((100, 200, 3))
        boxes = jnp.asarray([[50.0, 20.0, 150.0, 70.0]])  # w=100 h=50
        crops = crop_resize_pad(img, boxes, 64)
        crop = np.asarray(crops)[0]
        assert crop.shape == (64, 64, 3)
        # Long side fills the width; rows beyond scaled h=32 are padding.
        assert crop[:32, :, :].mean() > 0.9
        np.testing.assert_allclose(crop[40:, :, :], 0.0, atol=1e-6)

    def test_detections_small_filter(self):
        H = W = 100
        masks = np.zeros((2, H, W), bool)
        masks[0, 10:60, 10:60] = True  # big
        masks[1, 0:2, 0:2] = True  # tiny
        boxes = np.array([[10, 10, 60, 60], [0, 0, 2, 2]], np.float32)
        dets = Detections(masks=masks, boxes=boxes)
        keep = dets.remove_very_small_detections()
        assert list(keep) == [0]

    def test_bop23_serialization(self, rng):
        masks = rng.rand(2, 20, 30) > 0.5
        boxes = np.array([[1, 2, 11, 12], [3, 4, 13, 14]], np.float32)
        dets = Detections(
            masks=masks, boxes=boxes,
            scores=np.array([0.9, 0.8], np.float32),
            object_ids=np.array([0, 4]),
        )
        rows = dets.to_bop23(scene_id=1, image_id=2)
        assert rows[0]["category_id"] == 1 and rows[1]["category_id"] == 5
        assert rows[0]["bbox"] == [1.0, 2.0, 10.0, 10.0]
        np.testing.assert_array_equal(
            rle_to_mask(rows[0]["segmentation"]), masks[0]
        )


class TestTemplatePoses:
    def test_icosphere_counts(self):
        for sub, n in [(1, 42), (2, 162), (3, 642)]:
            verts, _ = icosphere(sub)
            assert len(verts) == n
            np.testing.assert_allclose(
                np.linalg.norm(verts, axis=1), 1.0, atol=1e-6
            )

    def test_camera_poses_look_at_origin(self):
        poses = get_camera_poses(level=0, radius=2.0)
        assert poses.shape == (42, 4, 4)
        for p in poses[:5]:
            R, t = p[:3, :3], p[:3, 3]
            # Orthonormal right-handed.
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
            assert np.linalg.det(R) > 0.99
            # +z axis points from camera toward the origin.
            fwd = R[:, 2]
            np.testing.assert_allclose(
                fwd, -t / np.linalg.norm(t), atol=1e-5
            )

    def test_obj_poses_invert_cam_poses(self):
        cam = get_camera_poses(level=0)
        obj = get_obj_poses_from_template_level(level=0)
        prod = np.einsum("nij,njk->nik", obj, cam)
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5
        )


def tiny_sam():
    from sam6d_tpu.models.ism.sam.model import SAM

    sam = SAM(
        model_type="vit_b",
        img_size=64,
        encoder_kwargs=dict(
            embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,),
            window_size=2,
        ),
    )
    sam.init(jax.random.PRNGKey(0))
    return sam


class TestSAM:
    def test_amg_pipeline_shapes(self, rng):
        from sam6d_tpu.models.ism.sam.amg import SamAutomaticMaskGenerator

        sam = tiny_sam()
        cfg = SegmentorConfig(
            points_per_side=4, points_per_batch=8,
            pred_iou_thresh=-1e9, stability_score_thresh=-1e9,
        )
        gen = SamAutomaticMaskGenerator(sam, cfg)
        image = (rng.rand(48, 60, 3) * 255).astype(np.uint8)
        out = gen.generate_masks(image)
        assert out["masks"].ndim == 3
        assert out["masks"].shape[1:] == (48, 60)
        assert out["boxes"].shape == (len(out["masks"]), 4)
        assert (out["boxes"][:, 2] <= 61).all()

    def test_decoder_mask_shapes(self):
        sam = tiny_sam()
        emb = sam.encode(jnp.zeros((1, 64, 64, 3)))
        assert emb.shape == (1, 4, 4, 256)
        logits, iou = sam.decode_points(emb, jnp.zeros((5, 1, 2)))
        assert logits.shape == (5, 4, 16, 16)
        assert iou.shape == (5, 4)


class TestDINOv2:
    def test_descriptor_shapes(self, rng):
        from sam6d_tpu.models.ism.dinov2 import DescriptorModel

        cfg = DescriptorConfig(
            image_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2
        )
        model = DescriptorModel(cfg)
        variables = model.init(jax.random.PRNGKey(0))
        imgs = jnp.asarray(rng.rand(3, 28, 28, 3), jnp.float32)
        cls = model.compute_features(variables, imgs)
        assert cls.shape == (3, 32)
        masks = jnp.asarray(rng.rand(3, 28, 28) > 0.3)
        patch = model.compute_masked_patch_features(variables, imgs, masks)
        assert patch.shape == (3, 4, 32)

    def test_patch_validity(self):
        from sam6d_tpu.models.ism.dinov2 import patch_validity_mask

        masks = jnp.zeros((1, 28, 28)).at[:, :14, :14].set(1.0)
        valid = np.asarray(patch_validity_mask(masks, 14, 0.5))
        np.testing.assert_array_equal(valid[0], [True, False, False, False])


class TestDetectorEndToEnd:
    def test_detect_smoke(self, rng):
        from sam6d_tpu.models.ism.detector import ISMDetector
        from sam6d_tpu.models.ism.dinov2 import DescriptorModel
        from sam6d_tpu.models.ism.sam.amg import SamAutomaticMaskGenerator

        sam = tiny_sam()
        seg_cfg = SegmentorConfig(
            points_per_side=4, points_per_batch=8,
            pred_iou_thresh=-1e9, stability_score_thresh=-1e9,
        )
        segmentor = SamAutomaticMaskGenerator(sam, seg_cfg)

        desc_cfg = DescriptorConfig(
            image_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2
        )
        descriptor = DescriptorModel(desc_cfg)
        desc_vars = descriptor.init(jax.random.PRNGKey(1))

        ism_cfg = ISMConfig(
            segmentor=seg_cfg, descriptor=desc_cfg, confidence_thresh=-1.0
        )
        det = ISMDetector(ism_cfg, segmentor, descriptor, desc_vars)

        # Synthetic templates: 1 object, 3 views.
        det.onboard_templates(
            template_images=rng.rand(1, 3, 28, 28, 3).astype(np.float32),
            template_masks=rng.rand(1, 3, 28, 28) > 0.3,
            template_poses=np.broadcast_to(
                np.eye(4, dtype=np.float32), (3, 4, 4)
            ).copy(),
            pointcloud=rng.randn(1, 64, 3).astype(np.float32),
        )

        image = (rng.rand(48, 60, 3) * 255).astype(np.uint8)
        depth = np.full((48, 60), 1.5, np.float32)
        K = np.array([[60.0, 0, 30], [0, 60.0, 24], [0, 0, 1]], np.float32)
        dets = det.detect(image, depth, K)
        # Smoke: pipeline runs end-to-end and returns coherent fields.
        if len(dets):
            assert dets.scores is not None and np.isfinite(dets.scores).all()
            assert dets.object_ids is not None
            assert dets.masks.shape[1:] == (48, 60)


class TestEmptyDetections:
    def test_zero_proposals_pipeline_safe(self):
        from sam6d_tpu.utils.detections import Detections

        dets = Detections(
            masks=np.zeros((0, 32, 32), bool),
            boxes=np.zeros((0, 4), np.float32),
        )
        keep = dets.remove_very_small_detections()
        assert len(keep) == 0
        assert len(dets.filter(keep)) == 0
        assert dets.to_bop23(0, 0) == []


class TestWidthSizeAndSmallRegions:
    def test_width_size_path_matches_direct_shapes(self, rng):
        """segmentor_width_size pre-resize (reference model/sam.py:77-101)
        must return masks/boxes at the ORIGINAL resolution with clamped
        boxes; masks should overlap strongly with the no-resize path."""
        from sam6d_tpu.models.ism.sam.amg import SamAutomaticMaskGenerator

        sam = tiny_sam()
        image = (rng.rand(48, 60, 3) * 255).astype(np.uint8)
        outs = []
        for ws in (0, 120):
            cfg = SegmentorConfig(
                points_per_side=4, points_per_batch=8,
                pred_iou_thresh=-1e9, stability_score_thresh=-1e9,
                segmentor_width_size=ws,
            )
            gen = SamAutomaticMaskGenerator(sam, cfg)
            out = gen.generate_masks(image)
            assert out["masks"].shape[1:] == (48, 60)
            assert (out["boxes"][:, 0::2] <= 60 - 1).all()
            assert (out["boxes"][:, 1::2] <= 48 - 1).all()
            outs.append(out)

    def test_remove_small_regions(self):
        from sam6d_tpu.models.ism.sam.amg import remove_small_regions_batch

        m = np.zeros((1, 32, 32), bool)
        m[0, 4:28, 4:28] = True
        m[0, 10:12, 10:12] = False  # small hole (4 px)
        m[0, 30:32, 30:32] = True  # small island (4 px)
        out, changed = remove_small_regions_batch(m, area_thresh=9)
        assert changed[0]
        assert out[0, 10:12, 10:12].all()  # hole filled
        assert not out[0, 30:32, 30:32].any()  # island removed
        assert out[0, 4:28, 4:28].all()

        # Large structures survive.
        out2, changed2 = remove_small_regions_batch(m, area_thresh=2)
        assert not changed2[0]

    def test_all_small_islands_keeps_largest(self):
        """When every island is below area_thresh the largest one
        survives instead of emptying the mask (reference
        remove_small_regions fill_labels fallback — ADVICE r2)."""
        from sam6d_tpu.models.ism.sam.amg import remove_small_regions_batch

        m = np.zeros((1, 32, 32), bool)
        m[0, 2:5, 2:5] = True   # 9 px
        m[0, 20:22, 20:22] = True  # 4 px
        out, changed = remove_small_regions_batch(m, area_thresh=100)
        assert changed[0]
        assert out[0, 2:5, 2:5].all()       # largest island kept
        assert not out[0, 20:22, 20:22].any()

    def test_masks_to_boxes(self):
        from sam6d_tpu.models.ism.sam.amg import masks_to_boxes

        m = np.zeros((2, 16, 16), bool)
        m[0, 3:7, 5:11] = True
        boxes = masks_to_boxes(m)
        # Same convention as the device mask_to_box path (exclusive
        # max+1, clipped to W-1/H-1) — one convention for both AMG
        # outputs regardless of min_mask_region_area (ADVICE r3).
        np.testing.assert_array_equal(boxes[0], [5, 3, 11, 7])
        np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])
        full = np.ones((1, 16, 16), bool)
        np.testing.assert_array_equal(masks_to_boxes(full)[0],
                                      [0, 0, 15, 15])


class TestTolerantRestoreGuard:
    def test_raises_on_mostly_mismatched_checkpoint(self, tmp_path):
        """A checkpoint from a different architecture must raise, not
        silently return a mostly-random model (ADVICE r2)."""
        import pytest

        from sam6d_tpu.train.checkpoint import (
            restore_params_tolerant,
            save_params,
        )

        template = {
            "params": {f"w{i}": np.ones((4, 4), np.float32) for i in range(8)}
        }
        other = {"params": {"w0": np.ones((4, 4), np.float32),
                            "v": np.ones((2,), np.float32)}}
        pdir = str(tmp_path / "other")
        save_params(pdir, other)
        with pytest.raises(ValueError, match="different architecture"):
            restore_params_tolerant(pdir, template, verbose=False)
        # Explicit opt-in still allows the partial load.
        merged, misses = restore_params_tolerant(
            pdir, template, verbose=False, max_miss_fraction=1.0
        )
        assert len(misses) == 7

    def test_vit_type_mismatch_warns(self):
        import warnings

        from sam6d_tpu.config import ViTConfig

        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            ViTConfig(vit_type="vit_large")  # fields stay vit_base
        assert any("vit_large" in str(w.message) for w in rec)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            ViTConfig(embed_dim=48, depth=2, num_heads=2)  # toy: silent
        assert not rec
