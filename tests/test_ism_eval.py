"""ISM onboarding + BOP eval sweep on the synthetic mini dataset."""

import os

import numpy as np
import pytest
import jax

from sam6d_tpu.config import DescriptorConfig, ISMConfig, SegmentorConfig
from sam6d_tpu.models.ism.onboarding import load_template_crops
from sam6d_tpu.pipeline.ism_eval import run_ism_eval

from tests.test_bop_eval import mini_bop  # noqa: F401  (fixture)
from tests.test_ism import tiny_sam


class TestOnboarding:
    def test_load_template_crops(self, mini_bop):  # noqa: F811
        tdir = os.path.join(mini_bop["template_root"], "obj_000001")
        imgs, masks = load_template_crops(tdir, n_views=4, crop_size=28)
        assert imgs.shape == (4, 28, 28, 3)
        assert masks.shape == (4, 28, 28)
        assert imgs.max() <= 1.0 and imgs.min() >= 0.0
        assert masks.any(axis=(1, 2)).all()  # every view sees the object


class TestISMEval:
    def test_sweep_end_to_end(self, mini_bop):  # noqa: F811
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
        detector = ISMDetector(ism_cfg, segmentor, descriptor, desc_vars)

        out_dir = os.path.join(mini_bop["out_dir"], "ism")
        merged = run_ism_eval(
            detector,
            mini_bop["dataset_dir"],
            mini_bop["template_root"],
            out_dir,
            n_views=4,
        )
        assert os.path.exists(
            os.path.join(out_dir, "detection_ism_bop.json")
        )
        for row in merged:
            assert row["scene_id"] == 1
            assert "segmentation" in row
            assert row["category_id"] == 1  # mapped to the BOP object id

    def test_sweep_pbr_onboarding(self, mini_bop):  # noqa: F811
        """Same sweep but onboarding from train_pbr images
        (reference BOPTemplatePBR path)."""
        from sam6d_tpu.models.ism.detector import ISMDetector
        from sam6d_tpu.models.ism.dinov2 import DescriptorModel
        from sam6d_tpu.models.ism.sam.amg import SamAutomaticMaskGenerator
        from tests.test_bop_pbr import _make_pbr_dataset

        if not os.path.isdir(
            os.path.join(mini_bop["dataset_dir"], "train_pbr")
        ):
            _make_pbr_dataset(mini_bop["dataset_dir"])

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
        detector = ISMDetector(ism_cfg, segmentor, descriptor, desc_vars)

        out_dir = os.path.join(mini_bop["out_dir"], "ism_pbr")
        merged = run_ism_eval(
            detector,
            mini_bop["dataset_dir"],
            mini_bop["template_root"],
            out_dir,
            onboarding="pbr",
        )
        assert os.path.exists(
            os.path.join(out_dir, "detection_ism_bop.json")
        )
        # The template bank came from PBR crops: 42 views onboarded for
        # the single model object.
        assert detector.ref_data.descriptors.shape[0] == 1
        assert detector.ref_data.descriptors.shape[1] == 42
        for row in merged:
            assert row["category_id"] == 1
