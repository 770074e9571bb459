"""FastSAM (YOLOv8-seg) tests: architecture shapes, DFL decode, and the
generate_masks proposal contract."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from sam6d_tpu.models.ism.fastsam import (
    FastSAM,
    YOLOv8Seg,
    decode_boxes,
)


class TestYOLOv8Seg:
    @pytest.mark.slow
    def test_head_shapes(self):
        net = YOLOv8Seg(width=0.25, depth=0.33)
        x = jnp.zeros((1, 128, 128, 3))
        variables = net.init(jax.random.PRNGKey(0), x)
        outs, proto = net.apply(variables, x)
        assert len(outs) == 3
        # Strides 8/16/32.
        assert outs[0][0].shape[1] == 16
        assert outs[1][0].shape[1] == 8
        assert outs[2][0].shape[1] == 4
        for box, cls, mc in outs:
            assert box.shape[-1] == 64  # 4 * reg_max
            assert cls.shape[-1] == 1
            assert mc.shape[-1] == 32
        assert proto.shape == (1, 32, 32, 32)  # H/4 x W/4 x num_masks

    def test_decode_boxes_geometry(self):
        net = YOLOv8Seg(width=0.25, depth=0.33)
        x = jnp.zeros((1, 128, 128, 3))
        variables = net.init(jax.random.PRNGKey(0), x)
        outs, _ = net.apply(variables, x)
        boxes, scores, mcoef = decode_boxes(outs, 128)
        A = 16 * 16 + 8 * 8 + 4 * 4
        assert boxes.shape == (1, A, 4)
        assert scores.shape == (1, A, 1)
        assert mcoef.shape == (1, A, 32)
        b = np.asarray(boxes)[0]
        # x2 >= x1, y2 >= y1 always (DFL distances are non-negative).
        assert (b[:, 2] >= b[:, 0]).all()
        assert (b[:, 3] >= b[:, 1]).all()
        s = np.asarray(scores)
        assert (s >= 0).all() and (s <= 1).all()


class TestFastSAMPipeline:
    def test_generate_masks_contract(self, rng):
        fs = FastSAM(img_size=128, conf=0.0, max_det=16, width=0.25)
        fs.init(jax.random.PRNGKey(0))
        image = (rng.rand(96, 120, 3) * 255).astype(np.uint8)
        out = fs.generate_masks(image)
        assert out["masks"].ndim == 3
        assert out["masks"].shape[1:] == (96, 120)
        assert out["boxes"].shape == (len(out["masks"]), 4)
        if len(out["boxes"]):
            assert out["boxes"][:, 2].max() <= 121
