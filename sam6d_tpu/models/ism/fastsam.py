"""FastSAM: YOLOv8-seg proposal generator (flax).

Re-derivation of reference Instance_Segmentation_Model/model/fast_sam.py
(CustomYOLO :18, FastSAM.generate_masks :113) and the OV-compiled
ultralytics predictor it patches in (model/ov_predictor.py): a
YOLOv8-style segmentation network (CSP backbone with C2f blocks, PAN-FPN
neck, decoupled detect head + 32-proto mask head) whose detections become
class-agnostic mask proposals for the ISM.

TPU re-design: the whole network + box/mask decode runs as one jitted
program at a static 640-padded input; only score thresholding and NMS
(variable-length, cheap) run on host, mirroring the AMG split.

The module structure is layout-faithful to ultralytics YOLOv8-seg so the
released FastSAM checkpoints (model.N.* state dicts) convert as a pure
tensor relayout — see tools/convert_weights.py convert_fastsam and the
index map in FASTSAM_LAYER_MAP below. Structural invariants that matter
for conversion parity:
  * width scaling = ceil-to-multiple-of-8 of min(c, max_channels)*width
  * proto head: Conv, ConvTranspose(2,2) upsample, Conv, Conv (all but
    the transpose carry BN+SiLU)
  * detect/cls/mask branch widths derive from the P3 channel count for
    ALL pyramid levels (not per-level)
  * DFL box decode = softmax-bin expectation, anchor-free, xyxy*stride
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from sam6d_tpu.utils.detections import nms

# Checkpoint module index -> flax module name (ultralytics yolov8-seg.yaml
# order; indices 10/11/13/14/17/20 are Upsample/Concat with no params,
# 22 is the Segment head handled field-by-field in convert_fastsam).
FASTSAM_LAYER_MAP = {
    0: "stem", 1: "down1", 2: "c2f_1", 3: "down2", 4: "c2f_2",
    5: "down3", 6: "c2f_3", 7: "down4", 8: "c2f_4", 9: "sppf",
    12: "neck_c2f_1", 15: "neck_c2f_2", 16: "neck_down1",
    18: "neck_c2f_3", 19: "neck_down2", 21: "neck_c2f_4",
}

# (depth, width, max_channels) per YOLOv8 scale table; FastSAM-s is the
# "s" scale, FastSAM-x the "x" scale.
FASTSAM_SCALES = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "x": (1.00, 1.25, 512),
}


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


class ConvBNSiLU(nn.Module):
    out_ch: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.out_ch, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)), use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNSiLU(self.out_ch, 3, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBNSiLU(self.out_ch, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out_ch:
            return x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8)."""

    out_ch: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.out_ch // 2
        y = ConvBNSiLU(2 * hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :hidden], y[..., hidden:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(hidden, self.shortcut, dtype=self.dtype,
                           name=f"m_{i}")(parts[-1], train)
            )
        return ConvBNSiLU(self.out_ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast)."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBNSiLU(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(pools[-1], (5, 5), strides=(1, 1),
                            padding=((2, 2), (2, 2)))
            )
        return ConvBNSiLU(self.out_ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")


class YOLOv8Seg(nn.Module):
    """YOLOv8-seg: backbone + PAN neck + decoupled detect/proto heads.

    width/depth/max_channels follow the YOLOv8 scale table
    (FASTSAM_SCALES); default is "s" (the FastSAM-s configuration).
    """

    width: float = 0.5
    depth: float = 0.33
    max_channels: int = 1024
    num_classes: int = 1  # FastSAM: single "object" class
    num_masks: int = 32
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda c: make_divisible(min(c, self.max_channels) * self.width)
        d = lambda n: max(1, int(round(n * self.depth)))

        # Backbone (P1..P5).
        x = ConvBNSiLU(w(64), 3, 2, dtype=self.dtype, name="stem")(x, train)
        x = ConvBNSiLU(w(128), 3, 2, dtype=self.dtype, name="down1")(x, train)
        x = C2f(w(128), d(3), True, dtype=self.dtype, name="c2f_1")(x, train)
        x = ConvBNSiLU(w(256), 3, 2, dtype=self.dtype, name="down2")(x, train)
        p3 = C2f(w(256), d(6), True, dtype=self.dtype, name="c2f_2")(x, train)
        x = ConvBNSiLU(w(512), 3, 2, dtype=self.dtype, name="down3")(p3, train)
        p4 = C2f(w(512), d(6), True, dtype=self.dtype, name="c2f_3")(x, train)
        x = ConvBNSiLU(w(1024), 3, 2, dtype=self.dtype, name="down4")(
            p4, train)
        x = C2f(w(1024), d(3), True, dtype=self.dtype, name="c2f_4")(x, train)
        p5 = SPPF(w(1024), dtype=self.dtype, name="sppf")(x, train)

        # PAN-FPN neck.
        u = jnp.concatenate([_upsample2(p5), p4], axis=-1)
        n4 = C2f(w(512), d(3), dtype=self.dtype, name="neck_c2f_1")(u, train)
        u = jnp.concatenate([_upsample2(n4), p3], axis=-1)
        n3 = C2f(w(256), d(3), dtype=self.dtype, name="neck_c2f_2")(u, train)
        ddown = ConvBNSiLU(w(256), 3, 2, dtype=self.dtype, name="neck_down1")(
            n3, train)
        n4b = C2f(w(512), d(3), dtype=self.dtype, name="neck_c2f_3")(
            jnp.concatenate([ddown, n4], axis=-1), train)
        ddown2 = ConvBNSiLU(w(512), 3, 2, dtype=self.dtype,
                            name="neck_down2")(n4b, train)
        n5 = C2f(w(1024), d(3), dtype=self.dtype, name="neck_c2f_4")(
            jnp.concatenate([ddown2, p5], axis=-1), train)

        # Proto mask head from P3 (Conv, x2 ConvTranspose, Conv, Conv).
        npr = w(256)
        proto = ConvBNSiLU(npr, 3, dtype=self.dtype, name="proto_cv1")(
            n3, train)
        proto = nn.ConvTranspose(npr, (2, 2), strides=(2, 2),
                                 padding="VALID", dtype=self.dtype,
                                 name="proto_up")(proto)
        proto = ConvBNSiLU(npr, 3, dtype=self.dtype, name="proto_cv2")(
            proto, train)
        proto = ConvBNSiLU(self.num_masks, 1, dtype=self.dtype,
                           name="proto_cv3")(proto, train)  # (B,H/4,W/4,32)

        # Decoupled heads on (n3, n4b, n5). Branch widths derive from the
        # P3 channel count for every level (ultralytics Detect/Segment).
        c2 = max(16, w(256) // 4, 4 * self.reg_max)
        c3 = max(w(256), min(self.num_classes, 100))
        c4 = max(w(256) // 4, self.num_masks)
        outs = []
        for i, feat in enumerate((n3, n4b, n5)):
            box = ConvBNSiLU(c2, 3, dtype=self.dtype,
                             name=f"head_box1_{i}")(feat, train)
            box = ConvBNSiLU(c2, 3, dtype=self.dtype,
                             name=f"head_box2_{i}")(box, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), dtype=self.dtype,
                          name=f"head_box3_{i}")(box)
            cls = ConvBNSiLU(c3, 3, dtype=self.dtype,
                             name=f"head_cls1_{i}")(feat, train)
            cls = ConvBNSiLU(c3, 3, dtype=self.dtype,
                             name=f"head_cls2_{i}")(cls, train)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          name=f"head_cls3_{i}")(cls)
            mc = ConvBNSiLU(c4, 3, dtype=self.dtype,
                            name=f"head_mask1_{i}")(feat, train)
            mc = ConvBNSiLU(c4, 3, dtype=self.dtype,
                            name=f"head_mask2_{i}")(mc, train)
            mc = nn.Conv(self.num_masks, (1, 1), dtype=self.dtype,
                         name=f"head_mask3_{i}")(mc)
            outs.append((box, cls, mc))
        return outs, proto


def decode_boxes(outs, img_size: int, reg_max: int = 16):
    """Anchor-free DFL decode to (B, A, 4) xyxy + (B, A, C) scores +
    (B, A, M) mask coefficients."""
    boxes, scores, mcoefs = [], [], []
    for box, cls, mc in outs:
        B, H, W, _ = box.shape
        stride = img_size // H
        # DFL: softmax over reg_max bins -> expectation.
        box = box.reshape(B, H * W, 4, reg_max)
        bins = jnp.arange(reg_max, dtype=box.dtype)
        dist = jnp.sum(jax.nn.softmax(box, axis=-1) * bins, axis=-1)
        cy = (jnp.arange(H, dtype=box.dtype) + 0.5)[:, None]
        cx = (jnp.arange(W, dtype=box.dtype) + 0.5)[None, :]
        cxy = jnp.stack(
            [jnp.broadcast_to(cx, (H, W)), jnp.broadcast_to(cy, (H, W))],
            axis=-1,
        ).reshape(1, H * W, 2)
        lt, rb = dist[..., :2], dist[..., 2:]
        x1y1 = (cxy - lt) * stride
        x2y2 = (cxy + rb) * stride
        boxes.append(jnp.concatenate([x1y1, x2y2], axis=-1))
        scores.append(jax.nn.sigmoid(cls.reshape(B, H * W, -1)))
        mcoefs.append(mc.reshape(B, H * W, -1))
    return (
        jnp.concatenate(boxes, axis=1),
        jnp.concatenate(scores, axis=1),
        jnp.concatenate(mcoefs, axis=1),
    )


class FastSAM:
    """FastSAM proposal generator with the ISM `generate_masks` contract.

    Post-processing thresholds follow the reference fast_sam.yaml:
    iou 0.9, conf 0.05, max_det 200 (CustomYOLO overrides,
    model/fast_sam.py:33-45).
    """

    def __init__(self, img_size: int = 640, conf: float = 0.05,
                 iou: float = 0.9, max_det: int = 200,
                 scale: str | None = None,
                 width: float = 0.5, depth: float = 0.33,
                 max_channels: int = 1024):
        if scale is not None:
            depth, width, max_channels = FASTSAM_SCALES[scale]
        self.img_size = img_size
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.net = YOLOv8Seg(width=width, depth=depth,
                             max_channels=max_channels)
        self.variables = None
        self._forward = jax.jit(self._forward_impl)
        self._compose = jax.jit(
            self._compose_masks_impl, static_argnums=(3, 4, 5, 6)
        )

    def init(self, key):
        dummy = jnp.zeros((1, self.img_size, self.img_size, 3))
        self.variables = self.net.init(key, dummy)
        return self.variables

    def load(self, variables):
        self.variables = variables
        return self.variables

    def _forward_impl(self, variables, img):
        outs, proto = self.net.apply(variables, img)
        boxes, scores, mcoef = decode_boxes(outs, self.img_size)
        # Top-K candidates on device (static shape back to host).
        conf = jnp.max(scores, axis=-1)  # (B, A)
        k = min(self.max_det * 4, conf.shape[1])
        top_conf, keep = jax.lax.top_k(conf[0], k)
        return (
            boxes[0][keep], top_conf, mcoef[0][keep], proto[0]
        )

    def _compose_masks_impl(self, mcoef, proto, boxes_orig, eh, ew, H, W):
        """(N, M) coefs + (ph, pw, M) prototypes -> (N, H, W) bool masks.

        The reference pipeline's per-mask resize-to-input, crop-padding,
        resize-to-original is linear per axis, so it collapses into one
        (H, ph) @ (N, ph, pw) @ (pw, W) einsum; the predicted-box clip
        becomes two broadcast range masks."""
        from sam6d_tpu.models.ism.sam.amg import _resize_matrix

        ph, pw, M = proto.shape
        S = self.img_size
        logits = (mcoef @ proto.reshape(ph * pw, M).T).reshape(-1, ph, pw)
        sig = jax.nn.sigmoid(logits)
        A = _resize_matrix(eh, H) @ _resize_matrix(ph, S)[:eh]
        Bm = _resize_matrix(ew, W) @ _resize_matrix(pw, S)[:ew]
        full = jnp.einsum("yh,khw,xw->kyx", A, sig, Bm)

        x1 = jnp.floor(boxes_orig[:, 0]).astype(jnp.int32)
        y1 = jnp.floor(boxes_orig[:, 1]).astype(jnp.int32)
        x2 = jnp.floor(boxes_orig[:, 2]).astype(jnp.int32)
        y2 = jnp.floor(boxes_orig[:, 3]).astype(jnp.int32)
        iy = jnp.arange(H)[None, :, None]
        ix = jnp.arange(W)[None, None, :]
        clip = (
            (iy >= y1[:, None, None]) & (iy <= y2[:, None, None])
            & (ix >= x1[:, None, None]) & (ix <= x2[:, None, None])
        )
        return (full > 0.5) & clip

    def generate_masks(self, image: np.ndarray) -> dict:
        """(H, W, 3) uint8 -> {"masks": (N, H, W) bool, "boxes": (N, 4)}."""
        from PIL import Image

        H, W = image.shape[:2]
        S = self.img_size
        scale = S / max(H, W)
        eh, ew = int(round(H * scale)), int(round(W * scale))
        resized = np.asarray(
            Image.fromarray(image).resize((ew, eh), Image.BILINEAR),
            np.float32,
        ) / 255.0
        padded = np.zeros((S, S, 3), np.float32)
        padded[:eh, :ew] = resized

        boxes, conf, mcoef, proto = [
            np.asarray(v)
            for v in self._forward(self.variables, jnp.asarray(padded)[None])
        ]
        keep = conf > self.conf
        boxes, conf, mcoef = boxes[keep], conf[keep], mcoef[keep]
        if len(boxes) == 0:
            return {"masks": np.zeros((0, H, W), bool),
                    "boxes": np.zeros((0, 4), np.float32)}
        kept = nms(boxes, conf, self.iou)[: self.max_det]
        boxes, conf, mcoef = boxes[kept], conf[kept], mcoef[kept]

        # Compose masks from prototypes ON DEVICE: sigmoid(coef @ proto)
        # then the resize(proto->S) -> crop(eh, ew) -> resize(-> H, W)
        # chain as ONE matmul pair per axis (linear-map composition, same
        # trick as sam/amg._upscale_masks) + box clipping — replaces the
        # round-1 per-mask PIL loop.  Padded to max_det so the program
        # compiles once per camera resolution.
        Nk = len(kept)
        pad = self.max_det - Nk
        mcoef_p = np.pad(mcoef, ((0, pad), (0, 0))) if pad else mcoef
        boxes_orig = boxes / scale
        boxes_p = (
            np.pad(boxes_orig, ((0, pad), (0, 0))) if pad else boxes_orig
        )
        masks = np.asarray(
            self._compose(
                jnp.asarray(mcoef_p), jnp.asarray(proto),
                jnp.asarray(boxes_p), eh, ew, H, W,
            )
        )[:Nk]
        nonempty = masks.reshape(len(masks), -1).any(1)
        out_boxes = (boxes[nonempty] / scale).astype(np.float32)
        out_boxes[:, 0::2] = np.clip(out_boxes[:, 0::2], 0, W - 1)
        out_boxes[:, 1::2] = np.clip(out_boxes[:, 1::2], 0, H - 1)
        return {
            "masks": masks[nonempty],
            "boxes": out_boxes,
        }
