"""Assembled SAM model: encoder + prompt encoder + decoder with jitted
entry points and the ResizeLongestSide preprocessing.

Re-derivation of reference segment_anything/modeling/sam.py (:18),
predictor.py (SamPredictor :17) and utils/transforms.py
(ResizeLongestSide :16).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from sam6d_tpu.models.ism.sam.decoder import MaskDecoder
from sam6d_tpu.models.ism.sam.encoder import ImageEncoderViT
from sam6d_tpu.models.ism.sam.prompt import PromptEncoder

_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)

SAM_VARIANTS = {
    # embed_dim, depth, num_heads, global_attn_indexes
    "vit_b": (768, 12, 12, (2, 5, 8, 11)),
    "vit_l": (1024, 24, 16, (5, 11, 17, 23)),
    "vit_h": (1280, 32, 16, (7, 15, 23, 31)),
}


class SAM:
    """SAM with jitted encode/decode entry points (functional params)."""

    def __init__(self, model_type: str = "vit_h", img_size: int = 1024,
                 dtype=jnp.float32, encoder_kwargs: dict | None = None):
        embed_dim, depth, num_heads, global_idx = SAM_VARIANTS[model_type]
        kwargs = dict(
            img_size=img_size,
            embed_dim=embed_dim,
            depth=depth,
            num_heads=num_heads,
            global_attn_indexes=global_idx,
            dtype=dtype,
        )
        if encoder_kwargs:
            kwargs.update(encoder_kwargs)
        self.encoder = ImageEncoderViT(**kwargs)
        emb_size = img_size // kwargs.get("patch_size", 16)
        self.prompt_encoder = PromptEncoder(
            embed_dim=256,
            image_embedding_size=(emb_size, emb_size),
            input_image_size=(img_size, img_size),
            dtype=dtype,
        )
        self.decoder = MaskDecoder(dtype=dtype)
        self.input_size = img_size
        self.variables: dict[str, Any] | None = None
        self._encode = jax.jit(self._encode_impl)
        self._decode = jax.jit(self._decode_impl)

    def init(self, key, image_size: int | None = None):
        k1, k2, k3 = jax.random.split(key, 3)
        s = image_size or self.input_size
        enc_vars = self.encoder.init(k1, jnp.zeros((1, s, s, 3)))
        pe_vars = self.prompt_encoder.init(
            k2, jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32),
            method=PromptEncoder.__call__,
        )
        emb = self.encoder.apply(enc_vars, jnp.zeros((1, s, s, 3)))
        pe_dense = self.prompt_encoder.apply(
            pe_vars, method=PromptEncoder.dense_pe
        )
        sparse = self.prompt_encoder.apply(
            pe_vars, jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32),
            method=PromptEncoder.encode_points,
        )
        dense = self.prompt_encoder.apply(
            pe_vars, 1, method=PromptEncoder.no_mask_dense
        )
        dec_vars = self.decoder.init(k3, emb, pe_dense, sparse, dense)
        self.variables = {
            "encoder": enc_vars,
            "prompt": pe_vars,
            "decoder": dec_vars,
        }
        return self.variables

    # -- preprocessing ----------------------------------------------------
    def preprocess_numpy(self, image: np.ndarray):
        """uint8 (H, W, 3) -> normalized padded (S, S, 3) f32 plus the
        1024-per-original-pixel scale and effective (h, w)."""
        H, W = image.shape[:2]
        scale = self.input_size / max(H, W)
        eff_h, eff_w = int(round(H * scale)), int(round(W * scale))
        resized = np.asarray(
            Image.fromarray(image).resize((eff_w, eff_h), Image.BILINEAR),
            np.float32,
        )
        norm = (resized - _PIXEL_MEAN) / _PIXEL_STD
        padded = np.zeros((self.input_size, self.input_size, 3), np.float32)
        padded[:eff_h, :eff_w] = norm
        return padded, scale, (eff_h, eff_w)

    # -- jitted compute ---------------------------------------------------
    def _encode_impl(self, variables, image):
        return self.encoder.apply(variables["encoder"], image)

    def _decode_impl(self, variables, embedding, points, labels):
        sparse = self.prompt_encoder.apply(
            variables["prompt"], points, labels,
            method=PromptEncoder.encode_points,
        )
        pe_dense = self.prompt_encoder.apply(
            variables["prompt"], method=PromptEncoder.dense_pe
        )
        dense = self.prompt_encoder.apply(
            variables["prompt"], points.shape[0],
            method=PromptEncoder.no_mask_dense,
        )
        emb = jnp.broadcast_to(
            embedding, (points.shape[0],) + embedding.shape[1:]
        )
        return self.decoder.apply(
            variables["decoder"], emb, pe_dense, sparse, dense
        )

    def encode(self, image: jax.Array) -> jax.Array:
        """(1, S, S, 3) -> (1, h, w, 256)."""
        return self._encode(self.variables, image)

    def decode_points(self, embedding: jax.Array, points: jax.Array):
        """points: (B, 1, 2) in input coords -> ((B, 4, 4h, 4w) mask
        logits, (B, 4) iou predictions)."""
        labels = jnp.ones(points.shape[:2], jnp.int32)
        return self._decode_impl(self.variables, embedding, points, labels)
