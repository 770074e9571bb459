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
        self.dtype = dtype
        self.input_size = img_size
        self.variables: dict[str, Any] | None = None
        self._encode = jax.jit(self._encode_impl)
        self._decode = jax.jit(self._decode_impl)

    def init(self, key, image_size: int | None = None):
        k1, k2, k3 = jax.random.split(key, 3)
        s = image_size or self.input_size
        enc_vars = self.encoder.init(k1, jnp.zeros((1, s, s, 3)))
        eh, ew = self.prompt_encoder.image_embedding_size
        pe_vars = self.prompt_encoder.init(
            k2, jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32),
            jnp.zeros((1, 4)), jnp.zeros((1, 4 * eh, 4 * ew, 1)),
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

    def _prompt_inputs(self, variables, embedding, points, labels):
        sparse = self.prompt_encoder.apply(
            variables["prompt"], points, labels,
            method=PromptEncoder.encode_points,
        )
        pe_dense = self.prompt_encoder.apply(
            variables["prompt"], method=PromptEncoder.dense_pe
        )
        # Image side stays at batch 1: the decoder transformer keeps the
        # initial keys shared across prompts and projects them once
        # (decoder.py CrossAttention singleton-batch contraction),
        # broadcasting to the prompt batch only at the first
        # image-update.
        dense = self.prompt_encoder.apply(
            variables["prompt"], 1, method=PromptEncoder.no_mask_dense,
        )
        return embedding, pe_dense, sparse, dense

    def _decode_impl(self, variables, embedding, points, labels):
        emb, pe_dense, sparse, dense = self._prompt_inputs(
            variables, embedding, points, labels
        )
        return self.decoder.apply(
            variables["decoder"], emb, pe_dense, sparse, dense
        )

    def _decode_pre_impl(self, variables, embedding, points, labels):
        """Transformer-only decode: (keys, hyper, iou) per prompt — the
        upscale tail is replaced by the fused stats kernel in AMG
        (ops/pallas/decode_tail.py)."""
        from sam6d_tpu.models.ism.sam.decoder import MaskDecoder

        emb, pe_dense, sparse, dense = self._prompt_inputs(
            variables, embedding, points, labels
        )
        return self.decoder.apply(
            variables["decoder"], emb, pe_dense, sparse, dense,
            method=MaskDecoder.transformer_forward,
        )

    def encode(self, image: jax.Array) -> jax.Array:
        """(1, S, S, 3) -> (1, h, w, 256)."""
        return self._encode(self.variables, image)

    def decode_points(self, embedding: jax.Array, points: jax.Array):
        """points: (B, 1, 2) in input coords -> ((B, 4, 4h, 4w) mask
        logits, (B, 4) iou predictions)."""
        labels = jnp.ones(points.shape[:2], jnp.int32)
        return self._decode_impl(self.variables, embedding, points, labels)

    def decode_prompts(self, embedding, points, labels, boxes=None,
                       masks=None):
        """SamPredictor-style decode with the full prompt set: points
        (B, N, 2) + labels (B, N), optional boxes (B, 4) xyxy, optional
        low-res mask logits (B, 4h, 4w, 1) — reference predictor.py
        predict_torch.  Returns ((B, 4, 4h, 4w) logits, (B, 4) ious)."""
        sparse, dense, pe_dense = self.prompt_encoder.apply(
            self.variables["prompt"], points, labels, boxes, masks
        )
        # embedding stays (1, h, w, C); the decoder broadcasts (and
        # shares block-1 image projections) internally.
        return self.decoder.apply(
            self.variables["decoder"], embedding, pe_dense, sparse, dense
        )

    def decode_points_pre(self, embedding: jax.Array, points: jax.Array):
        """Transformer-only decode for the fused AMG tail: points
        (B, 1, 2) -> (keys (B, N, 256), hyper (B, 4, 32), iou (B, 4))."""
        labels = jnp.ones(points.shape[:2], jnp.int32)
        return self._decode_pre_impl(
            self.variables, embedding, points, labels
        )

    def decode_tail(self, keys: jax.Array, hyper: jax.Array, h: int, w: int):
        """Recompute mask logits from transformer outputs for a (small)
        candidate set: keys (K, N, 256), hyper (K, T, 32) ->
        (K, T, 4h, 4w)."""
        from sam6d_tpu.models.ism.sam.decoder import MaskDecoder

        return self.decoder.apply(
            self.variables["decoder"], keys, hyper, h, w,
            method=MaskDecoder.tail,
        )

    def decoder_tail_params(self):
        """Tail params in the fused-kernel layout (decode_tail_stats)."""
        from sam6d_tpu.models.ism.sam.decoder import MaskDecoder

        return self.decoder.apply(
            self.variables["decoder"],
            method=MaskDecoder.tail_kernel_params,
        )
