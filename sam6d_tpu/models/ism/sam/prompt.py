"""SAM prompt encoder: point, box, and dense-mask prompts.

Re-derivation of reference segment_anything/modeling/prompt_encoder.py
(:16): random-Fourier positional encoding of point coordinates plus
learned point-type embeddings, box-corner embeddings, the dense no-mask
embedding, and the mask-downscaling conv stack (Conv 2x2/s2 -> LN ->
GELU twice, then 1x1) for SamPredictor-style dense mask prompts.  The
strided convs are written as extract-2x2-blocks + matmul (a conv with
C_in=1 poisons downstream layouts — see sam/encoder.py PatchEmbed).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class PositionEmbeddingRandom(nn.Module):
    """Random spatial-frequency Fourier features."""

    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords_normalized: jax.Array) -> jax.Array:
        """coords in [0, 1]^2, (..., 2) -> (..., 2*num_pos_feats)."""
        gaussian = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: self.scale * jax.random.normal(key, shape),
            (2, self.num_pos_feats),
        )
        coords = 2.0 * coords_normalized - 1.0
        coords = coords @ gaussian
        coords = 2.0 * np.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


class Conv2x2Down(nn.Module):
    """Conv2d(kernel=2, stride=2) as extract-blocks + matmul.

    Non-overlapping 2x2 windows: the op is a pointwise linear map
    4*C -> features on the 2x-downsampled grid.  Kernel layout
    (2, 2, C_in, C_out) (torch Conv2d transposed by the converter)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2, 2, C, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xb = x.reshape(B, H // 2, 2, W // 2, 2, C)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, H // 2, W // 2, 4 * C
        )  # channel nesting (dy, dx, c)
        k = kernel.reshape(4 * C, self.features).astype(self.dtype)
        return xb.astype(self.dtype) @ k + bias.astype(self.dtype)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: tuple[int, int] = (64, 64)
    input_image_size: tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 0: negative point, 1: positive point, 2/3: box corners.
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0),
                       (1, self.embed_dim))
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (1, self.embed_dim),
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        # Dense mask-prompt downscaling (reference prompt_encoder.py
        # mask_downscaling Sequential indices 0/1/3/4/6).
        from sam6d_tpu.models.ism.sam.encoder import LayerNorm2d

        c = self.mask_in_chans
        self.mask_downscaling_0 = Conv2x2Down(c // 4, dtype=self.dtype)
        self.mask_downscaling_1 = LayerNorm2d(c // 4)
        self.mask_downscaling_3 = Conv2x2Down(c, dtype=self.dtype)
        self.mask_downscaling_4 = LayerNorm2d(c)
        self.mask_downscaling_6 = nn.Dense(self.embed_dim, dtype=self.dtype)

    def encode_points(self, points: jax.Array, labels: jax.Array,
                      pad: bool = True) -> jax.Array:
        """points: (B, N, 2) pixel coords; labels: (B, N) in {-1, 0, 1}.

        Returns sparse embeddings (B, N+1, D) (a padding "not a point"
        appended, as SAM does when no box prompt is given; pad=False
        when boxes accompany the points, reference prompt_encoder
        _embed_points pad argument).
        """
        B, N, _ = points.shape
        if pad:
            pad_point = jnp.zeros((B, 1, 2), points.dtype)
            pad_label = -jnp.ones((B, 1), labels.dtype)
            points = jnp.concatenate([points + 0.5, pad_point], axis=1)
            labels = jnp.concatenate([labels, pad_label], axis=1)
        else:
            points = points + 0.5

        coords = points / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]],
            points.dtype,
        )
        pe = self.pe_layer(coords)
        pe = jnp.where((labels == -1)[..., None], 0.0, pe)
        emb = (
            pe
            + (labels == -1)[..., None] * self.not_a_point_embed
            + (labels == 0)[..., None] * self.point_embeddings[0]
            + (labels == 1)[..., None] * self.point_embeddings[1]
        )
        return emb

    def dense_pe(self) -> jax.Array:
        """(1, h, w, D) positional encoding of the image-embedding grid."""
        h, w = self.image_embedding_size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
        )  # (h, w, 2) with (x, y)
        return self.pe_layer(grid)[None]

    def no_mask_dense(self, B: int) -> jax.Array:
        h, w = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1), (B, h, w, self.embed_dim)
        )

    def encode_boxes(self, boxes: jax.Array) -> jax.Array:
        """boxes: (B, 4) xyxy pixel coords -> (B, 2, D) corner
        embeddings (reference prompt_encoder._embed_boxes)."""
        coords = boxes.reshape(-1, 2, 2) + 0.5
        coords = coords / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]],
            coords.dtype,
        )
        pe = self.pe_layer(coords)  # (B, 2, D)
        corner = jnp.concatenate(
            [self.point_embeddings[2], self.point_embeddings[3]], axis=0
        )  # (2, D)
        return pe + corner[None]

    def encode_masks(self, masks: jax.Array) -> jax.Array:
        """masks: (B, 4h, 4w, 1) low-res mask logits -> (B, h, w, D)
        dense embeddings (reference mask_downscaling: Conv2x2/s2 -> LN
        -> GELU -> Conv2x2/s2 -> LN -> GELU -> 1x1 conv)."""
        x = self.mask_downscaling_0(masks)
        x = self.mask_downscaling_1(x)
        x = nn.gelu(x, approximate=False)
        x = self.mask_downscaling_3(x)
        x = self.mask_downscaling_4(x)
        x = nn.gelu(x, approximate=False)
        return self.mask_downscaling_6(x)

    def __call__(self, points, labels, boxes=None, masks=None):
        """Full prompt assembly (reference PromptEncoder.forward):
        sparse = points (padded iff no boxes) ++ box corners;
        dense = downscaled mask embedding, or the no-mask embedding."""
        sparse = self.encode_points(points, labels, pad=boxes is None)
        if boxes is not None:
            sparse = jnp.concatenate(
                [sparse, self.encode_boxes(boxes)], axis=1
            )
        if masks is not None:
            dense = self.encode_masks(masks)
        else:
            # batch-1: the decoder broadcasts (and block-1 shares the
            # image-side projections when the whole image side is
            # singleton — see sam/decoder.py CrossAttention).
            dense = self.no_mask_dense(1)
        return sparse, dense, self.dense_pe()
