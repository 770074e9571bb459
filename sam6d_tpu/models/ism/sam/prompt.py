"""SAM prompt encoder (point prompts only — the AMG path).

Re-derivation of reference segment_anything/modeling/prompt_encoder.py
(:16) restricted to what automatic mask generation uses: random-Fourier
positional encoding of point coordinates plus learned point-type
embeddings, and the dense no-mask embedding.
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


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: tuple[int, int] = (64, 64)
    input_image_size: tuple[int, int] = (1024, 1024)
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

    def encode_points(self, points: jax.Array, labels: jax.Array) -> jax.Array:
        """points: (B, N, 2) pixel coords; labels: (B, N) in {-1, 0, 1}.

        Returns sparse embeddings (B, N+1, D) (a padding "not a point"
        appended, as SAM does when no box prompt is given).
        """
        B, N, _ = points.shape
        pad_point = jnp.zeros((B, 1, 2), points.dtype)
        pad_label = -jnp.ones((B, 1), labels.dtype)
        points = jnp.concatenate([points + 0.5, pad_point], axis=1)
        labels = jnp.concatenate([labels, pad_label], axis=1)

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

    def __call__(self, points, labels):
        return self.encode_points(points, labels), self.dense_pe()
