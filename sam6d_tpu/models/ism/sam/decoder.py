"""SAM mask decoder: two-way transformer + hypernetwork mask heads.

Re-derivation of reference segment_anything/modeling/mask_decoder.py (:16)
and modeling/transformer.py (TwoWayTransformer :16): learned iou/mask
tokens attend to the image embedding through two two-way blocks, masks are
produced by dotting hypernetwork-generated weights with a 4x-upscaled
embedding, and an MLP head predicts per-mask IoU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from sam6d_tpu.models.ism.sam.encoder import LayerNorm2d


class MLP(nn.Module):
    hidden_dim: int
    out_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layers_{i}")(x))
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     name=f"layers_{self.num_layers - 1}")(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class CrossAttention(nn.Module):
    """Attention with optional channel downsampling (SAM transformer)."""

    embed_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embed_dim // self.downsample_rate
        H = self.num_heads
        hd = internal // H
        qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)
        qp = qp.reshape(*qp.shape[:-1], H, hd)
        kp = kp.reshape(*kp.shape[:-1], H, hd)
        vp = vp.reshape(*vp.shape[:-1], H, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qp, kp) / jnp.sqrt(hd).astype(
            q.dtype
        )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vp)
        out = out.reshape(*out.shape[:-2], internal)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        # Self attention on tokens.
        if self.skip_first_layer_pe:
            queries = CrossAttention(self.embed_dim, self.num_heads,
                                     dtype=self.dtype, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = CrossAttention(self.embed_dim, self.num_heads,
                                      dtype=self.dtype, name="self_attn")(
                q, q, queries)
            queries = queries + attn_out
        queries = nn.LayerNorm(dtype=self.dtype, name="norm1")(queries)

        # Cross attention tokens -> image.
        attn_out = CrossAttention(
            self.embed_dim, self.num_heads, downsample_rate=2,
            dtype=self.dtype, name="cross_attn_token_to_image",
        )(queries + query_pe, keys + key_pe, keys)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            queries + attn_out)

        # MLP.
        mlp_out = nn.Dense(self.embed_dim, dtype=self.dtype, name="mlp_lin2")(
            nn.relu(nn.Dense(self.mlp_dim, dtype=self.dtype,
                             name="mlp_lin1")(queries)))
        queries = nn.LayerNorm(dtype=self.dtype, name="norm3")(
            queries + mlp_out)

        # Cross attention image -> tokens.
        attn_out = CrossAttention(
            self.embed_dim, self.num_heads, downsample_rate=2,
            dtype=self.dtype, name="cross_attn_image_to_token",
        )(keys + key_pe, queries + query_pe, queries)
        keys = nn.LayerNorm(dtype=self.dtype, name="norm4")(keys + attn_out)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, h, w, C); point_embedding (B, N, C)."""
        B, h, w, C = image_embedding.shape
        keys = image_embedding.reshape(B, h * w, C)
        key_pe = jnp.broadcast_to(image_pe.reshape(1, h * w, C),
                                  (B, h * w, C))
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embed_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)

        # Final token-to-image attention.
        attn_out = CrossAttention(
            self.embed_dim, self.num_heads, downsample_rate=2,
            dtype=self.dtype, name="final_attn_token_to_image",
        )(queries + point_embedding, keys + key_pe, keys)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm_final_attn")(
            queries + attn_out)
        return queries, keys


class MaskDecoder(nn.Module):
    embed_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt):
        """Predict masks.

        Args:
          image_embeddings: (B, h, w, C) encoder output.
          image_pe: (1, h, w, C) dense positional encoding.
          sparse_prompt: (B, Np, C) point embeddings.
          dense_prompt: (B, h, w, C).

        Returns:
          (masks, iou_pred): (B, 1+num_multimask, 4h, 4w) logits and
          (B, 1+num_multimask) predicted IoUs.
        """
        B = sparse_prompt.shape[0]
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.embed_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_mask_tokens, self.embed_dim))
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None],
                              (B, 1 + num_mask_tokens, self.embed_dim)),
             sparse_prompt],
            axis=1,
        )

        src = image_embeddings + dense_prompt
        hs, keys = TwoWayTransformer(dtype=self.dtype, name="transformer")(
            src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens]

        h, w = image_embeddings.shape[1:3]
        src = keys.reshape(B, h, w, self.embed_dim)
        x = nn.ConvTranspose(
            self.embed_dim // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="output_upscaling_0",
        )(src)
        x = LayerNorm2d(self.embed_dim // 4, name="output_upscaling_1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.ConvTranspose(
            self.embed_dim // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="output_upscaling_3",
        )(x)
        x = nn.gelu(x, approximate=False)  # (B, 4h, 4w, C/8)

        hyper = jnp.stack(
            [
                MLP(self.embed_dim, self.embed_dim // 8, 3, dtype=self.dtype,
                    name=f"output_hypernetworks_mlps_{i}")(
                    mask_tokens_out[:, i])
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # (B, T, C/8)
        masks = jnp.einsum("btc,byxc->btyx", hyper, x)
        iou_pred = MLP(
            self.iou_head_hidden_dim, num_mask_tokens, self.iou_head_depth,
            dtype=self.dtype, name="iou_prediction_head",
        )(iou_token_out)
        return masks, iou_pred
