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


class ConvTranspose2x2(nn.Module):
    """ConvTranspose(kernel=2, stride=2) as a reshape + matmul.

    stride == kernel means the output 2x2 blocks never overlap, so the
    op is a pointwise linear map C -> 2*2*O followed by pixel-shuffle —
    XLA's conv_general_dilated lowering of the same op ran at ~1% MXU
    (95 ms of the 217 ms AMG decode, measured).  Kernel layout is
    (2, 2, C_in, C_out) with TORCH ConvTranspose2d semantics
    (out[2y+dy, 2x+dx] uses K[dy, dx] — no spatial flip, unlike flax
    nn.ConvTranspose); tools/convert_weights._conv_transpose_2x2 maps
    checkpoints accordingly.

    Flat block-channel layout: the output keeps each 2x2 block
    FLATTENED into the channel axis — (..., 2*2*features) with nesting
    (dy, dx, feature) — instead of shuffling pixels into place.  A
    pixel-shuffle between the two upscaling stages materialized 40+ ms
    of 6-D layout copies per AMG decode, and exposing (2, 2, O)
    trailing dims produced lane-wasteful T(4,128) tilings; flat
    channels keep every intermediate on full 128-lane rows.  Every op
    in the decoder tail is pointwise over blocks, so the single pixel
    shuffle happens at the very end (MaskDecoder `masks` reshape).
    """

    features: int
    dtype: Any = jnp.float32
    # Optional: with a trailing block axis (..., G, C), fold the
    # per-block matmul into ONE block-diagonal (G*C, G*4*O) contraction.
    # Measured NEUTRAL on the AMG decode's second upscaling stage (the
    # fusion is gelu/traffic-bound, not MAC-bound) — kept for shapes
    # where a K=C contraction genuinely starves the MXU.
    fuse_groups: int = 0

    @nn.compact
    def __call__(self, x):
        """x: (..., C) -> (..., 2*2*features), channel nesting
        (dy, dx, feature) — or, with fuse_groups=G, (..., G, C) ->
        (..., G, 2*2*features); caller interprets the leading ... as
        pixel (or block) coordinates."""
        C = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, C, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(
            C, 4 * self.features
        ).astype(self.dtype)
        if self.fuse_groups:
            G = self.fuse_groups
            assert x.shape[-2] == G, (x.shape, G)
            from jax.scipy.linalg import block_diag

            k_bd = block_diag(*([k] * G))  # (G*C, G*4*O)
            y = x.astype(self.dtype).reshape(*x.shape[:-2], G * C) @ k_bd
            y = y.reshape(*x.shape[:-1], 4 * self.features)
        else:
            y = x.astype(self.dtype) @ k  # (..., 2*2*O)
        return y + jnp.tile(bias, 4).astype(self.dtype)


class CrossAttention(nn.Module):
    """Attention with optional channel downsampling (SAM transformer).

    The q/k/v sides may carry DIFFERENT batch sizes (1 vs B): a
    singleton batch is contracted shared instead of broadcast, so AMG's
    per-prompt decode projects the (identical-across-prompts) initial
    image features ONCE per frame, not once per prompt (the image-side
    k/v/q projections were ~30% of the per-prompt transformer FLOPs)."""

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
        scale = jnp.sqrt(hd).astype(q.dtype)
        if qp.shape[0] == kp.shape[0]:
            attn = jnp.einsum("bnhd,bmhd->bhnm", qp, kp) / scale
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, vp)
        elif kp.shape[0] == 1:  # shared keys/values, per-batch queries
            attn = jnp.einsum("bnhd,mhd->bhnm", qp, kp[0]) / scale
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,mhd->bnhd", attn, vp[0])
        else:  # shared queries, per-batch keys/values
            assert qp.shape[0] == 1, (qp.shape, kp.shape)
            attn = jnp.einsum("nhd,bmhd->bhnm", qp[0], kp) / scale
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
        """image_embedding/image_pe: (Bk, h, w, C) with Bk in {1, B};
        point_embedding (B, N, C).  Bk=1 runs block-1's image-side
        projections ONCE (shared across prompts — see CrossAttention);
        keys broadcast to B at the first image-update."""
        Bk, h, w, C = image_embedding.shape
        keys = image_embedding.reshape(Bk, h * w, C)
        key_pe = image_pe.reshape(1, h * w, C)
        if Bk > 1:
            key_pe = jnp.broadcast_to(key_pe, (Bk, h * w, C))
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

    def setup(self):
        # setup-style (not @nn.compact) so transformer_forward / tail
        # can be called separately with shared params: the AMG path
        # runs the transformer for every prompt but replaces the tail
        # with the fused Pallas statistics kernel
        # (ops/pallas/decode_tail.py), recomputing full logits only for
        # the kept candidates.  Attribute names == round-2 param names
        # (checkpoint compat).
        T = self.num_multimask_outputs + 1
        self.iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (T, self.embed_dim)
        )
        self.transformer = TwoWayTransformer(dtype=self.dtype)
        c4, c8 = self.embed_dim // 4, self.embed_dim // 8
        self.output_upscaling_0 = ConvTranspose2x2(c4, dtype=self.dtype)
        self.output_upscaling_1 = LayerNorm2d(c4)
        self.output_upscaling_3 = ConvTranspose2x2(c8, dtype=self.dtype)
        self.output_hypernetworks_mlps = [
            MLP(self.embed_dim, c8, 3, dtype=self.dtype) for _ in range(T)
        ]
        self.iou_prediction_head = MLP(
            self.iou_head_hidden_dim, T, self.iou_head_depth,
            dtype=self.dtype,
        )

    def transformer_forward(
        self, image_embeddings, image_pe, sparse_prompt, dense_prompt
    ):
        """Everything up to (but excluding) the upscaling tail.

        Returns:
          keys: (B, N, C) per-prompt image features (N = h*w).
          hyper: (B, T, C/8) hypernetwork weight vectors per mask token.
          iou_pred: (B, T).
        """
        B = sparse_prompt.shape[0]
        T = self.num_multimask_outputs + 1
        output_tokens = jnp.concatenate(
            [self.iou_token, self.mask_tokens], axis=0
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None],
                              (B, 1 + T, self.embed_dim)),
             sparse_prompt],
            axis=1,
        )
        src = image_embeddings + dense_prompt
        hs, keys = self.transformer(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + T]
        hyper = jnp.stack(
            [
                self.output_hypernetworks_mlps[i](mask_tokens_out[:, i])
                for i in range(T)
            ],
            axis=1,
        )  # (B, T, C/8)
        iou_pred = self.iou_prediction_head(iou_token_out)
        return keys, hyper, iou_pred

    def tail(self, keys, hyper, h: int, w: int):
        """Upscaling tail + hypernetwork contraction -> mask logits.

        keys: (B, N=h*w, C); hyper: (B, T, C/8) -> (B, T, 4h, 4w).
        """
        B, N, _ = keys.shape
        T = hyper.shape[1]
        c4, c8 = self.embed_dim // 4, self.embed_dim // 8
        # Flat block-channel layout throughout (see ConvTranspose2x2):
        # channels carry the 2x2 block structure and every intermediate
        # stays on full 128-lane rows; the one pixel shuffle is the
        # final masks transpose.
        x = self.output_upscaling_0(keys)  # (B, N, 4*C/4), nest (a, d, c)
        x = self.output_upscaling_1(x.reshape(B, N, 4, c4))
        x = nn.gelu(x, approximate=False)
        x = self.output_upscaling_3(x)  # (B, N, 4, 4*C/8), (a,d)(e,f,c)
        x = nn.gelu(x, approximate=False)
        # Contract the hypernetwork weights against the per-block
        # channels, then shuffle once: output pixel (4y+2a+e, 4x+2d+f)
        # <- stage-1 block dims (a, d), stage-2 block dims (e, f).
        blocks = x.reshape(B, N, 16, c8)  # block index j = (a, d, e, f)
        masks = jnp.einsum("btc,bqjc->btqj", hyper, blocks)
        masks = masks.reshape(B, T, h, w, 2, 2, 2, 2)
        masks = masks.transpose(0, 1, 2, 4, 6, 3, 5, 7).reshape(
            B, T, 4 * h, 4 * w
        )
        return masks

    def tail_kernel_params(self):
        """The tail's parameters in the fused-kernel layout
        (ops/pallas/decode_tail.decode_tail_stats): stage kernels
        flattened (C, 4*O) with torch ConvTranspose2d block nesting,
        biases and LN params tiled 4x to match flat columns."""
        c4 = self.embed_dim // 4
        k1 = self.output_upscaling_0.variables["params"]["kernel"]
        b1 = self.output_upscaling_0.variables["params"]["bias"]
        k2 = self.output_upscaling_3.variables["params"]["kernel"]
        b2 = self.output_upscaling_3.variables["params"]["bias"]
        lns = self.output_upscaling_1.variables["params"]["weight"]
        lnb = self.output_upscaling_1.variables["params"]["bias"]
        w1 = jnp.transpose(k1, (2, 0, 1, 3)).reshape(self.embed_dim, 4 * c4)
        w2 = jnp.transpose(k2, (2, 0, 1, 3)).reshape(c4, 4 * (c4 // 2))
        return dict(
            w1=w1, b1=jnp.tile(b1, 4), ln_scale=jnp.tile(lns, 4),
            ln_bias=jnp.tile(lnb, 4), w2=w2, b2=jnp.tile(b2, 4),
        )

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
        h, w = image_embeddings.shape[1:3]
        keys, hyper, iou_pred = self.transformer_forward(
            image_embeddings, image_pe, sparse_prompt, dense_prompt
        )
        masks = self.tail(keys, hyper, h, w)
        return masks, iou_pred
