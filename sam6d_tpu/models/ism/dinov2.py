"""DINOv2 vision transformer + descriptor heads for proposal/template
matching.

Re-derivation of reference Instance_Segmentation_Model/model/dinov2.py
(CustomDINOv2 :115-327) and model/vision_transformer.py (DINOv2 ViT with
LayerScale blocks).  The reference replaced the torch forward with a
compiled OpenVINO IR with fixed chunk size 42 (dinov2.py:131-135,292-297);
here the whole descriptor pass is one jitted flax apply over a static
proposal batch — chunking is just a leading batch dim.

Weight layout maps 1:1 from the dinov2 torch checkpoints
(patch_embed.proj, cls_token, pos_embed, blocks.N.{norm1, attn.qkv,
attn.proj, ls1.gamma, norm2, mlp.fc1, mlp.fc2, ls2.gamma}, norm).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from sam6d_tpu.config import DescriptorConfig
from sam6d_tpu.models.vit import Attention, MlpBlock, PatchEmbed
from sam6d_tpu.ops.geometry import l2_normalize


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        # Cast the f32 param, not the activations: an f32 gamma would
        # promote the residual stream of every block to f32 (measured
        # as per-block converts + f32 residual adds).
        return x * gamma.astype(x.dtype)


class DinoBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        # use_flash measured SLOWER here (234 -> 435 ms for the Q=128
        # descriptor pass): at N=257 the materialized attention is a
        # small fraction of the matmul-bound forward, while the flash
        # grid degenerates to 6k tiny programs per layer.
        y = Attention(self.dim, self.num_heads, dtype=self.dtype,
                      name="attn")(y)
        x = x + LayerScale(self.dim, name="ls1")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MlpBlock(int(self.dim * self.mlp_ratio), self.dim,
                     dtype=self.dtype, name="mlp")(y)
        x = x + LayerScale(self.dim, name="ls2")(y)
        return x


class DinoViT(nn.Module):
    """DINOv2-style ViT returning (cls_token, patch_tokens)."""

    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) -> ((B, D) cls, (B, N, D) patches)."""
        B = x.shape[0]
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                       name="patch_embed")(x)
        x = x.reshape(B, -1, self.embed_dim)
        n_patches = x.shape[1]

        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_patches + 1, self.embed_dim),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)).astype(
                x.dtype), x], axis=1
        )
        # Cast the add back so an f32 cls/pos param cannot promote the
        # whole residual stream out of compute dtype.
        x = (x + pos_embed).astype(self.dtype)
        for i in range(self.depth):
            x = DinoBlock(
                self.embed_dim, self.num_heads, self.mlp_ratio,
                dtype=self.dtype, name=f"blocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 0, :], x[:, 1:, :]


def patch_validity_mask(
    masks: jax.Array, patch_size: int, thresh: float = 0.5
) -> jax.Array:
    """Per-patch validity from a pixel mask via average pooling
    (reference dinov2.py:267)."""
    B, H, W = masks.shape
    hp, wp = H // patch_size, W // patch_size
    pooled = masks[:, : hp * patch_size, : wp * patch_size].reshape(
        B, hp, patch_size, wp, patch_size
    ).mean(axis=(2, 4))
    return (pooled > thresh).reshape(B, hp * wp)


class DescriptorModel:
    """CLS (semantic) and masked-patch (appearance) descriptor heads."""

    def __init__(self, cfg: DescriptorConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.vit = DinoViT(
            patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim,
            depth=cfg.depth,
            num_heads=cfg.num_heads,
            dtype=dtype,
        )

    def init(self, key, batch_size: int = 2):
        s = self.cfg.image_size
        dummy = jnp.zeros((batch_size, s, s, 3), jnp.float32)
        return self.vit.init(key, dummy)

    def compute_features(self, variables, images: jax.Array) -> jax.Array:
        """images: (Q, S, S, 3) -> (Q, D) CLS descriptors."""
        cls, _ = self.vit.apply(variables, images)
        return cls

    def compute_masked_patch_features(
        self, variables, images: jax.Array, masks: jax.Array
    ) -> jax.Array:
        """(Q, S, S, 3) + (Q, S, S) -> (Q, Np, D) normalized patch
        descriptors zeroed at invalid patches (reference dinov2.py:257-271)."""
        _, patches = self.vit.apply(variables, images)
        return self._mask_patches(patches, masks)

    def compute_cls_and_patch(
        self, variables, images: jax.Array, masks: jax.Array
    ):
        """One ViT forward for both descriptor heads.

        The reference runs its compiled DINOv2 IR twice per proposal
        batch — once for CLS features (dinov2.py:176-189) and once for
        patch tokens (:257-271) — because the IR exposes one output set
        per call.  A single jitted apply yields both, halving the
        descriptor cost (the ISM stage's second-largest kernel).
        """
        cls, patches = self.vit.apply(variables, images)
        return cls, self._mask_patches(patches, masks)

    def _mask_patches(self, patches: jax.Array, masks: jax.Array) -> jax.Array:
        valid = patch_validity_mask(
            masks, self.cfg.patch_size, self.cfg.validpatch_thresh
        )
        return l2_normalize(patches) * valid[..., None]
