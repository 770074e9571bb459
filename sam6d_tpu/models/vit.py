"""Vision Transformer backbone (flax), timm/MAE-compatible layout.

Used by the PEM feature extractor (reference
Pose_Estimation_Model/model/feature_extraction.py:17-35 builds a
timm VisionTransformer and taps 4 intermediate blocks).  Weight layout is
kept mappable 1:1 from the MAE checkpoints (patch_embed.proj, cls_token,
pos_embed, blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2},
norm) so the torch->flax converter in tools/convert_weights.py is a pure
renaming + transpose.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding via reshape + matmul.

    Equivalent to Conv(kernel=stride=patch) but avoids XLA's convolution
    lowering: a C_in=3 conv picks a memory layout that slows every
    downstream op in the network (~2x per ViT block, measured on the SAM
    encoder — see BASELINE.md).  The kernel param keeps the (p, p, C, D)
    conv shape so torch checkpoints convert unchanged.
    """

    embed_dim: int
    patch_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img):
        B, H, W, C = img.shape
        p = self.patch_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, C, self.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        # (A single-einsum "bipjqc,pqcd->bijd" formulation without the
        # explicit transpose measured IDENTICAL on the v5e at ViT-L/14
        # Q=128 — XLA lowers both the same way; tools/
        # bisect_dino_patchembed.py.)
        x = img.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // p, W // p,
                                                  p * p * C)
        k = kernel.reshape(p * p * C, self.embed_dim).astype(self.dtype)
        return x.astype(self.dtype) @ k + bias.astype(self.dtype)


class MlpBlock(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Standard ViT attention with fused qkv projection (timm layout).

    use_flash: stream k/v through the fused online-softmax Pallas
    kernel instead of materializing the (B, H, N, N) attention matrix.
    Only worth it for LONG sequences: at the DINOv2 descriptor shape
    (N=257, 2048 batch-heads) it measured 2x SLOWER than the XLA path
    (the grid degenerates into thousands of tiny programs), so it is
    off by default; falls back to the XLA formulation off-TPU.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
        if self.use_flash and jax.default_backend() == "tpu":
            from sam6d_tpu.ops.pallas.flash_rpe import flash_attention

            def heads_first(a):
                return a.transpose(0, 2, 1, 3).reshape(
                    B * self.num_heads, N, head_dim
                )

            out = flash_attention(
                heads_first(q), heads_first(k), heads_first(v),
                block_q=128, block_k=128,
            )
            out = out.reshape(B, self.num_heads, N, head_dim).transpose(
                0, 2, 1, 3
            ).reshape(B, N, C)
        else:
            # Logits + softmax in f32: the softmax backward
            # p*(dy - <p, dy>) is a cancellation of large correlated
            # terms; with sharpened (peaked) attention the bf16 rounding
            # residue dominates the true gradient (round-4 cliff
            # forensics, tools/diag_cliff_grads.py).  The prob@v matmul
            # returns to compute dtype.
            attn = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k,
                preferred_element_type=jnp.float32,
            ) / np.sqrt(head_dim)
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # LayerNorm stats and their BACKWARD run in f32 (dtype=f32 on an
        # f32-cast input), output cast back to compute dtype.  The LN
        # backward is a small difference of large correlated terms
        # (dy - mean(dy) - x_hat*mean(dy*x_hat)); in bf16 the rounding
        # residue grows with training sharpness until it dominates —
        # measured on the round-4 cliff state: identical forward loss,
        # grad norm 2295 (bf16 LN) vs 22 (f32), 97% of it under rgb_net
        # (tools/diag_cliff_grads.py).  LN is VPU-cheap; the residual
        # stream and every matmul stay bf16.
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        x = x + Attention(self.dim, self.num_heads, self.qkv_bias,
                          dtype=self.dtype, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        x = x + MlpBlock(int(self.dim * self.mlp_ratio), self.dim,
                         dtype=self.dtype, name="mlp")(y)
        return x


class ViT(nn.Module):
    """ViT encoder returning final-norm'd intermediate block outputs.

    Mirrors reference ViT.forward (feature_extraction.py:21-35): collects
    the outputs of blocks [d-1, d-n-1, d-2n-1, d-3n-1] (n = d//4), each
    passed through the shared final LayerNorm, in ascending block order.
    """

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    img_size: int = 224
    dtype: Any = jnp.float32
    # Rematerialize each block on the backward pass (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for O(depth) less live activation
    # memory — the standard long-training memory lever on TPU.
    remat: bool = False

    @nn.compact
    def __call__(self, x, out_indices: Sequence[int] | None = None):
        """x: (B, H, W, 3) channel-last image batch.

        Returns:
          list of (B, 1 + N_patches, D) taps (ascending block order).
        """
        B = x.shape[0]
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                       name="patch_embed")(x)
        x = x.reshape(B, -1, self.embed_dim)  # (B, N, D) row-major patches
        n_patches = x.shape[1]

        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_patches + 1, self.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)), x],
                            axis=1)
        # Cast the add back: the f32 pos_embed param must not promote
        # the whole residual stream out of compute dtype (measured as
        # f32 residual adds in every block otherwise).
        x = (x + pos_embed).astype(self.dtype)

        if out_indices is None:
            n = self.depth // 4
            out_indices = sorted(self.depth - 1 - i * n for i in range(4))

        # f32 final norm for the same backward-cancellation reason as
        # the in-block norms (see ViTBlock).
        final_norm = nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.float32, name="norm"
        )
        Block = nn.remat(ViTBlock) if self.remat else ViTBlock
        taps = []
        for i in range(self.depth):
            x = Block(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.qkv_bias,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
            if i in out_indices:
                taps.append(
                    final_norm(x.astype(jnp.float32)).astype(self.dtype)
                )
        return taps
