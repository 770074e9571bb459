"""SAM image encoder: ViT with windowed attention + decomposed relative
position bias.

Re-derivation of reference segment_anything/modeling/image_encoder.py
(ImageEncoderViT :17, Block :119, Attention :185, add_decomposed_rel_pos
:325): patchify to a (H/16, W/16) token grid (no cls token), absolute pos
embed, transformer blocks that attend within 14x14 windows except at 4
global blocks, then a conv neck to 256 channels.

Weight layout maps 1:1 from the SAM checkpoints (patch_embed.proj,
pos_embed, blocks.N.{norm1, attn.{qkv,proj,rel_pos_h,rel_pos_w}, norm2,
mlp.{lin1,lin2}}, neck.{0,1,2,3}).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sam6d_tpu.models.vit import PatchEmbed  # noqa: F401  (shared impl)


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Select relative positional embeddings for q/k sizes.

    rel_pos: (2*max_size - 1, head_dim) table; returns (q_size, k_size, C).
    Assumes q_size == k_size (always true here), so no interpolation.
    """
    coords = (
        np.arange(q_size)[:, None] - np.arange(k_size)[None, :] + (k_size - 1)
    )
    return rel_pos[jnp.asarray(coords)]


class WindowAttention(nn.Module):
    """Attention over a (h, w) token grid with decomposed rel-pos bias,
    optionally restricted to window_size x window_size windows.

    On TPU the softmax(qk+bias)v composite runs as the fused Pallas
    kernel (ops/pallas/flash_rpe.py) — the unfused XLA path materializes
    the (H, N, N) attention matrix, which at the 64x64 global blocks is
    a ~27 ms HBM-bound tensor per block. `flash=None` auto-selects by
    backend; tests force either path.

    Windowing lives here (not in the block) so the qkv/proj projections
    run as single full-grid matmuls instead of 25 window-sized ones —
    the per-window Dense lowering cost ~2x on TPU.
    """

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    window_size: int = 0  # 0 = global attention over the full grid
    dtype: Any = jnp.float32
    flash: bool | None = None

    @nn.compact
    def __call__(self, x):
        """x: (B, h, w, C) -> (B, h, w, C)."""
        B, gh, gw, C = x.shape
        H = self.num_heads
        hd = self.dim // H
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)

        ws = self.window_size
        if ws > 0:
            qkv, pad_hw = window_partition(qkv, ws)
            h = w = ws
        else:
            h, w = gh, gw
        nB = qkv.shape[0]
        qkv = qkv.reshape(nB, h * w, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (nB, hw, H, hd)

        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * h - 1, hd)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * w - 1, hd)
            )

        on_tpu = jax.default_backend() == "tpu"
        use_flash = (
            self.flash if self.flash is not None else on_tpu
        ) and self.use_rel_pos
        if use_flash:
            from sam6d_tpu.ops.pallas.flash_rpe import flash_rpe_attention

            to_flat = lambda t: t.transpose(0, 2, 1, 3).reshape(
                nB * H, h * w, hd
            )
            out = flash_rpe_attention(
                to_flat(q), to_flat(k), to_flat(v),
                rel_pos_h.astype(q.dtype), rel_pos_w.astype(q.dtype),
                (h, w), interpret=not on_tpu,
            )
            out = out.reshape(nB, H, h * w, hd).transpose(0, 2, 1, 3)
            out = out.reshape(nB, h, w, C)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(
                hd).astype(x.dtype)
            if self.use_rel_pos:
                Rh = get_rel_pos(h, h, rel_pos_h)  # (h, h, hd)
                Rw = get_rel_pos(w, w, rel_pos_w)  # (w, w, hd)
                q_grid = q.reshape(nB, h, w, H, hd)
                bias_h = jnp.einsum("byxhd,yYd->bhyxY", q_grid, Rh)
                bias_w = jnp.einsum("byxhd,xXd->bhyxX", q_grid, Rw)
                attn = attn.reshape(nB, H, h, w, h, w)
                attn = attn + bias_h[..., None] + bias_w[..., :, None, :]
                attn = attn.reshape(nB, H, h * w, h * w)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(
                nB, h, w, C)

        if ws > 0:
            out = window_unpartition(out, ws, pad_hw, (gh, gw))
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def window_partition(x: jax.Array, window: int):
    """(B, H, W, C) -> (B*nw, window, window, C) with padding."""
    B, H, W, C = x.shape
    pad_h = (window - H % window) % window
    pad_w = (window - W % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def window_unpartition(x: jax.Array, window: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = x.shape[0] // ((Hp // window) * (Wp // window))
    x = x.reshape(B, Hp // window, Wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class SAMBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_input_size: tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32
    flash: bool | None = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = WindowAttention(
            self.dim, self.num_heads, window_size=self.window_size,
            dtype=self.dtype, flash=self.flash, name="attn",
        )(x)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(y)
        return x + y


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over the last axis of (B, H, W, C) maps
    (reference model_utils.py:15-27 LayerNorm2d in NCHW)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + self.eps) * w + b


class ImageEncoderViT(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (7, 15, 23, 31)
    dtype: Any = jnp.float32
    flash: bool | None = None
    # Flash selection for the 28 WINDOWED blocks separately from the 4
    # global ones: at 196-token windows the Pallas grid degenerates into
    # hundreds of tiny programs (same failure mode as DINOv2 N=257,
    # BASELINE.md) — None inherits `flash`, False forces materialized
    # XLA attention for windowed blocks only.
    flash_windowed: bool | None = None

    @nn.compact
    def __call__(self, x):
        """x: (B, S, S, 3) -> (B, S/16, S/16, 256) image embedding."""
        B = x.shape[0]
        # Patch embed as extract-patches + matmul (stride == kernel, so
        # the conv is a pure relayout; XLA's conv lowering with 3 input
        # channels forces a bad layout on everything downstream). The
        # param keeps the conv kernel shape for checkpoint parity.
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                       name="patch_embed")(x)  # (B, h, w, D)
        h, w = x.shape[1], x.shape[2]
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.img_size // self.patch_size,
             self.img_size // self.patch_size, self.embed_dim),
        )
        # Cast the add so the residual stream stays in compute dtype
        # (an f32 pos_embed would otherwise promote every residual add
        # in the network to f32).
        x = (x + pos_embed[:, :h, :w]).astype(self.dtype)
        grid = (self.img_size // self.patch_size,
                self.img_size // self.patch_size)
        for i in range(self.depth):
            is_global = i in self.global_attn_indexes
            x = SAMBlock(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                window_size=0 if is_global else self.window_size,
                global_input_size=grid,
                dtype=self.dtype,
                flash=self.flash if is_global else (
                    self.flash_windowed
                    if self.flash_windowed is not None else self.flash
                ),
                name=f"blocks_{i}",
            )(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_0")(x)
        x = LayerNorm2d(self.out_chans, name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_2")(x)
        x = LayerNorm2d(self.out_chans, name="neck_3")(x)
        return x
