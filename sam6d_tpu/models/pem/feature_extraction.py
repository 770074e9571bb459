"""PEM feature extraction: MAE ViT with pyramid features -> per-pixel
256-d map, gathered at the observed/template pixels.

Re-derivation of reference Pose_Estimation_Model/model/feature_extraction.py:
  ViT (:17-35) 4-block pyramid taps, ViT_AE (:39-117) linear 16x
  upscaling + bilinear resize, ViTEncoder (:122-142) radius
  normalization, get_obj_feats (:144-172) template branch.

Channel-last throughout; `choose` indexes the row-major flattened H*W
pixel grid exactly as the reference (model_utils.py:86-98).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from sam6d_tpu.config import ViTConfig
from sam6d_tpu.models.vit import ViT
from sam6d_tpu.ops.fps import sample_pts_feats
from sam6d_tpu.ops.pointcloud import gather_points


class ViTAE(nn.Module):
    """ViT backbone + linear 16x spatial upscaling to per-pixel features."""

    cfg: ViTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lowres: bool = False):
        """x: (B, H, W, 3) -> ((B, H, W, out_dim) feature map, (B, D) cls).

        lowres=True returns the pre-resize (B, 4*H/p, 4*W/p, out_dim)
        map instead — callers that only need a few pixels gather from it
        with folded bilinear weights (see ViTEncoder.get_img_feats)
        rather than materializing the full-resolution map (51 MB/crop)."""
        cfg = self.cfg
        B, H, W, _ = x.shape
        # depth/num_heads come from the config (vit_type is a label;
        # vit_base -> depth 12/heads 12 are the ViTConfig defaults,
        # vit_large checkpoints need depth=24/num_heads=16/embed_dim=1024
        # set explicitly — reference feature_extraction.py:50-57).
        taps = ViT(
            patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim,
            depth=cfg.depth,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            remat=cfg.remat,
            dtype=self.dtype,
            name="vit",
        )(x)
        cls_tokens = taps[-1][:, 0, :]
        patch_taps = [t[:, 1:, :] for t in taps]
        feats = (
            jnp.concatenate(patch_taps, axis=-1)
            if cfg.use_pyramid_feat
            else patch_taps[-1]
        )  # (B, N, 4D)

        hp = H // cfg.patch_size  # 14
        if cfg.up_type == "linear":
            # Each patch token predicts a 4x4 grid of out_dim pixels
            # (reference feature_extraction.py:109-112).
            y = nn.Dense(16 * cfg.out_dim, dtype=self.dtype,
                         name="output_upscaling")(feats)
            y = y.reshape(B, hp, hp, 4, 4, cfg.out_dim)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp * 4, hp * 4,
                                                      cfg.out_dim)
        elif cfg.up_type == "deconv":
            # Reference feature_extraction.py:66-74: ConvTranspose(k2 s2)
            # -> LayerNorm2d -> GELU -> ConvTranspose(k2 s2).  A
            # ConvTranspose(k=2, s=2) is exactly a per-pixel Dense whose
            # output carries the 2x2 block flattened into channels —
            # lowering it via conv_general_dilated runs at ~1% MXU and
            # pixel-shuffle transposes between the two stages cost 40+ms
            # of copies (measured on the SAM decoder, BASELINE.md) — so
            # both stages stay in block-channel form with ONE final
            # shuffle.  LayerNorm/GELU are per-(sub)pixel and apply
            # unchanged to the flattened layout.
            C = cfg.out_dim
            y = nn.Dense(4 * 2 * C, dtype=self.dtype,
                         name="upscale_deconv1")(feats)  # (B,N,(a b 2C))
            y = y.reshape(B, hp, hp, 2, 2, 2 * C)
            y = nn.LayerNorm(dtype=self.dtype, name="upscale_ln")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(4 * C, dtype=self.dtype,
                         name="upscale_deconv2")(y)  # (...,a,b,(c d C))
            y = y.reshape(B, hp, hp, 2, 2, 2, 2, C)
            # (i, j, a, b, c, d, C) -> rows i·4+a·2+c, cols j·4+b·2+d.
            y = y.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                B, hp * 4, hp * 4, C
            )
        else:
            raise NotImplementedError(f"up_type {cfg.up_type}")
        if lowres:
            return y, cls_tokens
        y = jax.image.resize(y, (B, H, W, cfg.out_dim), method="bilinear")
        return y, cls_tokens


def get_chosen_pixel_feats(feat_map: jax.Array, choose: jax.Array) -> jax.Array:
    """Gather per-pixel features at flattened row-major pixel indices.

    feat_map: (B, H, W, C); choose: (B, Np) int indices into H*W.
    Returns (B, Np, C).
    """
    B, H, W, C = feat_map.shape
    flat = feat_map.reshape(B, H * W, C)
    return gather_points(flat, choose)


class ViTEncoder(nn.Module):
    """Feature extraction + radius normalization front-end of PEM."""

    cfg: ViTConfig
    npoint: int = 2048
    dtype: Any = jnp.float32

    def setup(self):
        self.rgb_net = ViTAE(self.cfg, dtype=self.dtype)

    def __call__(self, pts, rgb, rgb_choose, dense_po, dense_fo):
        """Observed-crop branch.

        Args:
          pts: (B, N, 3) observed cloud (camera frame, metric).
          rgb: (B, H, W, 3) masked crop.
          rgb_choose: (B, N) pixel index per point.
          dense_po: (B, M, 3) template cloud (model frame).
          dense_fo: (B, M, C) template features.

        Returns:
          (dense_pm, dense_fm, dense_po, dense_fo, radius): clouds
          normalized by the template radius (reference
          feature_extraction.py:133-136).
        """
        dense_fm = self.get_img_feats(rgb, rgb_choose)
        radius = jnp.max(jnp.linalg.norm(dense_po, axis=2), axis=1)
        denom = radius[:, None, None] + 1e-6
        return pts / denom, dense_fm, dense_po / denom, dense_fo, radius

    def get_img_feats(self, rgb, choose):
        """Per-pixel features at `choose`, without materializing the
        full-resolution map.

        The reference upscales to a dense (H, W, C) map and gathers
        (feature_extraction.py:109-116 + model_utils.py:86-98); the
        bilinear resize is a linear map, so we gather the 4 source-grid
        neighbors of each chosen pixel from the 4x-per-patch map and
        blend with the resize weights — identical values, ~25x less
        feature-map traffic (2048 pixels vs 224^2 per crop)."""
        from sam6d_tpu.ops.pointcloud import batched_row_gather

        feat56, _ = self.rgb_net(rgb, lowres=True)
        B, g, _, C = feat56.shape
        # choose indexes the ACTUAL crop grid — derive it from rgb.shape
        # (identical to cfg.img_size for standard crops, correct for any
        # other input size).
        H, W = rgb.shape[1:3]
        row = choose // W
        col = choose % W

        def axis_weights(q, size_out):
            # jax.image.resize 'bilinear' upscale: half-pixel centers,
            # edge-clamped source coords.
            c = (q.astype(jnp.float32) + 0.5) * (g / size_out) - 0.5
            # Clamp the COORDINATE first (edge pixels collapse onto the
            # boundary sample — matches jax.image.resize), then split.
            c = jnp.clip(c, 0.0, g - 1.0)
            c0 = jnp.floor(c)
            w1 = c - c0
            i0 = c0.astype(jnp.int32)
            i1 = jnp.minimum(i0 + 1, g - 1)
            return i0, i1, w1.astype(feat56.dtype)

        y0, y1, wy = axis_weights(row, H)
        x0, x1, wx = axis_weights(col, W)
        idx4 = jnp.stack(
            [y0 * g + x0, y0 * g + x1, y1 * g + x0, y1 * g + x1], axis=-1
        )  # (B, N, 4)
        w4 = jnp.stack(
            [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx],
            axis=-1,
        )  # (B, N, 4)
        gathered = batched_row_gather(
            feat56.reshape(B, g * g, C), idx4
        )  # (B, N, 4, C)
        return jnp.einsum("bnk,bnkc->bnc", w4, gathered)

    def get_obj_feats(self, tem_rgb, tem_pts, tem_choose, npoint=None):
        """Template branch: per-view features -> concat -> FPS downsample.

        Args:
          tem_rgb: (T, H, W, 3) template views.
          tem_pts: (T, Np, 3) template xyz per view.
          tem_choose: (T, Np) pixel index per point.

        Returns:
          (tem_pts', tem_feat'): (1, npoint, 3), (1, npoint, C).
        """
        if npoint is None:
            npoint = self.npoint
        feat = self.get_img_feats(tem_rgb, tem_choose)  # (T, Np, C)
        all_pts = tem_pts.reshape(1, -1, 3)
        all_feat = feat.reshape(1, -1, feat.shape[-1])
        return sample_pts_feats(all_pts, all_feat, npoint)
