"""PEM transformer stack (flax).

Re-derivation of reference Pose_Estimation_Model/model/transformer.py:
  MultiHeadAttention (:95-150), AttentionLayer (:153-182),
  AttentionOutput (:184-199), TransformerLayer (:202-226),
  RPEMultiHeadAttention (:366-420), RPETransformerLayer (:455-479),
  GeometricTransformer (:483-527), LinearAttention (:532-578),
  LinearTransformerLayer (:606-622), SparseToDenseTransformer (:627-720).

All attention shapes here are small (197/2049 tokens, 256 dim) so the
layers are plain einsum+softmax that XLA fuses onto the MXU; the
memory-relevant choice is the focused linear attention on the dense side
(2049 tokens never see an O(N^2) matrix when the kv path is cheaper).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        H = self.num_heads
        hd = self.d_model // H
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(q_in)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(k_in)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(v_in)
        q = q.reshape(*q.shape[:-1], H, hd)
        k = k.reshape(*k.shape[:-1], H, hd)
        v = v.reshape(*v.shape[:-1], H, hd)
        # f32 scores/softmax: the softmax backward p*(dy - <p,dy>) is a
        # cancellation of large correlated terms; at trained sharpness
        # the bf16 rounding residue dominates (round-4 cliff forensics).
        scores = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        return out.reshape(*out.shape[:-2], self.d_model)


class _DenseParams(nn.Module):
    """Kernel/bias with nn.Dense's exact layout and init, without the
    forward — lets a parent contract them in a custom order."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.out_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return kernel, bias


class RPEMultiHeadAttention(nn.Module):
    """Attention with pre-computed relative positional embedding bias.

    scores = (q.k + q.p) / sqrt(hd) with p = proj_p(embed_qk)
    (reference transformer.py:399-406).

    TPU layout note: the reference materializes p = proj_p(embed) of
    shape (B, N, M, H, hd) — at B=8/N=197 that is a 1.6GB intermediate.
    Algebraically q.p = (Wp^T q).embed + q.b_p, so we instead pull q
    through proj_p's kernel and contract directly against the embedding,
    which is then only ever READ once.
    """

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, embed_qk):
        H = self.num_heads
        hd = self.d_model // H
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(q_in)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(k_in)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(v_in)
        Wp, bp = _DenseParams(
            embed_qk.shape[-1], self.d_model, name="proj_p"
        )()

        q = q.reshape(*q.shape[:-1], H, hd)
        k = k.reshape(*k.shape[:-1], H, hd)
        v = v.reshape(*v.shape[:-1], H, hd)
        Wp_h = jnp.asarray(Wp, self.dtype).reshape(-1, H, hd)  # (D, H, hd)
        bp_h = jnp.asarray(bp, self.dtype).reshape(H, hd)

        # Scores assembled and softmaxed in f32 (backward-cancellation
        # guard, see MultiHeadAttention); probabilities return to the
        # compute dtype for the value matmul.
        scores_e = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        )
        # q pulled through Wp: (B, N, H, D), then contracted with embed.
        q_p = jnp.einsum("bnhd,Dhd->bnhD", q, Wp_h)
        scores_p = jnp.einsum(
            "bnhD,bnmD->bhnm", q_p, embed_qk.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        # Bias term of proj_p: constant over m per (b, n, h).
        scores_b = jnp.einsum(
            "bnhd,hd->bnh", q, bp_h, preferred_element_type=jnp.float32
        )
        scores = (
            scores_e + scores_p + scores_b.transpose(0, 2, 1)[..., None]
        ) / np.sqrt(hd)
        attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        return out.reshape(*out.shape[:-2], self.d_model)


class AttentionOutput(nn.Module):
    """Post-attention FFN: expand 2x -> act -> squeeze, residual + LN."""

    d_model: int
    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.d_model * 2, dtype=self.dtype, name="expand")(x)
        y = nn.relu(y) if self.activation == "relu" else nn.gelu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="squeeze")(y)
        # f32 LN stats/backward (cancellation guard, cf. models/vit.py).
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(
            (x + y).astype(jnp.float32)
        ).astype(self.dtype)


class TransformerLayer(nn.Module):
    """Vanilla attention layer + FFN (post-norm residual)."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory):
        h = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype,
                               name="attention")(x, memory, memory)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(h)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(
            (h + x).astype(jnp.float32)
        ).astype(self.dtype)
        return AttentionOutput(self.d_model, dtype=self.dtype, name="output")(x)


class RPETransformerLayer(nn.Module):
    """RPE self-attention layer + FFN."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory, position):
        h = RPEMultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype,
                                  name="attention")(x, memory, memory, position)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(h)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(
            (h + x).astype(jnp.float32)
        ).astype(self.dtype)
        return AttentionOutput(self.d_model, dtype=self.dtype, name="output")(x)


class GeometricTransformer(nn.Module):
    """Alternating RPE-self / vanilla-cross blocks over two point sets.

    blocks: sequence of 'self'/'cross' (reference transformer.py:483-527).
    """

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats0, embeddings0, feats1, embeddings1,
                 embeddings_both=None):
        """embeddings_both: optional (2B, N, N, D) stack of
        [embeddings0; embeddings1].  When given (and the two sides have
        equal token counts) each 'self' layer runs ONCE on the stacked
        (2B, N, C) features instead of twice — identical math (the layer
        weights are shared between sides anyway), half the dispatches.
        Callers with several blocks should build the stack once and
        reuse it; the per-block feature concat is only (2B, N, C)."""
        use_both = (
            embeddings_both is not None and feats0.shape == feats1.shape
        )
        B = feats0.shape[0]
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = RPETransformerLayer(
                    self.d_model, self.num_heads, dtype=self.dtype,
                    name=f"layers_{i}",
                )
                if use_both:
                    both = jnp.concatenate([feats0, feats1], axis=0)
                    both = layer(both, both, embeddings_both)
                    feats0, feats1 = both[:B], both[B:]
                else:
                    feats0 = layer(feats0, feats0, embeddings0)
                    feats1 = layer(feats1, feats1, embeddings1)
            elif block == "cross":
                layer = TransformerLayer(
                    self.d_model, self.num_heads, dtype=self.dtype,
                    name=f"layers_{i}",
                )
                # Sequential cross (reference parallel=False default,
                # transformer.py:519-521): feats1 attends to UPDATED feats0.
                feats0 = layer(feats0, feats1)
                feats1 = layer(feats1, feats0)
            else:
                raise ValueError(f"unknown block type {block}")
        return feats0, feats1


class LinearAttention(nn.Module):
    """Focused linear attention (reference transformer.py:532-578).

    Kernelized attention with a learnable per-channel scale and a
    focusing power that sharpens the feature map while preserving norms;
    O(N*C^2) via the kv path when that is cheaper than O(N^2*C).
    """

    d_model: int
    num_heads: int
    focusing_factor: float = 3.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        H = self.num_heads
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(q_in)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(k_in)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(v_in)
        scale_param = self.param(
            "scale", nn.initializers.zeros, (1, 1, self.d_model)
        )
        # The focusing kernel (x/scale)**3 with its norm-ratio rescale is
        # the most bf16-fragile math in the net: cubes amplify rounding
        # and the backward carries 3x^2 / norm-quotient factors (the
        # reference runs it f32, transformer.py:549-565 — it has no AMP).
        # Keep the kernel chain in f32; einsums stay in compute dtype.
        out_dtype = q.dtype
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
        scale = jax.nn.softplus(scale_param)

        q = nn.relu(q) + 1e-6
        k = nn.relu(k) + 1e-6
        q = q / scale
        k = k / scale
        q_norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        k_norm = jnp.linalg.norm(k, axis=-1, keepdims=True)
        ff = self.focusing_factor
        if float(ff).is_integer() and 1 <= int(ff) <= 4:
            # x ** 3.0 lowers to transcendental pow on the VPU; an
            # integer focusing factor is just repeated multiplication.
            def ipow(x):
                out = x
                for _ in range(int(ff) - 1):
                    out = out * x
                return out

            q, k = ipow(q), ipow(k)
        else:
            q = q**ff
            k = k**ff
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * q_norm
        k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * k_norm
        q = q.astype(out_dtype)
        k = k.astype(out_dtype)

        B, N, _ = q.shape
        M = k.shape[1]
        hd = self.d_model // H
        qh = q.reshape(B, N, H, hd)
        kh = k.reshape(B, M, H, hd)
        vh = v.reshape(B, M, H, hd)

        # Normalizer in f32: a reciprocal of a long bf16 reduction is the
        # other precision cliff here.
        z = 1.0 / (
            jnp.einsum(
                "bnhc,bhc->bnh",
                qh.astype(jnp.float32),
                kh.sum(axis=1, dtype=jnp.float32),
            ) + 1e-6
        )
        z = z.astype(qh.dtype)
        if N * M * (hd + hd) > hd * hd * (N + M):
            kv = jnp.einsum("bmhc,bmhd->bhcd", kh, vh)
            out = jnp.einsum("bnhc,bhcd,bnh->bnhd", qh, kv, z)
        else:
            qk = jnp.einsum("bnhc,bmhc->bhnm", qh, kh)
            out = jnp.einsum("bhnm,bmhd,bnh->bnhd", qk, vh, z)
        return out.reshape(B, N, self.d_model)


class LinearTransformerLayer(nn.Module):
    """Linear attention layer + FFN."""

    d_model: int
    num_heads: int
    focusing_factor: float = 3.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory):
        h = LinearAttention(
            self.d_model, self.num_heads, self.focusing_factor,
            dtype=self.dtype, name="attention",
        )(x, memory, memory)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(h)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(
            (h + x).astype(jnp.float32)
        ).astype(self.dtype)
        return AttentionOutput(self.d_model, dtype=self.dtype, name="output")(x)


class SparseToDenseTransformer(nn.Module):
    """Sparse geometric attention broadcast back to dense points.

    Gathers FPS-selected sparse subsets (with the bg token carried along),
    runs a GeometricTransformer on them, then propagates the updated
    sparse features to all dense points with one linear cross-attention
    layer, replacing the dense bg token with the sparse one
    (reference transformer.py:627-720).
    """

    d_model: int
    sparse_blocks: Sequence[str]
    num_heads: int = 4
    focusing_factor: float = 3.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, dense_feats0, embeddings0, fps_idx0,
                 dense_feats1, embeddings1, fps_idx1,
                 embeddings_both=None):
        sparse0 = self._sample(dense_feats0, fps_idx0)
        sparse1 = self._sample(dense_feats1, fps_idx1)
        sparse0, sparse1 = GeometricTransformer(
            self.sparse_blocks, self.d_model, self.num_heads,
            dtype=self.dtype, name="sparse_layer",
        )(sparse0, embeddings0, sparse1, embeddings1,
          embeddings_both=embeddings_both)

        dense_layer = LinearTransformerLayer(
            self.d_model, self.num_heads, self.focusing_factor,
            dtype=self.dtype, name="dense_layer",
        )
        # Both sides share dense_layer's weights: one stacked (2B, N, C)
        # call instead of two (the sides have equal dense token counts).
        B, N = dense_feats0.shape[:2]
        if dense_feats1.shape[1] == N:
            d_in = jnp.concatenate(
                [dense_feats0[:, 1:], dense_feats1[:, 1:]], axis=0
            )
            s_in = jnp.concatenate([sparse0[:, 1:], sparse1[:, 1:]], axis=0)
            d_out = dense_layer(d_in, s_in)
            dense0 = jnp.concatenate([sparse0[:, :1], d_out[:B]], axis=1)
            dense1 = jnp.concatenate([sparse1[:, :1], d_out[B:]], axis=1)
        else:
            dense0 = self._broadcast(dense_layer, dense_feats0, sparse0)
            dense1 = self._broadcast(dense_layer, dense_feats1, sparse1)
        return dense0, dense1

    def _sample(self, dense_feats, fps_idx):
        # dense_feats: (B, 1+N, C) with bg token at 0.  NOTE: the reference
        # gathers with fps_idx (computed on the N no-bg points) directly
        # from the WITH-bg token array (transformer.py:667-671), i.e.
        # gathered token j is dense point fps_idx[j]-1 (and the bg token
        # for fps_idx[j]==0, which FPS always emits first).  The released
        # checkpoints were trained with this off-by-one, so we replicate
        # it exactly.
        bg = dense_feats[:, :1, :]
        body = jnp.take_along_axis(dense_feats, fps_idx[..., None], axis=1)
        return jnp.concatenate([bg, body], axis=1)

    def _broadcast(self, dense_layer, dense_feats, sparse_feats):
        bg = sparse_feats[:, :1, :]
        dense = dense_layer(dense_feats[:, 1:, :], sparse_feats[:, 1:, :])
        return jnp.concatenate([bg, dense], axis=1)
