"""Geometric structure embedding (GeoTransformer-style RPE tensors).

Re-derivation of reference Pose_Estimation_Model/model/transformer.py:
SinusoidalPositionalEmbedding (:259-285) and GeometricStructureEmbedding
(:288-363): pairwise-distance + k-NN triplet-angle sinusoidal embeddings
used as relative positional bias in the coarse/fine transformers.

TPU formulation: the (B, N, N, k, 3) expanded cross-product tensor of the
reference (:327-329) is never materialized — cross components are
broadcast outer products einsum'd to (B, N, N, k) directly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sam6d_tpu.config import GeoEmbeddingConfig
from sam6d_tpu.ops.geometry import pairwise_distance

# Bisect switch (tools/bisect_serving_perf.py): run the Chebyshev
# recurrence in f32 (the accuracy-mandated form) vs compute dtype.
_CHEB_RECURRENCE_F32 = True


def sinusoidal_embedding(indices: jax.Array, d_model: int) -> jax.Array:
    """Interleaved [sin, cos] positional embedding.

    Matches reference SinusoidalPositionalEmbedding (transformer.py:269-285):
    output layout is (..., d_model) with pairs (sin_i, cos_i) interleaved.
    """
    div_indices = np.arange(0, d_model, 2).astype(np.float32)
    div_term = jnp.asarray(
        np.exp(div_indices * (-np.log(10000.0) / d_model)), indices.dtype
    )
    omegas = indices[..., None] * div_term  # (..., d/2)
    emb = jnp.stack([jnp.sin(omegas), jnp.cos(omegas)], axis=-1)  # (..., d/2, 2)
    return emb.reshape(*indices.shape, d_model)


import functools


@functools.lru_cache(maxsize=8)
def _cheb_sinusoid_coeffs(P: int, d_model: int, hi: float) -> np.ndarray:
    """Chebyshev coefficients of every sinusoidal-embedding column.

    Column 2i is sin(omega_i * u), column 2i+1 is cos(omega_i * u)
    (matching sinusoidal_embedding's interleaved layout) for u in
    [0, hi], expanded in T_p(x) with x = 2u/hi - 1.  Fit in float64 at
    Chebyshev-Gauss nodes; at P=28 and hi=12 (the worst case, omega=1:
    ~2 full periods) the max abs error is < 1e-9 — far below the bf16
    compute noise of the exact path.

    Returns: (P, d_model) float64.
    """
    nodes = np.cos(np.pi * (np.arange(512) + 0.5) / 512)  # x in (-1, 1)
    u = (nodes + 1.0) * (hi / 2.0)
    div_indices = np.arange(0, d_model, 2).astype(np.float64)
    omegas = np.exp(div_indices * (-np.log(10000.0) / d_model))
    args = u[:, None] * omegas[None, :]  # (512, d/2)
    cols = np.stack([np.sin(args), np.cos(args)], axis=-1)
    cols = cols.reshape(len(u), d_model)
    return np.polynomial.chebyshev.chebfit(nodes, cols, P - 1)


def geometric_embedding_indices(
    points: jax.Array, sigma_d: float, sigma_a: float, angle_k: int
):
    """Distance and triplet-angle embedding indices.

    Args:
      points: (B, N, 3).

    Returns:
      d_indices (B, N, N), a_indices (B, N, N, k).
    """
    dist2 = pairwise_distance(points, points)
    dist_map = jnp.sqrt(dist2)
    d_indices = dist_map / sigma_d

    k = angle_k
    # k nearest neighbors excluding self (self-distance 0 is the minimum).
    _, knn_idx = jax.lax.top_k(-dist2, k + 1)
    knn_idx = knn_idx[:, :, 1:]  # (B, N, k)
    from sam6d_tpu.ops.pointcloud import group_points

    knn_points = group_points(points, knn_idx)  # (B, N, k, 3)
    ref_vectors = knn_points - points[:, :, None, :]  # (B, N, k, 3)
    anc_vectors = points[:, None, :, :] - points[:, :, None, :]  # (B, N, M, 3)

    # cross[b,n,m,k] = ref[b,n,k] x anc[b,n,m]; per-component outer products.
    def outer(rc, ac):
        return jnp.einsum("bnk,bnm->bnmk", rc, ac)

    rx, ry, rz = ref_vectors[..., 0], ref_vectors[..., 1], ref_vectors[..., 2]
    ax, ay, az = anc_vectors[..., 0], anc_vectors[..., 1], anc_vectors[..., 2]
    cx = outer(ry, az) - outer(rz, ay)
    cy = outer(rz, ax) - outer(rx, az)
    cz = outer(rx, ay) - outer(ry, ax)
    sin_values = jnp.sqrt(cx * cx + cy * cy + cz * cz)  # (B, N, M, k)
    cos_values = jnp.einsum("bnkc,bnmc->bnmk", ref_vectors, anc_vectors)

    # Numerical-stability clamps (reference transformer.py:332-336).
    eps = 1e-8
    sin_values = jnp.maximum(sin_values, eps)
    cos_values = jnp.clip(cos_values, -1.0 + eps, 1.0 - eps)
    angles = jnp.arctan2(sin_values, cos_values)
    factor_a = 180.0 / (sigma_a * np.pi)
    # The embedding indices are functions of the INPUT point clouds
    # only — no parameter ever influences the geometry — so their
    # backward (the P-step Chebyshev-recurrence chain, arctan2/sqrt and
    # cross-product jacobians over (B, N, N, k) tensors) can only flow
    # to non-differentiated data.  Torch never builds that graph
    # (points don't require_grad, reference transformer.py:288-363);
    # stop_gradient pins the same dead-code elimination here.
    return (
        jax.lax.stop_gradient(d_indices),
        jax.lax.stop_gradient(angles * factor_a),
    )


class GeometricStructureEmbedding(nn.Module):
    """Sinusoidal distance + angle embeddings with linear projections."""

    cfg: GeoEmbeddingConfig
    dtype: Any = jnp.float32
    # Pallas interpret mode for the fused kernel (tests on CPU only).
    interpret: bool = False

    def _cheb_proj(self, idx, hi, P, kernel, bias):
        """Projected sinusoidal embedding of a bounded index field via a
        Chebyshev expansion: P VPU recurrence steps on the scalar field
        + ONE (..., P) @ (P, d) MXU matmul against the static
        coefficient matrix with the projection kernel folded in — no
        transcendentals, no gathers (a lookup table was tried and is
        row-count-bound at ~3 ns/gather-row)."""
        d = kernel.shape[-1]
        coeffs = jnp.asarray(
            _cheb_sinusoid_coeffs(P, kernel.shape[0], hi), jnp.float32
        )  # (P, d_in)
        M = (coeffs @ jnp.asarray(kernel, jnp.float32)).astype(self.dtype)
        # The recurrence runs in f32 even when the module computes in
        # bf16: x quantized to ~0.4% feeds columns oscillating at ~10
        # rad/unit-x (hi=20), amplifying to percent-level embedding
        # error.  The P scalar-field VPU steps are cheap in f32; only
        # the (..., P) @ (P, d) matmul runs in compute dtype.
        # (_CHEB_RECURRENCE_F32 is a bisect switch for
        # tools/bisect_serving_perf.py — production stays f32.)
        rec_dt = jnp.float32 if _CHEB_RECURRENCE_F32 else self.dtype
        x = (idx * (2.0 / hi) - 1.0).astype(rec_dt)
        t_prev = jnp.ones_like(x)
        t_cur = x
        # Carry the recurrence in f32 but append each basis value
        # pre-cast to compute dtype: identical numerics to casting the
        # stacked tensor (same values, same rounding), but the (..., P)
        # stack materializes at bf16 width instead of f32 (the f32
        # stack+convert was the measurable part of the round-2 2.36 ->
        # 2.47 ms delta; the f32 VPU steps themselves are noise).
        terms = [t_prev.astype(self.dtype), t_cur.astype(self.dtype)]
        for _ in range(P - 2):
            t_prev, t_cur = t_cur, 2.0 * x * t_cur - t_prev
            terms.append(t_cur.astype(self.dtype))
        T = jnp.stack(terms, axis=-1)  # (..., P) compute dtype
        return T @ M + jnp.asarray(bias, self.dtype)

    def _fused_call(self, d_idx, a_idx, kernel_d, bias_d, kernel_a,
                    bias_a):
        """Pallas fwd/bwd path (ops/pallas/geo_embed.py): the Chebyshev
        bases, the (B, N, N, k, d) angle tensor, and the max-over-k
        selection mask never touch HBM — the XLA formulation's ~1.9 GB
        of round trips at the bs-16 train step (BASELINE.md round 4).

        The bg-sentinel distance rows (d_idx ~ 500 >> cheb domain,
        reference pose_estimation_model.py:30) are fixed up with a
        small additive exact-minus-cheb delta on row/col 0 — identical
        values AND parameter gradients to the unfused overwrite path.
        """
        from sam6d_tpu.ops.pallas.geo_embed import geo_embed_maxk

        cfg = self.cfg
        hi_d = cfg.dist_cheb_hi
        hi_a = 180.0 / cfg.sigma_a
        Pd, Pa = cfg.dist_cheb_terms, cfg.angle_cheb_terms
        d = cfg.hidden_dim
        coeffs_d = jnp.asarray(
            _cheb_sinusoid_coeffs(Pd, d, hi_d), jnp.float32
        )
        coeffs_a = jnp.asarray(
            _cheb_sinusoid_coeffs(Pa, d, hi_a), jnp.float32
        )
        Md = (coeffs_d @ jnp.asarray(kernel_d, jnp.float32)).astype(
            self.dtype
        )
        Ma = (coeffs_a @ jnp.asarray(kernel_a, jnp.float32)).astype(
            self.dtype
        )
        bias = (
            jnp.asarray(bias_d, jnp.float32)
            + jnp.asarray(bias_a, jnp.float32)
        )[None]
        out = geo_embed_maxk(
            jnp.minimum(d_idx, hi_d), a_idx, Md, Ma, bias,
            hi_d, hi_a, self.dtype, self.interpret,
        )
        # Sentinel row/col 0: additive exact-minus-cheb distance delta
        # (bias cancels inside the difference; the (0, 0) corner is
        # excluded from the row delta so it is corrected exactly once).
        def _delta(idx_slice):
            return (
                self._exact_proj(idx_slice, kernel_d, bias_d)
                - self._cheb_proj(
                    jnp.minimum(idx_slice, hi_d), hi_d, Pd, kernel_d,
                    bias_d,
                )
            ).astype(out.dtype)

        row_delta = _delta(d_idx[:, :1, :])  # (B, 1, N, d)
        col_delta = _delta(d_idx[:, :, :1])  # (B, N, 1, d)
        row_delta = row_delta.at[:, :, 0].set(0.0)
        out = out.at[:, :1, :].add(row_delta)
        out = out.at[:, :, :1].add(col_delta)
        return out

    def _exact_proj(self, idx, kernel, bias):
        d_in = kernel.shape[0]
        return (
            sinusoidal_embedding(idx, d_in).astype(self.dtype)
            @ jnp.asarray(kernel, self.dtype)
            + jnp.asarray(bias, self.dtype)
        )

    @nn.compact
    def __call__(self, points: jax.Array) -> jax.Array:
        """points: (B, N, 3) -> embeddings (B, N, N, hidden_dim)."""
        d = self.cfg.hidden_dim
        d_idx, a_idx = geometric_embedding_indices(
            points, self.cfg.sigma_d, self.cfg.sigma_a, self.cfg.angle_k
        )
        from sam6d_tpu.models.pem.transformer import _DenseParams

        # proj_d/proj_a kernel+bias in nn.Dense's exact layout
        # (checkpoint parity) but contracted in a custom order below.
        kernel_d, bias_d = _DenseParams(d, d, name="proj_d")()
        kernel_a, bias_a = _DenseParams(d, d, name="proj_a")()

        Pd = self.cfg.dist_cheb_terms
        Pa = self.cfg.angle_cheb_terms
        use_fused = (
            self.cfg.fused == "on"
            or (self.cfg.fused == "auto"
                and jax.default_backend() == "tpu"
                # B < 8 pays (B, R) blocks at partial sublane occupancy
                # — the serving B=1 forward keeps the tuned XLA path
                # (0.14 ms Chebyshev, BASELINE.md round 2).
                and points.shape[0] >= 8)
        ) and Pd and Pa and self.cfg.reduction_a == "max"
        if use_fused:
            return self._fused_call(
                d_idx, a_idx, kernel_d, bias_d, kernel_a, bias_a
            )
        if Pd:
            # Distance indices are bounded for every REAL pair (both
            # clouds are radius-normalized, so dist <= ~4 =
            # dist_cheb_hi * sigma_d); only the bg sentinel point at
            # 100 (reference pose_estimation_model.py:30) exceeds the
            # domain — its row 0 / col 0 are overwritten with the exact
            # transcendental values afterwards.
            hi_d = self.cfg.dist_cheb_hi
            d_emb = self._cheb_proj(
                jnp.minimum(d_idx, hi_d), hi_d, Pd, kernel_d, bias_d
            )
            row0 = self._exact_proj(d_idx[:, :1, :], kernel_d, bias_d)
            col0 = self._exact_proj(d_idx[:, :, :1], kernel_d, bias_d)
            d_emb = jax.lax.dynamic_update_slice(
                d_emb, row0.astype(d_emb.dtype), (0, 0, 0, 0)
            )
            d_emb = jax.lax.dynamic_update_slice(
                d_emb, col0.astype(d_emb.dtype), (0, 0, 0, 0)
            )
        else:
            d_emb = self._exact_proj(d_idx, kernel_d, bias_d)

        if Pa:
            # a_idx = angle * 180/(sigma_a*pi) is bounded in [0, hi]
            # (angles clamped inside (0, pi)).
            a_emb = self._cheb_proj(
                a_idx, 180.0 / self.cfg.sigma_a, Pa, kernel_a, bias_a
            )
        else:
            a_emb = self._exact_proj(a_idx, kernel_a, bias_a)
        if self.cfg.reduction_a == "max":
            a_emb = jnp.max(a_emb, axis=3)
        else:
            a_emb = jnp.mean(a_emb, axis=3)
        return d_emb + a_emb
