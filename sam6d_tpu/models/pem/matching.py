"""Coarse and fine point-matching heads + pose solvers.

Re-derivation of reference:
  model/coarse_point_matching.py (:12-63), compute_coarse_Rt
  (utils/model_utils.py:204-275), model/fine_point_matching.py (:16-144),
  compute_fine_Rt (utils/model_utils.py:308-341), aug_pose_noise
  (utils/model_utils.py:157-201).

The reference executed these as separate OpenVINO submodels pinned to CPU
(sub2/sub4) because its GPU plugin could not run the SVD/searchsorted
subgraphs; here they are jnp functions inside the single jitted PEM
program.  Hypothesis scoring (the B*300 x 196 x 1024 nearest-model-point
reduction flagged as the OOM hot spot, model_utils.py:213-218) is chunked
with lax.map to bound live memory.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sam6d_tpu.config import CoarseMatchingConfig, FineMatchingConfig
from sam6d_tpu.models.pem.transformer import (
    GeometricTransformer,
    SparseToDenseTransformer,
)
from sam6d_tpu.ops.geometry import compute_feature_similarity
from sam6d_tpu.ops.pointcloud import gather_points
from sam6d_tpu.ops.procrustes import weighted_procrustes
from sam6d_tpu.ops.sampling import weighted_sample_2d


def compute_coarse_Rt(
    key: jax.Array,
    atten: jax.Array,
    pts1: jax.Array,
    pts2: jax.Array,
    model_pts: jax.Array | None = None,
    n_proposal1: int = 6000,
    n_proposal2: int = 300,
    score_chunk: int = 50,
    return_score: bool = False,
    dist_field: jax.Array | None = None,
    n_refine: int = 32,
):
    """Hypothesis-sampled coarse pose from the (1+N1)x(1+N2) attention.

    Soft mutual assignment -> weighted sampling of 3-point triplets ->
    batched Procrustes -> top-n2 by residual -> rescoring against the
    model cloud (reference model_utils.py:204-275).

    Args:
      key: PRNG key for hypothesis sampling.
      atten: (B, 1+N1, 1+N2) similarity with bg row/col at index 0.
      pts1: (B, N1, 3) observed (normalized); pts2: (B, N2, 3) template.
      model_pts: (B, M, 3) model cloud for rescoring (normalized).
      dist_field: optional (B, G, G, G) precomputed min-distance field
        over model_pts (ops/distance_field.py).  When given, all n2
        hypotheses are pre-scored by nearest-voxel lookups and only the
        top n_refine get the exact nearest-model-point reduction — the
        serving path threads the per-object field from the template
        bank, replacing the reference's (n2, N1, M) reduction that it
        pinned to host CPU (model_utils.py:213-218, sub2).

    Returns:
      (R, t): (B, 3, 3), (B, 3) mapping model frame -> camera frame in
      the normalized space: pts1 ~ pts_model @ R^T + t.
    """
    B, N1p, N2p = atten.shape
    N1, N2 = N1p - 1, N2p - 1
    if model_pts is None:
        model_pts = pts2

    pred_score = jax.nn.softmax(atten, axis=2) * jax.nn.softmax(atten, axis=1)
    label1 = jnp.argmax(pred_score[:, 1:, :], axis=2)
    label2 = jnp.argmax(pred_score[:, :, 1:], axis=1)
    w1 = (label1 > 0).astype(pred_score.dtype)  # (B, N1)
    w2 = (label2 > 0).astype(pred_score.dtype)  # (B, N2)

    scores = pred_score[:, 1:, 1:] * w1[:, :, None] * w2[:, None, :]
    idx1, idx2 = weighted_sample_2d(
        key, scores**1.5, n_proposal1 * 3
    )  # 2x (B, 3*n1)
    p1 = gather_points(pts1, idx1).reshape(B, n_proposal1, 3, 3)
    p2 = gather_points(pts2, idx2).reshape(B, n_proposal1, 3, 3)

    # Solve all n1 triplet hypotheses at once (template -> observed).
    Rs, ts = weighted_procrustes(p2, p1)  # (B, n1, 3, 3), (B, n1, 3)

    # Rank by triplet self-residual, keep the best n2.
    resid = (p1 - ts[:, :, None, :]) @ Rs - p2
    dis = jnp.linalg.norm(resid, axis=3).mean(axis=2)  # (B, n1)
    _, keep = jax.lax.top_k(-dis, n_proposal2)  # smallest residuals
    Rs = jnp.take_along_axis(Rs, keep[..., None, None], axis=1)
    ts = jnp.take_along_axis(ts, keep[..., None], axis=1)

    # Rescore the kept hypotheses by inverse mean distance of assigned
    # observed points to the model cloud.
    m2 = jnp.sum(model_pts * model_pts, axis=-1)  # (B, M)
    w1sum = jnp.sum(w1, axis=1)  # (B,)

    def score_one(Rt):
        R_c, t_c = Rt  # (B, chunk, 3, 3), (B, chunk, 3)
        transformed = (pts1[:, None, :, :] - t_c[:, :, None, :]) @ R_c
        # (B, chunk, N1, 3); nearest model point distance:
        xy = jnp.einsum(
            "bcnj,bmj->bcnm", transformed, model_pts,
            precision=jax.lax.Precision.HIGHEST,
        )
        x2 = jnp.sum(transformed * transformed, axis=-1)
        d2 = x2[..., None] - 2.0 * xy + m2[:, None, None, :]
        dmin = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))  # (B, chunk, N1)
        return w1sum[:, None] / (
            jnp.sum(dmin * w1[:, None, :], axis=2) + 1e-8
        )  # (B, chunk)

    if dist_field is not None:
        # Pre-score ALL kept hypotheses via the voxel field (SoA
        # component math, no (…, 3) tensors), exact-rescore the leaders.
        from sam6d_tpu.ops.distance_field import sample_min_dist

        p1x, p1y, p1z = pts1[..., 0], pts1[..., 1], pts1[..., 2]  # (B, N1)

        def comp(k):
            # transformed_k[b, p, n] = sum_j (pts1[b,n,j] - t[b,p,j]) R[b,p,j,k]
            return sum(
                (p1c[:, None, :] - ts[:, :, j, None]) * Rs[:, :, j, k, None]
                for j, p1c in enumerate((p1x, p1y, p1z))
            )

        tx, ty, tz = comp(0), comp(1), comp(2)  # (B, n2, N1)
        d_approx = sample_min_dist(dist_field, tx, ty, tz)
        approx_scores = w1sum[:, None] / (
            jnp.sum(d_approx * w1[:, None, :], axis=2) + 1e-8
        )  # (B, n2)
        n_refine = min(n_refine, n_proposal2)
        _, refine = jax.lax.top_k(approx_scores, n_refine)
        Rs_r = jnp.take_along_axis(Rs, refine[..., None, None], axis=1)
        ts_r = jnp.take_along_axis(ts, refine[..., None], axis=1)
        exact = score_one((Rs_r, ts_r))  # (B, n_refine)
        best_r = jnp.argmax(exact, axis=1)
        R = jnp.take_along_axis(Rs_r, best_r[:, None, None, None], axis=1)[:, 0]
        t = jnp.take_along_axis(ts_r, best_r[:, None, None], axis=1)[:, 0]
        if return_score:
            return R, t, jnp.max(exact, axis=1)
        return R, t

    # Exact path: chunked with lax.map to bound the (chunk, N1, M) buffer.
    n_chunks = max(1, n_proposal2 // score_chunk)
    chunk = n_proposal2 // n_chunks
    Rs_c = Rs.reshape(B, n_chunks, chunk, 3, 3).transpose(1, 0, 2, 3, 4)
    ts_c = ts.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
    scores_c = jax.lax.map(score_one, (Rs_c, ts_c))  # (n_chunks, B, chunk)
    hyp_scores = scores_c.transpose(1, 0, 2).reshape(B, n_proposal2)
    best = jnp.argmax(hyp_scores, axis=1)
    R = jnp.take_along_axis(Rs, best[:, None, None, None], axis=1)[:, 0]
    t = jnp.take_along_axis(ts, best[:, None, None], axis=1)[:, 0]
    if return_score:
        return R, t, jnp.max(hyp_scores, axis=1)
    return R, t


def compute_fine_Rt(
    atten: jax.Array,
    pts1: jax.Array,
    pts2: jax.Array,
    model_pts: jax.Array | None = None,
    dis_thres: float = 0.15,
):
    """Dense expectation-correspondence pose + inlier score.

    Reference model_utils.py:308-341.

    Returns:
      (R, t, pose_score).
    """
    if model_pts is None:
        model_pts = pts2
    mat = jax.nn.softmax(atten, axis=2) * jax.nn.softmax(atten, axis=1)
    label1 = jnp.argmax(mat[:, 1:, :], axis=2)
    label2 = jnp.argmax(mat[:, :, 1:], axis=1)
    fg1 = (label1 > 0).astype(mat.dtype)
    fg2 = (label2 > 0).astype(mat.dtype)

    mat = mat[:, 1:, 1:] * fg1[:, :, None] * fg2[:, None, :]
    weights = jnp.sum(mat, axis=2)
    # Row normalization commutes with the matmul: divide the (B, N, 3)
    # expectation instead of the full (B, N, M) matrix.
    pred_pts = jnp.einsum(
        "bnm,bmj->bnj", mat, pts2, precision=jax.lax.Precision.HIGHEST
    ) / (weights[..., None] + 1e-6)

    R, t = weighted_procrustes(pred_pts, pts1, weights, weight_thresh=0.0)

    # Score: inlier fraction of assigned points x foreground ratio.
    back = (pts1 - t[:, None, :]) @ R
    xy = jnp.einsum(
        "bnj,bmj->bnm", back, model_pts, precision=jax.lax.Precision.HIGHEST
    )
    x2 = jnp.sum(back * back, axis=-1)
    m2 = jnp.sum(model_pts * model_pts, axis=-1)
    d2 = x2[..., None] - 2.0 * xy + m2[:, None, :]
    dmin = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=2), 0.0))
    inlier = (dmin < dis_thres).astype(mat.dtype)
    pose_score = jnp.sum(inlier * fg1, axis=1) / (jnp.sum(fg1, axis=1) + 1e-8)
    pose_score = pose_score * jnp.mean(fg1, axis=1)
    return R, t, pose_score


def aug_pose_noise(
    key: jax.Array,
    gt_r: jax.Array,
    gt_t: jax.Array,
    std_rots: Sequence[float] = (15.0, 10.0, 5.0, 1.25, 1.0),
    max_rot: float = 45.0,
    sel_std_trans: Sequence[float] = (0.2, 0.2, 0.2),
    max_trans: float = 0.8,
):
    """Perturb ground-truth pose for fine-stage training init
    (reference model_utils.py:157-201)."""
    B = gt_r.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    std_rot = jax.random.choice(k1, jnp.asarray(std_rots))
    angles = jnp.clip(
        jax.random.normal(k2, (B, 3)) * std_rot, -max_rot, max_rot
    ) * (np.pi / 180.0)

    c, s = jnp.cos(angles), jnp.sin(angles)
    zeros = jnp.zeros((B,))
    ones = jnp.ones((B,))

    def rot_z(cz, sz):
        return jnp.stack(
            [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=-1
        ).reshape(B, 3, 3)

    def rot_x(cx, sx):
        return jnp.stack(
            [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=-1
        ).reshape(B, 3, 3)

    def rot_y(cy, sy):
        return jnp.stack(
            [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=-1
        ).reshape(B, 3, 3)

    rand_rot = rot_z(c[:, 0], s[:, 0]) @ rot_x(c[:, 1], s[:, 1]) @ rot_y(
        c[:, 2], s[:, 2]
    )
    rand_trans = jnp.clip(
        jax.random.normal(k3, (B, 3)) * jnp.asarray(sel_std_trans),
        -max_trans,
        max_trans,
    )
    R = gt_r @ rand_rot
    t = gt_t + rand_trans
    t = t.at[:, 2].set(jnp.maximum(t[:, 2], 1e-6))
    return R, t


class CoarsePointMatching(nn.Module):
    """3 GeometricTransformer blocks over 1+196 tokens per side + coarse
    pose solve (reference coarse_point_matching.py:12-63)."""

    cfg: CoarseMatchingConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p1, f1, geo1, p2, f2, geo2, radius, model_pts, key,
                 train: bool = False, gt_r=None, gt_t=None,
                 dist_field=None, solver=None):
        B = f1.shape[0]
        in_proj = nn.Dense(self.cfg.hidden_dim, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(self.cfg.out_dim, dtype=self.dtype, name="out_proj")
        bg_token = self.param(
            "bg_token", nn.initializers.normal(0.02), (1, 1, self.cfg.hidden_dim)
        )
        bg = jnp.broadcast_to(bg_token, (B, 1, self.cfg.hidden_dim)).astype(
            self.dtype
        )
        f1 = jnp.concatenate([bg, in_proj(f1)], axis=1)
        f2 = jnp.concatenate([bg, in_proj(f2)], axis=1)

        # Stacked embeddings let every self-attention layer run once on
        # (2B, N, C) instead of twice (see GeometricTransformer).
        geo_both = jnp.concatenate([geo1, geo2], axis=0)
        atten_list = []
        for i in range(self.cfg.nblock):
            f1, f2 = GeometricTransformer(
                blocks=("self", "cross"),
                d_model=self.cfg.hidden_dim,
                num_heads=self.cfg.num_heads,
                dtype=self.dtype,
                name=f"transformers_{i}",
            )(f1, geo1, f2, geo2, embeddings_both=geo_both)
            if train or i == self.cfg.nblock - 1:
                atten_list.append(
                    compute_feature_similarity(
                        out_proj(f1),
                        out_proj(f2),
                        self.cfg.sim_type,
                        self.cfg.temp,
                        self.cfg.normalize_feat,
                    )
                )

        norm_model = model_pts / (radius[:, None, None] + 1e-6)
        if train:
            # Training uses a perturbed GT pose for the fine stage init
            # and supervises the attention maps only.
            init_R, init_t = aug_pose_noise(key, gt_r, gt_t)
        elif solver is not None:
            # Injected solver (e.g. hypothesis-parallel shard_map over a
            # mesh axis, parallel/hyp_parallel.py).
            init_R, init_t = solver(
                key, atten_list[-1], p1, p2, norm_model, dist_field
            )
        else:
            init_R, init_t = compute_coarse_Rt(
                key,
                atten_list[-1],
                p1,
                p2,
                norm_model,
                self.cfg.nproposal1,
                self.cfg.nproposal2,
                dist_field=dist_field,
            )
        return init_R, init_t, atten_list


class SharedMLP(nn.Module):
    """Dense + BatchNorm + ReLU stack applied pointwise (channel-last).

    Equivalent of the reference's Conv2d(1x1)+BN2d+ReLU SharedMLP
    (pytorch_utils.py:25-80) in the layout where 1x1 convs are Dense
    matmuls on the MXU.

    `first_dense` / `tail` expose the first linear layer separately so
    callers can commute it with a gather (see PositionalEncoding: the
    first Dense of a grouped MLP is applied to the UNGROUPED points and
    the neighborhood gather moves post-projection rows — wide-row
    gathers lay out well on TPU, (…, 3)-trailing xyz gathers do not).
    """

    channels: Sequence[int]
    dtype: Any = jnp.float32

    def setup(self):
        self.denses = [
            nn.Dense(ch, use_bias=False, dtype=self.dtype, name=f"dense_{i}")
            for i, ch in enumerate(self.channels)
        ]
        self.bns = [
            nn.BatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=f"bn_{i}"
            )
            for i in range(len(self.channels))
        ]

    def __call__(self, x, train: bool = False):
        return self.tail(self.first_dense(x), train)

    def first_dense(self, x):
        """The first linear layer alone (pre-BN)."""
        return self.denses[0](x)

    def tail(self, z, train: bool = False):
        """BN+ReLU of the first layer, then the remaining layers.

        z: output of `first_dense` (possibly gathered/recombined by the
        caller — BN/ReLU and later layers are pointwise, so any linear
        rearrangement of first_dense outputs may happen in between).
        """
        x = nn.relu(self.bns[0](z, use_running_average=not train))
        for dense, bn in zip(self.denses[1:], self.bns[1:]):
            x = nn.relu(
                bn(dense(x), use_running_average=not train)
            )
        return x


class PositionalEncoding(nn.Module):
    """Multi-scale ball-query positional encoding for the fine stage.

    Reference fine_point_matching.py:102-144: two QueryAndGroup scales
    (r=0.1/ns=32, r=0.2/ns=64) -> SharedMLP [32,64,128] each -> max-pool
    over neighbors -> concat -> Dense(out_dim).  The reference's
    `pts2 = pts1 + 1e-8` is an OpenVINO graph-dedup workaround
    (:115-125), not semantics — we group pts1 against itself directly.
    """

    out_dim: int
    r1: float = 0.1
    r2: float = 0.2
    nsample1: int = 32
    nsample2: int = 64
    use_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, train: bool = False):
        from sam6d_tpu.ops.geometry import pairwise_distance
        from sam6d_tpu.ops.pointcloud import ball_query_from_d2

        # Both scales query pts against itself: one pairwise-distance
        # pass shared between the two ball queries.
        d2 = pairwise_distance(pts, pts)
        zeros = jnp.zeros_like(pts)

        def grouped_mlp(mlp, radius, nsample):
            # The grouped input is concat(P[idx] - center, P[idx]); its
            # first Dense output is therefore
            #   P[idx] @ (Wx + Wf) - center @ Wx
            # so apply the first layer to the UNGROUPED points and
            # gather 32-wide post-projection rows instead of xyz triples
            # (wide-row gathers vectorize on TPU lanes; (…, 3) gathers
            # force a scalar-ish layout — see BASELINE.md).
            idx = ball_query_from_d2(d2, radius, nsample)
            if self.use_xyz:
                a = mlp.first_dense(jnp.concatenate([pts, pts], axis=-1))
                c = mlp.first_dense(jnp.concatenate([pts, zeros], axis=-1))
            else:
                a = mlp.first_dense(pts)
                c = jnp.zeros_like(a)
            from sam6d_tpu.ops.pointcloud import gather_neighbors

            # gather_neighbors: same forward gather, but the backward
            # scatter-add runs as an on-chip one-hot matmul — the XLA
            # scatter at these shapes (every target hit ~nsample times)
            # was 93 ms of the 420 ms bs-16 train step (round-4 trace).
            g = gather_neighbors(a, idx)  # (B, M, S, C)
            z = g - c[:, :, None, :]
            f = mlp.tail(z, train)
            return jnp.max(f, axis=2)  # (B, N, 128)

        mlp1 = SharedMLP([32, 64, 128], dtype=self.dtype, name="mlp1")
        mlp2 = SharedMLP([32, 64, 128], dtype=self.dtype, name="mlp2")
        f1 = grouped_mlp(mlp1, self.r1, self.nsample1)
        f2 = grouped_mlp(mlp2, self.r2, self.nsample2)

        f = jnp.concatenate([f1, f2], axis=-1)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="mlp3")(f)


class FinePointMatching(nn.Module):
    """3 SparseToDense blocks over 1+2048 tokens + dense pose solve
    (reference fine_point_matching.py:16-98).

    `pe_p2` lets the serving path pass the template side's positional
    encoding precomputed at onboarding (it depends only on the static
    template cloud — two 2048x2048 ball queries saved per frame).
    """

    cfg: FineMatchingConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.in_proj = nn.Dense(self.cfg.hidden_dim, dtype=self.dtype)
        self.out_proj = nn.Dense(self.cfg.out_dim, dtype=self.dtype)
        self.bg_token = self.param(
            "bg_token", nn.initializers.normal(0.02),
            (1, 1, self.cfg.hidden_dim),
        )
        self.PE = PositionalEncoding(
            self.cfg.hidden_dim,
            r1=self.cfg.pe_radius1,
            r2=self.cfg.pe_radius2,
            nsample1=self.cfg.pe_nsample1,
            nsample2=self.cfg.pe_nsample2,
            dtype=self.dtype,
        )
        # setup auto-names list entries transformers_0, transformers_1, ...
        self.transformers = [
            SparseToDenseTransformer(
                self.cfg.hidden_dim,
                sparse_blocks=("self", "cross"),
                num_heads=self.cfg.num_heads,
                focusing_factor=self.cfg.focusing_factor,
                dtype=self.dtype,
            )
            for i in range(self.cfg.nblock)
        ]

    def compute_pe(self, pts, train: bool = False):
        """Positional encoding only (for template-bank precompute)."""
        return self.PE(pts, train)

    def compute_f2_init(self, f2, pe_p2):
        """Template-side input tokens (bg | in_proj(f2) + pe) — every
        factor is object-static, so the serving bank stores the result
        (see PEM.make_template_bank)."""
        bg = jnp.broadcast_to(
            self.bg_token, (f2.shape[0], 1, self.cfg.hidden_dim)
        ).astype(self.dtype)
        return jnp.concatenate([bg, self.in_proj(f2) + pe_p2], axis=1)

    def __call__(self, p1, f1, geo1, fps_idx1, p2, f2, geo2, fps_idx2,
                 radius, model_pts, init_R, init_t, train: bool = False,
                 pe_p2=None, f2_init=None):
        B = p1.shape[0]
        bg = jnp.broadcast_to(
            self.bg_token, (B, 1, self.cfg.hidden_dim)
        ).astype(self.dtype)

        p1_ = (p1 - init_t[:, None, :]) @ init_R
        f1 = jnp.concatenate([bg, self.in_proj(f1) + self.PE(p1_, train)],
                             axis=1)
        if f2_init is not None:
            # Template side fully precomputed at onboarding
            # (bg | in_proj(f2) + PE(p2)) — see PEM.make_template_bank.
            f2 = f2_init.astype(self.dtype)
        else:
            if pe_p2 is None:
                pe_p2 = self.PE(p2, train)
            f2 = jnp.concatenate([bg, self.in_proj(f2) + pe_p2], axis=1)

        geo_both = jnp.concatenate([geo1, geo2], axis=0)
        atten_list = []
        for i in range(self.cfg.nblock):
            f1, f2 = self.transformers[i](
                f1, geo1, fps_idx1, f2, geo2, fps_idx2,
                embeddings_both=geo_both,
            )
            if train or i == self.cfg.nblock - 1:
                atten_list.append(
                    compute_feature_similarity(
                        self.out_proj(f1),
                        self.out_proj(f2),
                        self.cfg.sim_type,
                        self.cfg.temp,
                        self.cfg.normalize_feat,
                    )
                )

        if train:
            # Training supervises the attention maps only
            # (loss_utils.py:7-52); skip the dense pose solve.
            pred_R = init_R
            pred_t = init_t * (radius[:, None] + 1e-6)
            pose_score = jnp.zeros((B,), p1.dtype)
        else:
            norm_model = model_pts / (radius[:, None, None] + 1e-6)
            pred_R, pred_t, pose_score = compute_fine_Rt(
                atten_list[-1], p1, p2, norm_model, self.cfg.dis_thres
            )
            pred_t = pred_t * (radius[:, None] + 1e-6)
        return pred_R, pred_t, pose_score, atten_list
