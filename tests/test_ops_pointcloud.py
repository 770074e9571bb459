"""Parity tests for the point-cloud op suite against numpy oracles.

Mirrors the reference's op-parity harness strategy
(Pose_Estimation_Model/ov_op_test/, SURVEY.md §4.1): each custom op is
checked at realistic shapes (FPS 21000->2048, ball query r=0.1/0.2
nsample=32/64 on 2048-point clouds) against an independent
straight-forward numpy implementation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sam6d_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    pairwise_distance,
    query_and_group,
    sample_pts_feats,
    three_interpolate,
    three_nn,
)
from sam6d_tpu.ops.pointcloud import interpolation_weights


def np_pairwise_d2(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


def np_fps(pts, npoint):
    """Sequential FPS oracle (first index 0, max-min selection)."""
    N = pts.shape[0]
    idx = np.zeros(npoint, np.int64)
    dists = np.full(N, np.inf)
    for i in range(1, npoint):
        d = ((pts - pts[idx[i - 1]]) ** 2).sum(-1)
        dists = np.minimum(dists, d)
        idx[i] = dists.argmax()
    return idx


def np_ball_query(new_xyz, xyz, radius, nsample):
    """Sequential-scan oracle with first-hit backfill (CUDA semantics)."""
    M, N = new_xyz.shape[0], xyz.shape[0]
    out = np.zeros((M, nsample), np.int64)
    for j in range(M):
        cnt = 0
        for k in range(N):
            if ((xyz[k] - new_xyz[j]) ** 2).sum() < radius**2:
                if cnt == 0:
                    out[j, :] = k
                out[j, cnt] = k
                cnt += 1
                if cnt == nsample:
                    break
    return out


class TestPairwiseDistance:
    def test_matches_numpy(self, rng):
        x = rng.randn(2, 50, 3).astype(np.float32)
        y = rng.randn(2, 30, 3).astype(np.float32)
        got = np.asarray(pairwise_distance(jnp.array(x), jnp.array(y)))
        want = np.stack([np_pairwise_d2(a, b) for a, b in zip(x, y)])
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_channel_first(self, rng):
        x = rng.randn(2, 3, 50).astype(np.float32)
        y = rng.randn(2, 3, 30).astype(np.float32)
        got = np.asarray(
            pairwise_distance(jnp.array(x), jnp.array(y), channel_first=True)
        )
        want = np.stack(
            [np_pairwise_d2(a.T, b.T) for a, b in zip(x, y)]
        )
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestGatherGroup:
    def test_gather(self, rng):
        feats = rng.randn(2, 100, 7).astype(np.float32)
        idx = rng.randint(0, 100, (2, 13)).astype(np.int32)
        got = np.asarray(gather_points(jnp.array(feats), jnp.array(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], feats[b][idx[b]])

    def test_group(self, rng):
        feats = rng.randn(2, 100, 7).astype(np.float32)
        idx = rng.randint(0, 100, (2, 13, 5)).astype(np.int32)
        got = np.asarray(group_points(jnp.array(feats), jnp.array(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], feats[b][idx[b]])


class TestFPS:
    @pytest.mark.parametrize("N,npoint", [(500, 64), (2048, 196)])
    def test_matches_sequential_oracle(self, rng, N, npoint):
        pts = rng.randn(2, N, 3).astype(np.float32)
        got = np.asarray(furthest_point_sample(jnp.array(pts), npoint, use_pallas=False))
        for b in range(2):
            want = np_fps(pts[b], npoint)
            np.testing.assert_array_equal(got[b], want)

    def test_large_shape(self, rng):
        # Realistic template-bank shape (42*500 here; full is 42*5000).
        pts = rng.rand(1, 21000, 3).astype(np.float32)
        idx = np.asarray(furthest_point_sample(jnp.array(pts), 256, use_pallas=False))
        # All unique and a genuinely spread-out sample.
        assert len(np.unique(idx[0])) == 256

    def test_pallas_interpret_matches(self, rng):
        from sam6d_tpu.ops.pallas.fps_kernel import fps_pallas

        pts = rng.randn(2, 300, 3).astype(np.float32)
        with jax.disable_jit(False):
            try:
                from jax.experimental import pallas  # noqa: F401

                got = np.asarray(
                    jax.jit(lambda p: fps_pallas(p, 64))(jnp.array(pts))
                )
            except Exception:
                pytest.skip("pallas interpret mode unavailable on this backend")
        for b in range(2):
            np.testing.assert_array_equal(got[b], np_fps(pts[b], 64))

    def test_sample_pts_feats(self, rng):
        pts = rng.randn(1, 256, 3).astype(np.float32)
        feats = rng.randn(1, 256, 8).astype(np.float32)
        p, f, idx = sample_pts_feats(
            jnp.array(pts), jnp.array(feats), 32, return_index=True
        )
        idx = np.asarray(idx)
        np.testing.assert_array_equal(np.asarray(p)[0], pts[0][idx[0]])
        np.testing.assert_array_equal(np.asarray(f)[0], feats[0][idx[0]])


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.1, 32), (0.2, 64)])
    def test_matches_sequential_oracle(self, rng, radius, nsample):
        # Unit-radius-normalized clouds as in the fine-stage PE
        # (fine_point_matching.py:102-144 uses r=0.1/0.2 on normalized pts).
        xyz = rng.randn(2, 512, 3).astype(np.float32)
        xyz /= np.abs(xyz).max()
        new_xyz = xyz[:, :128]
        got = np.asarray(
            ball_query(jnp.array(new_xyz), jnp.array(xyz), radius, nsample)
        )
        for b in range(2):
            want = np_ball_query(new_xyz[b], xyz[b], radius, nsample)
            np.testing.assert_array_equal(got[b], want)

    def test_no_hits_returns_zero(self):
        xyz = jnp.ones((1, 16, 3)) * 10.0
        new_xyz = jnp.zeros((1, 4, 3))
        got = np.asarray(ball_query(new_xyz, xyz, 0.1, 8))
        np.testing.assert_array_equal(got, 0)

    def test_cylinder_query_matches_sequential_oracle(self, rng):
        # Oracle replicates the reference C++ evaluate loop
        # (ov_pointnet2_op/cylinder_query.cpp:74-158): offsets rotated
        # into the cylinder frame by R^T, radial test on local y/z,
        # height test on local x, first-nsample scan order + backfill.
        from scipy.spatial.transform import Rotation

        from sam6d_tpu.ops import cylinder_query

        B, N, M, ns = 2, 384, 64, 16
        radius, hmin, hmax = 0.3, -0.2, 0.4
        xyz = rng.randn(B, N, 3).astype(np.float32)
        xyz /= np.abs(xyz).max()
        new_xyz = xyz[:, :M]
        rot = (
            Rotation.random(B * M, random_state=0)
            .as_matrix()
            .reshape(B, M, 9)
            .astype(np.float32)
        )
        got = np.asarray(
            cylinder_query(
                jnp.array(new_xyz), jnp.array(xyz), jnp.array(rot),
                radius, hmin, hmax, ns,
            )
        )
        for b in range(B):
            for j in range(M):
                R = rot[b, j].reshape(3, 3)
                d = xyz[b] - new_xyz[b, j]
                local = d @ R  # l_i = sum_j d_j R[j, i]
                hits = np.flatnonzero(
                    (local[:, 1] ** 2 + local[:, 2] ** 2 < radius**2)
                    & (local[:, 0] > hmin)
                    & (local[:, 0] < hmax)
                )[:ns]
                if len(hits) == 0:
                    want = np.zeros(ns, np.int64)
                else:
                    want = np.full(ns, hits[0], np.int64)
                    want[: len(hits)] = hits
                np.testing.assert_array_equal(got[b, j], want)

    def test_query_and_group_shapes(self, rng):
        xyz = rng.randn(2, 256, 3).astype(np.float32)
        feats = rng.randn(2, 256, 16).astype(np.float32)
        out = query_and_group(
            jnp.array(xyz), jnp.array(xyz[:, :64]), jnp.array(feats), 0.5, 32
        )
        assert out.shape == (2, 64, 32, 19)
        # Every query point is its own neighbor (distance 0 < radius), so
        # all rows have >= 1 hit and backfill keeps offsets inside the ball.
        out_np = np.asarray(out)
        offset_norms = np.linalg.norm(out_np[..., :3], axis=-1)
        assert offset_norms.max() < 0.5


class TestThreeNN:
    def test_matches_numpy(self, rng):
        unknown = rng.randn(1, 64, 3).astype(np.float32)
        known = rng.randn(1, 32, 3).astype(np.float32)
        dist, idx = three_nn(jnp.array(unknown), jnp.array(known))
        d2 = np_pairwise_d2(unknown[0], known[0])
        want_idx = np.argsort(d2, axis=1)[:, :3]
        np.testing.assert_array_equal(np.sort(np.asarray(idx)[0]), np.sort(want_idx))
        np.testing.assert_allclose(
            np.asarray(dist)[0],
            np.sort(np.sqrt(d2), axis=1)[:, :3],
            atol=1e-4,
        )

    def test_three_interpolate(self, rng):
        feats = rng.randn(1, 32, 8).astype(np.float32)
        unknown = rng.randn(1, 64, 3).astype(np.float32)
        known = rng.randn(1, 32, 3).astype(np.float32)
        dist, idx = three_nn(jnp.array(unknown), jnp.array(known))
        w = interpolation_weights(dist)
        out = three_interpolate(jnp.array(feats), idx, w)
        assert out.shape == (1, 64, 8)
        # Weights sum to one -> interpolation of a constant field is exact.
        const = jnp.ones((1, 32, 4))
        out_c = three_interpolate(const, idx, w)
        np.testing.assert_allclose(np.asarray(out_c), 1.0, atol=1e-5)

    def test_three_interpolate_gradient(self, rng):
        """Analytic grad vs finite differences (the reference's only
        gradient test: pointnet2_test.py:18-30 gradcheck)."""
        feats = rng.randn(1, 16, 4).astype(np.float64)
        idx = jnp.array(rng.randint(0, 16, (1, 24, 3)), jnp.int32)
        w = rng.rand(1, 24, 3)
        w = jnp.array(w / w.sum(-1, keepdims=True))

        f = lambda x: jnp.sum(jnp.sin(three_interpolate(x, idx, w)))
        g = np.asarray(jax.grad(f)(jnp.array(feats)))
        # Directional derivative vs central difference (f32-friendly).
        eps = 1e-2
        for _ in range(5):
            d = rng.randn(*feats.shape)
            d /= np.linalg.norm(d)
            fd = (float(f(jnp.array(feats + eps * d)))
                  - float(f(jnp.array(feats - eps * d)))) / (2 * eps)
            np.testing.assert_allclose(np.sum(g * d), fd, rtol=2e-2,
                                       atol=1e-3)


class TestWeightedSample:
    """ops/sampling.py: CustomSearchSorted replacement
    (reference utils/model_utils.py:457-467, custom_searchsorted.cpp:62-110)."""

    def test_searchsorted_matches_numpy(self):
        from sam6d_tpu.ops.sampling import searchsorted_by_sort

        rng = np.random.RandomState(3)
        # Realistic PEM coarse-sampling shape: 38416-bin CDF, 18000 draws.
        a = np.sort(rng.rand(2, 38416).astype(np.float32), axis=1)
        v = rng.rand(2, 18000).astype(np.float32)
        # Include exact ties to pin side='left' semantics.
        v[0, :5] = a[0, 100]
        got = np.asarray(searchsorted_by_sort(jnp.array(a), jnp.array(v)))
        ref = np.stack([np.searchsorted(a[i], v[i]) for i in range(2)])
        np.testing.assert_array_equal(got, ref)

    def test_weighted_sample_distribution(self):
        from sam6d_tpu.ops.sampling import weighted_sample

        scores = jnp.array([[0.0, 1.0, 3.0, 0.0, 6.0]], jnp.float32)
        idx = np.asarray(
            weighted_sample(jax.random.PRNGKey(0), scores, 100000)
        )[0]
        freqs = np.bincount(idx, minlength=5) / len(idx)
        np.testing.assert_allclose(freqs, [0, 0.1, 0.3, 0, 0.6], atol=0.01)


class TestGatherNeighborsVJP:
    """gather_neighbors: custom matmul-formulated backward
    (ops/pallas/scatter_rows.py; reference group_points_grad analog,
    _ext_src/src/group_points_gpu.cu atomicAdd kernel)."""

    def test_forward_matches_plain_gather(self):
        from sam6d_tpu.ops.pointcloud import (
            batched_row_gather,
            gather_neighbors,
        )

        rng = np.random.RandomState(0)
        feats = jnp.array(rng.randn(3, 64, 32).astype(np.float32))
        idx = jnp.array(rng.randint(0, 64, (3, 40, 8)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(gather_neighbors(feats, idx)),
            np.asarray(batched_row_gather(feats, idx)),
        )

    def test_grad_matches_autodiff_scatter(self):
        from sam6d_tpu.ops.pointcloud import (
            batched_row_gather,
            gather_neighbors,
        )

        rng = np.random.RandomState(1)
        feats = jnp.array(rng.randn(2, 48, 16).astype(np.float32))
        # Heavy duplication like a real ball query: every target ~S hits.
        idx = jnp.array(rng.randint(0, 48, (2, 48, 12)).astype(np.int32))
        cot = jnp.array(rng.randn(2, 48, 12, 16).astype(np.float32))

        def loss(gather):
            return lambda f: jnp.sum(gather(f, idx) * cot)

        g_custom = np.asarray(jax.grad(loss(gather_neighbors))(feats))
        g_ref = np.asarray(jax.grad(loss(batched_row_gather))(feats))
        np.testing.assert_allclose(g_custom, g_ref, rtol=1e-5, atol=1e-5)

    def test_scatter_rows_xla_drop_negative(self):
        from sam6d_tpu.ops.pallas.scatter_rows import scatter_rows_xla

        idx = jnp.array([[0, 1, 1, -1]], jnp.int32)
        dy = jnp.ones((1, 4, 3), jnp.float32)
        out = np.asarray(scatter_rows_xla(idx, dy, 2))
        np.testing.assert_allclose(out[0, 0], [1, 1, 1])
        np.testing.assert_allclose(out[0, 1], [2, 2, 2])

    def test_scatter_rows_pallas_matches_xla(self):
        # Advisor r4: the TPU training path routes gather backward
        # through scatter_rows_pallas, which the hermetic CPU suite
        # otherwise never validates.  Interpret-mode parity vs the XLA
        # scatter, covering duplicate-index accumulation and the
        # -1-pad drop.
        from sam6d_tpu.ops.pallas.scatter_rows import (
            scatter_rows_pallas,
            scatter_rows_xla,
        )

        rng = np.random.RandomState(2)
        B, Q, N, C = 2, 200, 48, 16
        idx = rng.randint(0, N, (B, Q)).astype(np.int32)
        idx[0, ::7] = -1  # dropped rows
        idx[1, :50] = 3   # heavy duplication on one target
        dy = rng.randn(B, Q, C).astype(np.float32)
        want = np.asarray(scatter_rows_xla(jnp.array(idx), jnp.array(dy), N))
        got = np.asarray(
            scatter_rows_pallas(
                jnp.array(idx), jnp.array(dy), N, block_q=128,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
