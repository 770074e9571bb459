"""Tests for the precomputed min-distance voxel field
(ops/distance_field.py) and its use in the coarse hypothesis rescore.

The field replaces the reference's exact (300, 196, 1024)
nearest-model-point reduction (model_utils.py:261-274) for hypothesis
PRE-scoring; exactness of the final pose comes from the exact rescore of
the field's leaders (matching.compute_coarse_Rt dist_field path).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sam6d_tpu.ops.distance_field import (
    FIELD_EXTENT,
    build_min_dist_field,
    sample_min_dist,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def exact_min_dist(points, queries):
    """(M, 3), (Q, 3) -> (Q,) numpy oracle."""
    d2 = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    return np.sqrt(d2.min(axis=1))


class TestDistanceField:
    def test_in_grid_error_bound(self, rng):
        """Nearest-voxel lookup error <= voxel half-diagonal + field
        discretization (both O(step))."""
        pts = rng.randn(1, 256, 3).astype(np.float32)
        pts /= np.abs(pts).max() * 1.2
        G = 64
        field = build_min_dist_field(jnp.asarray(pts), resolution=G)
        q = rng.uniform(-1.0, 1.0, (1, 512, 3)).astype(np.float32)
        got = np.asarray(
            sample_min_dist(
                field,
                jnp.asarray(q[..., 0]),
                jnp.asarray(q[..., 1]),
                jnp.asarray(q[..., 2]),
            )
        )[0]
        want = exact_min_dist(pts[0], q[0])
        step = 2 * FIELD_EXTENT / G
        # query->voxel-center rounding: half-diagonal of a voxel.
        tol = step * np.sqrt(3)
        assert np.max(np.abs(got - want)) <= tol + 1e-6

    def test_outside_grid_monotone(self, rng):
        """Far-away queries keep growing distances (clamp + correction)."""
        pts = jnp.zeros((1, 8, 3))
        field = build_min_dist_field(pts, resolution=32)
        xs = jnp.asarray([[1.5, 2.5, 4.0]])
        d = np.asarray(
            sample_min_dist(field, xs, jnp.zeros_like(xs), jnp.zeros_like(xs))
        )[0]
        assert d[0] < d[1] < d[2]
        # and roughly equals the true distance to the origin cloud
        np.testing.assert_allclose(d, [1.5, 2.5, 4.0], atol=0.15)

    def test_batched_fields_independent(self, rng):
        pts = rng.randn(2, 128, 3).astype(np.float32) * 0.5
        field = build_min_dist_field(jnp.asarray(pts), resolution=48)
        q = rng.uniform(-0.8, 0.8, (2, 64, 3)).astype(np.float32)
        got = np.asarray(
            sample_min_dist(
                field,
                jnp.asarray(q[..., 0]),
                jnp.asarray(q[..., 1]),
                jnp.asarray(q[..., 2]),
            )
        )
        step = 2 * FIELD_EXTENT / 48
        for b in range(2):
            want = exact_min_dist(pts[b], q[b])
            assert np.max(np.abs(got[b] - want)) <= step * np.sqrt(3) + 1e-6


class TestCoarseRtWithField:
    def test_field_path_recovers_pose(self, rng):
        """compute_coarse_Rt with a dist_field still recovers a planted
        rigid transform from a clean correspondence attention."""
        from scipy.spatial.transform import Rotation

        from sam6d_tpu.models.pem.matching import compute_coarse_Rt

        N = 96
        pts2 = rng.randn(1, N, 3).astype(np.float32)
        pts2 /= np.abs(pts2).max() * 1.1
        R_gt = Rotation.random(random_state=1).as_matrix().astype(np.float32)
        t_gt = np.array([0.15, -0.1, 0.2], np.float32)
        pts1 = pts2 @ R_gt.T + t_gt

        atten = np.full((1, N + 1, N + 1), -8.0, np.float32)
        atten[0, 1:, 1:] += 16.0 * np.eye(N)
        field = build_min_dist_field(jnp.asarray(pts2), resolution=64)

        R, t = compute_coarse_Rt(
            jax.random.PRNGKey(0),
            jnp.asarray(atten),
            jnp.asarray(pts1),
            jnp.asarray(pts2),
            n_proposal1=512,
            n_proposal2=64,
            dist_field=field,
            n_refine=8,
        )
        np.testing.assert_allclose(np.asarray(R)[0], R_gt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(t)[0], t_gt, atol=5e-3)
