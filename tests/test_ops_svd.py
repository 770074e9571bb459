"""Parity tests for closed-form 3x3 SVD / eigh / det and weighted
Procrustes against numpy.linalg and torch oracles.

Mirrors the reference ov_op_test/ov_test_custom_svd.py /
ov_test_custom_det.py comparison pattern, with numpy/torch as the oracle
instead of the torch-vs-OpenVINO pair.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sam6d_tpu.ops import det3x3, eigh3x3, svd3x3, weighted_procrustes


def random_rotation(rng):
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


class TestDet:
    def test_matches_numpy(self, rng):
        m = rng.randn(64, 3, 3).astype(np.float32)
        got = np.asarray(det3x3(jnp.array(m)))
        np.testing.assert_allclose(got, np.linalg.det(m), rtol=1e-4, atol=1e-5)


class TestEigh:
    def test_random_symmetric(self, rng):
        a = rng.randn(256, 3, 3).astype(np.float32)
        A = a @ a.transpose(0, 2, 1)
        w, V = eigh3x3(jnp.array(A))
        w, V = np.asarray(w), np.asarray(V)
        want = np.sort(np.linalg.eigvalsh(A), axis=-1)[:, ::-1]
        np.testing.assert_allclose(w, want, rtol=1e-3, atol=1e-3)
        # A V = V diag(w)
        AV = A @ V
        VW = V * w[:, None, :]
        np.testing.assert_allclose(AV, VW, atol=5e-3)
        # Orthonormal, right-handed.
        VtV = V.transpose(0, 2, 1) @ V
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=1e-4)

    def test_degenerate_spherical(self):
        A = np.eye(3, dtype=np.float32)[None].repeat(4, 0) * 2.5
        w, V = eigh3x3(jnp.array(A))
        np.testing.assert_allclose(np.asarray(w), 2.5, atol=1e-5)
        VtV = np.asarray(V).transpose(0, 2, 1) @ np.asarray(V)
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=1e-5)

    def test_degenerate_repeated_pair(self):
        A = np.diag([3.0, 3.0, 1.0]).astype(np.float32)[None]
        w, V = eigh3x3(jnp.array(A))
        np.testing.assert_allclose(np.asarray(w)[0], [3.0, 3.0, 1.0], atol=1e-5)
        VtV = np.asarray(V)[0].T @ np.asarray(V)[0]
        np.testing.assert_allclose(VtV, np.eye(3), atol=1e-5)


class TestSVD:
    def test_reconstruction_random(self, rng):
        H = rng.randn(512, 3, 3).astype(np.float32)
        U, s, V = svd3x3(jnp.array(H))
        U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
        want_s = np.linalg.svd(H, compute_uv=False)
        np.testing.assert_allclose(s, want_s, rtol=1e-3, atol=1e-3)
        recon = U @ (s[..., None] * V.transpose(0, 2, 1))
        np.testing.assert_allclose(recon, H, atol=5e-3)

    def test_rank2(self, rng):
        # The coarse stage builds H from 3 centered points -> rank <= 2
        # (model_utils.py:253-255).
        x = rng.randn(128, 3, 3).astype(np.float32)
        x -= x.mean(1, keepdims=True)
        y = rng.randn(128, 3, 3).astype(np.float32)
        y -= y.mean(1, keepdims=True)
        H = x.transpose(0, 2, 1) @ y
        U, s, V = svd3x3(jnp.array(H))
        U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
        recon = U @ (s[..., None] * V.transpose(0, 2, 1))
        np.testing.assert_allclose(recon, H, atol=1e-2)
        np.testing.assert_allclose(
            U.transpose(0, 2, 1) @ U, np.broadcast_to(np.eye(3), U.shape), atol=1e-3
        )


class TestWeightedProcrustes:
    def test_exact_recovery(self, rng):
        # R, t recovered exactly from noiseless correspondences.
        src = rng.randn(8, 100, 3).astype(np.float32)
        Rs = np.stack([random_rotation(rng) for _ in range(8)])
        ts = rng.randn(8, 3).astype(np.float32)
        ref = src @ Rs.transpose(0, 2, 1) + ts[:, None, :]
        R, t = weighted_procrustes(jnp.array(src), jnp.array(ref))
        np.testing.assert_allclose(np.asarray(R), Rs, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), ts, atol=1e-3)

    def test_three_point_hypotheses(self, rng):
        # Rank-2 minimal case used by the coarse hypothesis solver.
        src = rng.randn(64, 3, 3).astype(np.float32)
        Rs = np.stack([random_rotation(rng) for _ in range(64)])
        ts = rng.randn(64, 3).astype(np.float32)
        ref = src @ Rs.transpose(0, 2, 1) + ts[:, None, :]
        R, t = weighted_procrustes(jnp.array(src), jnp.array(ref))
        # Proper rotations.
        dets = np.linalg.det(np.asarray(R))
        np.testing.assert_allclose(dets, 1.0, atol=1e-3)
        # Alignment residual ~ 0.
        aligned = src @ np.asarray(R).transpose(0, 2, 1) + np.asarray(t)[:, None, :]
        np.testing.assert_allclose(aligned, ref, atol=5e-3)

    def test_weights_ignore_outliers(self, rng):
        src = rng.randn(4, 50, 3).astype(np.float32)
        Rs = np.stack([random_rotation(rng) for _ in range(4)])
        ts = rng.randn(4, 3).astype(np.float32)
        ref = src @ Rs.transpose(0, 2, 1) + ts[:, None, :]
        ref[:, 40:] += 100.0  # corrupt the last 10 correspondences
        w = np.ones((4, 50), np.float32)
        w[:, 40:] = 0.0
        R, t = weighted_procrustes(jnp.array(src), jnp.array(ref), jnp.array(w))
        np.testing.assert_allclose(np.asarray(R), Rs, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), ts, atol=1e-3)

    def test_matches_torch_oracle(self, rng):
        torch = pytest.importorskip("torch")
        src = rng.randn(16, 20, 3).astype(np.float32)
        ref = (src + 0.1 * rng.randn(16, 20, 3)).astype(np.float32)
        w = rng.rand(16, 20).astype(np.float32)

        # Independent torch oracle (PointDSC-style weighted Kabsch).
        ts_src = torch.tensor(src)
        ts_ref = torch.tensor(ref)
        ts_w = torch.tensor(w)
        wn = ts_w / (ts_w.sum(1, keepdim=True) + 1e-5)
        cs = (ts_src * wn[..., None]).sum(1, keepdim=True)
        cr = (ts_ref * wn[..., None]).sum(1, keepdim=True)
        H = (ts_src - cs).transpose(1, 2) @ (wn[..., None] * (ts_ref - cr))
        U, S, Vh = torch.linalg.svd(H)
        V = Vh.transpose(1, 2)
        E = torch.eye(3).repeat(16, 1, 1)
        E[:, 2, 2] = torch.sign(torch.det(V @ U.transpose(1, 2)))
        R_t = V @ E @ U.transpose(1, 2)
        t_t = cr.squeeze(1) - (R_t @ cs.transpose(1, 2)).squeeze(2)

        R, t = weighted_procrustes(
            jnp.array(src), jnp.array(ref), jnp.array(w), weight_thresh=0.0
        )
        np.testing.assert_allclose(np.asarray(R), R_t.numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(t), t_t.numpy(), atol=2e-3)
