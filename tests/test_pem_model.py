"""PEM model tests: synthetic pose recovery through the solvers and a
full forward smoke test at reduced scale.

The reference has no model-level tests; its "golden" check is visual
comparison of demo outputs (SURVEY.md §4.3).  Here we verify the actual
contract — given a correct correspondence signal the solvers recover the
pose — which holds at any scale and without pretrained weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sam6d_tpu.config import (
    CoarseMatchingConfig,
    FineMatchingConfig,
    GeoEmbeddingConfig,
    PEMConfig,
    ViTConfig,
)
from sam6d_tpu.models.pem.matching import (
    aug_pose_noise,
    compute_coarse_Rt,
    compute_fine_Rt,
)
from sam6d_tpu.models.pem.model import PEM


def random_rotation(rng):
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def make_correspondence_atten(n1, n2, perm, fg_mask, logit=50.0):
    """(1, 1+n1, 1+n2) attention: point i matches perm[i]; bg otherwise."""
    atten = np.zeros((1, n1 + 1, n2 + 1), np.float32)
    atten[0, 0, 0] = logit
    for i in range(n1):
        if fg_mask[i]:
            atten[0, i + 1, perm[i] + 1] = logit
        else:
            atten[0, i + 1, 0] = logit
            atten[0, 0, perm[i] + 1] = logit
    return atten


class TestFineRt:
    def test_recovers_pose_from_perfect_correspondences(self, rng):
        n1 = n2 = 64
        model = rng.randn(1, n2, 3).astype(np.float32)
        R = random_rotation(rng)
        t = rng.randn(3).astype(np.float32)
        perm = rng.permutation(n2)[:n1]
        pts2 = model[0]
        pts1 = (pts2[perm] @ R.T + t)[None]
        fg = np.ones(n1, bool)
        atten = make_correspondence_atten(n1, n2, perm, fg)

        pred_R, pred_t, score = compute_fine_Rt(
            jnp.array(atten), jnp.array(pts1), jnp.array(model), jnp.array(model)
        )
        np.testing.assert_allclose(np.asarray(pred_R)[0], R, atol=1e-2)
        np.testing.assert_allclose(np.asarray(pred_t)[0], t, atol=1e-2)
        assert np.asarray(score)[0] > 0.95

    def test_background_points_lower_score(self, rng):
        n1 = n2 = 64
        model = rng.randn(1, n2, 3).astype(np.float32)
        R = random_rotation(rng)
        t = rng.randn(3).astype(np.float32)
        perm = rng.permutation(n2)[:n1]
        pts1 = (model[0][perm] @ R.T + t)[None]
        fg = np.ones(n1, bool)
        fg[: n1 // 2] = False  # half the points are "background"
        atten = make_correspondence_atten(n1, n2, perm, fg)
        _, _, score = compute_fine_Rt(
            jnp.array(atten), jnp.array(pts1), jnp.array(model), jnp.array(model)
        )
        # score = inlier_fraction * fg_ratio ~ 0.5
        assert 0.3 < float(np.asarray(score)[0]) < 0.7


class TestCoarseRt:
    def test_recovers_pose_from_perfect_correspondences(self, rng):
        n1 = n2 = 48
        model = rng.randn(1, n2, 3).astype(np.float32)
        R = random_rotation(rng)
        t = rng.randn(3).astype(np.float32)
        perm = rng.permutation(n2)[:n1]
        pts1 = (model[0][perm] @ R.T + t)[None]
        fg = np.ones(n1, bool)
        atten = make_correspondence_atten(n1, n2, perm, fg)

        key = jax.random.PRNGKey(0)
        pred_R, pred_t = compute_coarse_Rt(
            key, jnp.array(atten), jnp.array(pts1), jnp.array(model),
            jnp.array(model), n_proposal1=200, n_proposal2=20, score_chunk=10,
        )
        np.testing.assert_allclose(np.asarray(pred_R)[0], R, atol=5e-2)
        np.testing.assert_allclose(np.asarray(pred_t)[0], t, atol=5e-2)


class TestAugPoseNoise:
    def test_shapes_and_bounds(self, rng):
        gt_r = np.stack([random_rotation(rng) for _ in range(4)])
        gt_t = rng.randn(4, 3).astype(np.float32)
        gt_t[:, 2] = np.abs(gt_t[:, 2]) + 1.0  # camera-frame depth > 0
        R, t = aug_pose_noise(jax.random.PRNGKey(0), jnp.array(gt_r),
                              jnp.array(gt_t))
        R, t = np.asarray(R), np.asarray(t)
        assert R.shape == (4, 3, 3) and t.shape == (4, 3)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
        assert np.abs(t - gt_t).max() <= 0.8 + 1e-6
        assert (t[:, 2] >= 1e-6 - 1e-9).all()


def tiny_pem_config():
    return PEMConfig(
        coarse_npoint=16,
        fine_npoint=64,
        feature_extraction=ViTConfig(
            vit_type="vit_base", embed_dim=48, out_dim=32, img_size=32,
            patch_size=8,
        ),
        geo_embedding=GeoEmbeddingConfig(hidden_dim=32),
        coarse_point_matching=CoarseMatchingConfig(
            input_dim=32, hidden_dim=32, out_dim=32, nproposal1=64,
            nproposal2=8, num_heads=4,
        ),
        fine_point_matching=FineMatchingConfig(
            input_dim=32, hidden_dim=32, out_dim=32, num_heads=4,
            pe_nsample1=8, pe_nsample2=16,
        ),
        n_sample_model_point=32,
    )


@pytest.fixture(scope="module")
def tiny_pem():
    """Init a tiny PEM once per module (CPU init is slow)."""
    cfg = tiny_pem_config()
    model = PEM(cfg)
    rng = np.random.RandomState(0)
    B, N, M, H = 2, 64, 32, 32
    batch = dict(
        pts=jnp.array(rng.randn(B, N, 3), jnp.float32),
        rgb=jnp.array(rng.rand(B, H, H, 3), jnp.float32),
        rgb_choose=jnp.array(rng.randint(0, H * H, (B, N)), jnp.int32),
        model_pts=jnp.array(rng.randn(B, M, 3), jnp.float32),
        dense_po=jnp.array(rng.randn(B, N, 3), jnp.float32),
        dense_fo=jnp.array(rng.randn(B, N, 32), jnp.float32),
    )
    variables = model.init(
        jax.random.PRNGKey(0), **batch, key=jax.random.PRNGKey(1)
    )
    return model, variables, batch


class TestPEMForward:
    def test_inference_shapes(self, tiny_pem):
        model, variables, batch = tiny_pem
        out = model.apply(variables, **batch, key=jax.random.PRNGKey(2))
        B = batch["pts"].shape[0]
        assert out["pred_R"].shape == (B, 3, 3)
        assert out["pred_t"].shape == (B, 3)
        assert out["pred_pose_score"].shape == (B,)
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()
        # Rotations are proper.
        np.testing.assert_allclose(
            np.linalg.det(np.asarray(out["pred_R"])), 1.0, atol=1e-3
        )

    def test_jit_compiles(self, tiny_pem):
        model, variables, batch = tiny_pem

        @jax.jit
        def fwd(variables, batch, key):
            return model.apply(variables, **batch, key=key)

        out = fwd(variables, batch, jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(out["pred_R"])).all()

    def test_train_mode_returns_attens(self, tiny_pem):
        model, variables, batch = tiny_pem
        rng = np.random.RandomState(3)
        gt_r = jnp.array(
            np.stack([random_rotation(rng) for _ in range(2)])
        )
        gt_t = jnp.array(rng.randn(2, 3).astype(np.float32))
        out, updates = model.apply(
            variables, **batch, key=jax.random.PRNGKey(2), train=True,
            gt_r=gt_r, gt_t=gt_t, mutable=["batch_stats"],
        )
        assert len(out["coarse_attens"]) == 3
        assert len(out["fine_attens"]) == 3
        assert "batch_stats" in updates


class TestRPEAttentionIdentity:
    def test_pulled_through_projection_matches_direct(self, rng):
        """The q-through-Wp formulation must equal the reference's
        materialized p = proj_p(embed) computation exactly."""
        from sam6d_tpu.models.pem.transformer import RPEMultiHeadAttention

        d_model, H, N, M = 16, 4, 6, 5
        mod = RPEMultiHeadAttention(d_model, H)
        q_in = jnp.asarray(rng.randn(1, N, d_model), jnp.float32)
        k_in = jnp.asarray(rng.randn(1, M, d_model), jnp.float32)
        embed = jnp.asarray(rng.randn(1, N, M, d_model), jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), q_in, k_in, k_in, embed)
        got = np.asarray(mod.apply(variables, q_in, k_in, k_in, embed))

        # Direct reference computation in numpy.
        p = variables["params"]
        def lin(x, name):
            return x @ np.asarray(p[name]["kernel"]) + np.asarray(
                p[name]["bias"])
        hd = d_model // H
        q = lin(np.asarray(q_in), "proj_q").reshape(1, N, H, hd)
        k = lin(np.asarray(k_in), "proj_k").reshape(1, M, H, hd)
        v = lin(np.asarray(k_in), "proj_v").reshape(1, M, H, hd)
        pe = (np.asarray(embed) @ np.asarray(p["proj_p"]["kernel"])
              + np.asarray(p["proj_p"]["bias"])).reshape(1, N, M, H, hd)
        se = np.einsum("bnhd,bmhd->bhnm", q, k)
        sp = np.einsum("bnhd,bnmhd->bhnm", q, pe)
        s = (se + sp) / np.sqrt(hd)
        a = np.exp(s - s.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        want = np.einsum("bhnm,bmhd->bnhd", a, v).reshape(1, N, d_model)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestTemplateBankEquivalence:
    def test_bank_path_matches_full_forward(self, tiny_pem):
        """forward_with_bank (serving) must agree with the full forward
        given identical inputs and PRNG key."""
        model, variables, batch = tiny_pem
        key = jax.random.PRNGKey(5)
        # Use one object's templates for the whole batch (the bank is
        # per-object), replicated like the serving path does.
        dense_po = jnp.tile(batch["dense_po"][:1], (2, 1, 1))
        dense_fo = jnp.tile(batch["dense_fo"][:1], (2, 1, 1))
        bank = model.apply(
            variables, batch["dense_po"][:1], batch["dense_fo"][:1],
            method=PEM.make_template_bank,
        )
        # The serving path pre-scores coarse hypotheses with the bank's
        # min-distance field; thread the same field through the full
        # forward so both paths run the identical scoring program.
        full = model.apply(
            variables, batch["pts"], batch["rgb"], batch["rgb_choose"],
            batch["model_pts"], dense_po, dense_fo, key,
            dist_field=jnp.tile(bank["dist_field"], (2, 1, 1, 1)),
        )
        served = model.apply(
            variables, batch["pts"], batch["rgb"], batch["rgb_choose"],
            batch["model_pts"], bank, key,
            method=PEM.forward_with_bank,
        )
        np.testing.assert_allclose(
            np.asarray(served["pred_R"]), np.asarray(full["pred_R"]),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(served["pred_t"]), np.asarray(full["pred_t"]),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(served["radius"]), np.asarray(full["radius"]),
            atol=1e-5,
        )


class TestGeoEmbeddingTable:
    def test_angle_table_matches_exact(self, rng):
        """The quantized+lerp'd angle Chebyshev-matmul path must be numerically
        indistinguishable from the exact transcendental path."""
        from sam6d_tpu.models.pem.geo_embedding import (
            GeometricStructureEmbedding,
        )

        pts = rng.randn(2, 33, 3).astype(np.float32)
        # Radius-normalized like every real caller (the distance-branch
        # Chebyshev domain assumes it), plus the reference's far-away bg
        # sentinel whose row/col take the exact path.
        pts /= np.linalg.norm(pts, axis=2).max()
        pts[:, 0] = 100.0
        pts = jnp.asarray(pts)

        cfg_exact = GeoEmbeddingConfig(
            hidden_dim=64, angle_cheb_terms=0, dist_cheb_terms=0
        )
        cfg_table = GeoEmbeddingConfig(hidden_dim=64)
        mod_exact = GeometricStructureEmbedding(cfg_exact)
        mod_table = GeometricStructureEmbedding(cfg_table)
        variables = mod_exact.init(jax.random.PRNGKey(0), pts)
        ref = mod_exact.apply(variables, pts)
        out = mod_table.apply(variables, pts)
        err = float(jnp.max(jnp.abs(out - ref)))
        assert err < 1e-4, err

    def test_bf16_recurrence_stays_accurate(self, rng):
        """In bf16 serving the Chebyshev RECURRENCE runs in f32 (ADVICE
        r1: bf16-quantized x into ~10 rad/unit columns costs percent-level
        error); the bf16 path must stay within bf16 matmul noise of the
        exact f32 embedding."""
        from sam6d_tpu.models.pem.geo_embedding import (
            GeometricStructureEmbedding,
        )

        pts = rng.randn(2, 33, 3).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=2).max()
        pts[:, 0] = 100.0
        pts = jnp.asarray(pts)

        cfg_exact = GeoEmbeddingConfig(
            hidden_dim=64, angle_cheb_terms=0, dist_cheb_terms=0
        )
        cfg_table = GeoEmbeddingConfig(hidden_dim=64)
        mod_exact = GeometricStructureEmbedding(cfg_exact)
        mod_bf16 = GeometricStructureEmbedding(cfg_table, dtype=jnp.bfloat16)
        variables = mod_exact.init(jax.random.PRNGKey(0), pts)
        ref = mod_exact.apply(variables, pts)
        out = mod_bf16.apply(variables, pts).astype(jnp.float32)
        scale = float(jnp.abs(ref).max())
        err = float(jnp.max(jnp.abs(out - ref))) / scale
        # bf16 matmul/output noise only: ~2^-8 relative, not percents.
        assert err < 3e-2, err


class TestChosenPixelBilinearGather:
    def test_matches_full_resize_then_gather(self, rng):
        """get_img_feats' folded bilinear gather must equal the
        reference formulation (dense resize to full res, then gather)."""
        from sam6d_tpu.models.pem.feature_extraction import (
            ViTEncoder,
            get_chosen_pixel_feats,
        )

        cfg = ViTConfig(
            embed_dim=48, out_dim=32, img_size=32, patch_size=8,
            depth=2, num_heads=4,
        )
        enc = ViTEncoder(cfg, npoint=16)
        rgb = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        choose = jnp.asarray(
            rng.randint(0, 32 * 32, (2, 50)).astype(np.int32)
        )
        v = enc.init(
            jax.random.PRNGKey(0), rgb, choose,
            method=ViTEncoder.get_img_feats,
        )
        new = enc.apply(v, rgb, choose, method=ViTEncoder.get_img_feats)

        def full(mdl, r, ch):
            fm, _ = mdl.rgb_net(r)
            return get_chosen_pixel_feats(fm, ch)

        ref = enc.apply(v, rgb, choose, method=full)
        assert float(jnp.abs(new - ref).max()) < 1e-5
