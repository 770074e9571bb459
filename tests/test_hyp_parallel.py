"""Hypothesis-parallel coarse solver on the 8-device virtual mesh."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from sam6d_tpu.parallel.hyp_parallel import sharded_compute_coarse_Rt
from sam6d_tpu.parallel.mesh import make_mesh

from tests.test_pem_model import make_correspondence_atten, random_rotation


@pytest.mark.slow


class TestShardedCoarseRt:
    def test_recovers_pose_on_mesh(self, rng):
        assert len(jax.devices()) == 8
        mesh = make_mesh((8,), axis_names=("hyp",))

        n1 = n2 = 48
        model = rng.randn(1, n2, 3).astype(np.float32)
        R = random_rotation(rng)
        t = rng.randn(3).astype(np.float32)
        perm = rng.permutation(n2)[:n1]
        pts1 = (model[0][perm] @ R.T + t)[None]
        atten = make_correspondence_atten(
            n1, n2, perm, np.ones(n1, bool)
        )

        pred_R, pred_t = sharded_compute_coarse_Rt(
            mesh, "hyp", jax.random.PRNGKey(0),
            jnp.asarray(atten), jnp.asarray(pts1), jnp.asarray(model),
            jnp.asarray(model), n_proposal1=512, n_proposal2=64,
        )
        np.testing.assert_allclose(np.asarray(pred_R)[0], R, atol=5e-2)
        np.testing.assert_allclose(np.asarray(pred_t)[0], t, atol=5e-2)

    def test_batched(self, rng):
        mesh = make_mesh((8,), axis_names=("hyp",))
        B, n = 2, 32
        model = rng.randn(B, n, 3).astype(np.float32)
        Rs = np.stack([random_rotation(rng) for _ in range(B)])
        ts = rng.randn(B, 3).astype(np.float32)
        pts1 = np.einsum("bij,bnj->bni", Rs, model) + ts[:, None]
        attens = []
        for b in range(B):
            attens.append(
                make_correspondence_atten(
                    n, n, np.arange(n), np.ones(n, bool)
                )[0]
            )
        atten = np.stack(attens)
        pred_R, pred_t = sharded_compute_coarse_Rt(
            mesh, "hyp", jax.random.PRNGKey(1),
            jnp.asarray(atten), jnp.asarray(pts1), jnp.asarray(model),
            jnp.asarray(model), n_proposal1=256, n_proposal2=32,
        )
        np.testing.assert_allclose(np.asarray(pred_R), Rs, atol=5e-2)
        np.testing.assert_allclose(np.asarray(pred_t), ts, atol=5e-2)

    def test_dp_x_hyp_with_dist_field(self, rng):
        """2-D mesh: batch sharded over dp, hypotheses over hyp, with the
        bank's shared (1, G, G, G) dist field threaded through."""
        from sam6d_tpu.ops.distance_field import build_min_dist_field

        mesh = make_mesh((2, 4), axis_names=("dp", "hyp"))
        B, n = 2, 32
        model = rng.randn(1, n, 3).astype(np.float32)
        model /= np.abs(model).max()
        model_b = np.tile(model, (B, 1, 1))
        Rs = np.stack([random_rotation(rng) for _ in range(B)])
        ts = 0.1 * rng.randn(B, 3).astype(np.float32)
        pts1 = np.einsum("bij,nj->bni", Rs, model[0]) + ts[:, None]
        atten = np.stack(
            [
                make_correspondence_atten(
                    n, n, np.arange(n), np.ones(n, bool)
                )[0]
                for _ in range(B)
            ]
        )
        field = build_min_dist_field(jnp.asarray(model))

        pred_R, pred_t = sharded_compute_coarse_Rt(
            mesh, "hyp", jax.random.PRNGKey(2),
            jnp.asarray(atten), jnp.asarray(pts1), jnp.asarray(model_b),
            jnp.asarray(model_b), n_proposal1=256, n_proposal2=32,
            dist_field=field, batch_axis="dp",
        )
        np.testing.assert_allclose(np.asarray(pred_R), Rs, atol=5e-2)
        np.testing.assert_allclose(np.asarray(pred_t), ts, atol=5e-2)


class TestRunnerHypParallel:
    @pytest.mark.slow
    def test_runner_uses_hyp_mesh(self, rng):
        """PEMRunner on a dp x hyp mesh produces valid poses via the
        sharded solver (wired through forward_with_bank)."""
        import jax.numpy as jnp

        from sam6d_tpu.pipeline.pem_runner import PEMRunner
        from tests.test_pem_model import tiny_pem_config

        cfg = tiny_pem_config()
        runner = PEMRunner(cfg)
        variables = runner.init_random()
        mesh = make_mesh((2, 4), axis_names=("dp", "hyp"))
        runner_hp = PEMRunner(cfg, variables=variables, mesh=mesh)
        assert runner_hp._coarse_solver is not None

        N = cfg.fine_npoint
        S = cfg.feature_extraction.img_size
        tem_pts = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.02)
        tem_feat = jnp.asarray(
            rng.randn(1, N, cfg.feature_extraction.out_dim).astype(
                np.float32
            )
        )
        for r in (runner, runner_hp):
            r.template_bank = r._make_bank(variables, tem_pts, tem_feat)

        n_inst = 2
        inp = {
            "pts": rng.randn(n_inst, N, 3).astype(np.float32) * 0.02,
            "rgb": rng.rand(n_inst, S, S, 3).astype(np.float32),
            "rgb_choose": rng.randint(0, S * S, (n_inst, N)).astype(
                np.int32
            ),
            "model_pts": rng.randn(
                n_inst, cfg.n_sample_model_point, 3
            ).astype(np.float32) * 0.02,
            "score": np.ones(n_inst, np.float32),
        }
        out = runner_hp.infer(dict(inp))
        assert out["pred_R"].shape == (n_inst, 3, 3)
        dets = np.linalg.det(out["pred_R"])
        np.testing.assert_allclose(dets, 1.0, atol=1e-2)
        assert np.isfinite(out["pred_t"]).all()
