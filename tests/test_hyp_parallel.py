"""Hypothesis-parallel coarse solver on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from sam6d_tpu.parallel.hyp_parallel import sharded_compute_coarse_Rt
from sam6d_tpu.parallel.mesh import make_mesh

from tests.test_pem_model import make_correspondence_atten, random_rotation


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
