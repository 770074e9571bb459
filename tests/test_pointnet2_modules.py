"""PointNet++ SA/FP module tests."""

import numpy as np
import jax
import jax.numpy as jnp

from sam6d_tpu.ops.pointnet2_modules import PointnetFPModule, PointnetSAModule


class TestSAModule:
    def test_shapes(self, rng):
        xyz = jnp.asarray(rng.randn(2, 128, 3), jnp.float32)
        feats = jnp.asarray(rng.randn(2, 128, 16), jnp.float32)
        sa = PointnetSAModule(mlp=[32, 64], npoint=32, radius=0.5, nsample=16)
        variables = sa.init(jax.random.PRNGKey(0), xyz, feats)
        new_xyz, new_feats = sa.apply(variables, xyz, feats)
        assert new_xyz.shape == (2, 32, 3)
        assert new_feats.shape == (2, 32, 64)

    def test_group_all(self, rng):
        xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        feats = jnp.asarray(rng.randn(2, 64, 8), jnp.float32)
        sa = PointnetSAModule(mlp=[16, 32], npoint=None)
        variables = sa.init(jax.random.PRNGKey(0), xyz, feats)
        new_xyz, new_feats = sa.apply(variables, xyz, feats)
        assert new_feats.shape == (2, 1, 32)


class TestFPModule:
    def test_shapes_and_constant_exactness(self, rng):
        unknown = jnp.asarray(rng.randn(1, 96, 3), jnp.float32)
        known = jnp.asarray(rng.randn(1, 24, 3), jnp.float32)
        kf = jnp.ones((1, 24, 8))
        fp = PointnetFPModule(mlp=[16])
        variables = fp.init(jax.random.PRNGKey(0), unknown, known, None, kf)
        out = fp.apply(variables, unknown, known, None, kf)
        assert out.shape == (1, 96, 16)
        assert np.isfinite(np.asarray(out)).all()
