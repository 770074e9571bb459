"""Fused Pallas geo-embedding (ops/pallas/geo_embed.py) vs the XLA
formulation (geo_embedding.py): values AND parameter gradients, in
interpret mode on CPU, at coarse-stage-like shapes including the bg
sentinel row/col and a non-block-multiple pair count."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sam6d_tpu.config import GeoEmbeddingConfig
from sam6d_tpu.models.pem.geo_embedding import GeometricStructureEmbedding


def _points(B=2, N=33, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(B, N - 1, 3).astype(np.float32)
    pts /= np.abs(pts).max()
    bg = np.full((B, 1, 3), 100.0, np.float32)
    return jnp.asarray(np.concatenate([bg, pts], axis=1))


@pytest.fixture(scope="module")
def cfg():
    return GeoEmbeddingConfig(hidden_dim=64)


def _modules(cfg):
    fused = GeometricStructureEmbedding(
        dataclasses.replace(cfg, fused="on"), interpret=True
    )
    plain = GeometricStructureEmbedding(dataclasses.replace(cfg, fused="off"))
    return fused, plain


def test_forward_matches(cfg):
    pts = _points()
    fused, plain = _modules(cfg)
    variables = plain.init(jax.random.PRNGKey(0), pts)
    want = np.asarray(plain.apply(variables, pts))
    got = np.asarray(fused.apply(variables, pts))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_param_grads_match(cfg):
    pts = _points(seed=3)
    fused, plain = _modules(cfg)
    variables = plain.init(jax.random.PRNGKey(1), pts)
    cot = jnp.asarray(
        np.random.RandomState(5).randn(*plain.apply(variables, pts).shape)
        .astype(np.float32)
    )

    def loss(mod):
        return lambda p: jnp.sum(mod.apply({"params": p}, pts) * cot)

    g_plain = jax.grad(loss(plain))(variables["params"])
    g_fused = jax.grad(loss(fused))(variables["params"])
    flat_p = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_f = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_fused)
    )
    assert flat_f, "fused path produced no parameter gradients"
    for k, v in flat_p:
        ks = jax.tree_util.keystr(k)
        scale = max(float(np.abs(np.asarray(v)).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(flat_f[ks]), np.asarray(v),
            rtol=2e-3, atol=2e-3 * scale, err_msg=ks,
        )


def test_forward_matches_bf16(cfg):
    """bf16 compute dtype (the training configuration)."""
    pts = _points(seed=7)
    fused = GeometricStructureEmbedding(
        dataclasses.replace(cfg, fused="on"), dtype=jnp.bfloat16,
        interpret=True,
    )
    plain = GeometricStructureEmbedding(
        dataclasses.replace(cfg, fused="off"), dtype=jnp.bfloat16
    )
    variables = plain.init(jax.random.PRNGKey(0), pts)
    want = np.asarray(plain.apply(variables, pts), np.float32)
    got = np.asarray(fused.apply(variables, pts), np.float32)
    # bf16 epsilon ~ 0.8%; the two paths round differently at the
    # matmul inputs.
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
