"""Flash RPE attention kernel vs the unfused XLA reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sam6d_tpu.ops.pallas.flash_rpe import (
    flash_rpe_attention,
    rpe_attention_reference,
)


def _case(rng, BH, h, w, d):
    N = h * w
    q = jnp.asarray(rng.randn(BH, N, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(BH, N, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(BH, N, d).astype(np.float32))
    rh = jnp.asarray(rng.randn(2 * h - 1, d).astype(np.float32) * 0.1)
    rw = jnp.asarray(rng.randn(2 * w - 1, d).astype(np.float32) * 0.1)
    return q, k, v, rh, rw


class TestFlashRPE:
    @pytest.mark.parametrize(
        "BH,h,w,d,bq,bk",
        [
            (3, 8, 8, 16, 32, 32),     # multi-block square grid
            (2, 14, 14, 80, 256, 256), # SAM windowed shape (padded)
            (1, 8, 16, 24, 64, 32),    # rectangular grid, uneven blocks
        ],
    )
    def test_matches_reference(self, rng, BH, h, w, d, bq, bk):
        q, k, v, rh, rw = _case(rng, BH, h, w, d)
        ref = rpe_attention_reference(q, k, v, rh, rw, (h, w))
        out = flash_rpe_attention(
            q, k, v, rh, rw, (h, w), block_q=bq, block_k=bk,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)

    def test_encoder_wiring(self, rng):
        """ImageEncoderViT(flash=True) == ImageEncoderViT(flash=False)
        through the module (params shared), incl. windowed + global
        blocks."""
        from sam6d_tpu.models.ism.sam.encoder import ImageEncoderViT

        kw = dict(img_size=32, patch_size=8, embed_dim=32, depth=2,
                  num_heads=2, window_size=2, global_attn_indexes=(1,))
        x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
        enc_ref = ImageEncoderViT(flash=False, **kw)
        variables = enc_ref.init(jax.random.PRNGKey(0), x)
        # Non-zero rel-pos tables so the bias path is actually exercised.
        variables = jax.tree.map(
            lambda a: a + 0.05 if a.ndim == 2 else a, variables)
        ref = enc_ref.apply(variables, x)
        out = ImageEncoderViT(flash=True, **kw).apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-4)

    def test_extreme_logits_stable(self, rng):
        """Online softmax must survive large score ranges."""
        q, k, v, rh, rw = _case(rng, 1, 8, 8, 16)
        q = q * 40.0
        ref = rpe_attention_reference(q, k, v, rh, rw, (8, 8))
        out = flash_rpe_attention(q, k, v, rh, rw, (8, 8),
                                  block_q=32, block_k=32, interpret=True)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-3)


class TestPlainFlash:
    def test_matches_xla_attention(self, rng):
        """flash_attention (no bias) vs the materialized softmax path,
        interpret mode, at a non-block-multiple sequence length."""
        from sam6d_tpu.ops.pallas.flash_rpe import flash_attention

        BH, N, d = 4, 257, 64
        q = jnp.asarray(rng.randn(BH, N, d).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.randn(BH, N, d).astype(np.float32) * 0.3)
        v = jnp.asarray(rng.randn(BH, N, d).astype(np.float32))
        got = flash_attention(q, k, v, block_q=128, block_k=128,
                              interpret=True)
        attn = jax.nn.softmax(
            jnp.einsum("znd,zmd->znm", q, k) / np.sqrt(d), axis=-1
        )
        want = jnp.einsum("znm,zmd->znd", attn, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )
