"""Fused AMG decode-tail kernel: parity vs the plain-XLA decode path.

The kernel (ops/pallas/decode_tail.py) replaces the reference's
materialize-all-logits loop (segment_anything/automatic_mask_generator
.py:266-321) with per-prompt fused statistics; these tests pin (a) the
kernel arithmetic against a jnp mirror, (b) the fold_stats box/stability
semantics against the mask-level utilities, and (c) the full fused
_decode_and_filter path against the XLA one on a tiny SAM.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sam6d_tpu.ops.pallas.decode_tail import (
    decode_tail_stats,
    decode_tail_stats_reference,
    fold_stats,
)


def _rand_inputs(rng, P=3, N=64, scale=0.5):
    keys = jnp.asarray(rng.randn(P, N, 256).astype(np.float32) * scale)
    hyper = jnp.asarray(rng.randn(P, 3, 32).astype(np.float32) * scale)
    w1 = jnp.asarray(rng.randn(256, 256).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(256).astype(np.float32) * 0.05)
    lns = jnp.asarray(1.0 + 0.1 * rng.randn(256).astype(np.float32))
    lnb = jnp.asarray(0.1 * rng.randn(256).astype(np.float32))
    w2 = jnp.asarray(rng.randn(64, 128).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(128).astype(np.float32) * 0.05)
    return dict(keys=keys, hyper=hyper, w1=w1, b1=b1, ln_scale=lns,
                ln_bias=lnb, w2=w2, b2=b2)


class TestKernelParity:
    @pytest.mark.parametrize("N,row_tile", [(64, 64), (256, 64)])
    def test_stats_match_reference(self, N, row_tile):
        """Kernel == jnp mirror, incl. the multi-row-tile accumulation
        path (N=256, row_tile=64 revisits the output 4x)."""
        rng = np.random.RandomState(0)
        inp = _rand_inputs(rng, P=3, N=N)
        stats = decode_tail_stats(
            **inp, mask_threshold=0.0, stability_offset=0.3,
            row_tile=row_tile, interpret=True,
        )
        ref = decode_tail_stats_reference(
            **inp, mask_threshold=0.0, stability_offset=0.3,
        )
        s = np.asarray(stats).reshape(stats.shape[0], 8, 4, 3)
        # Count atol 8 (~0.5%): the kernel's approx reciprocal
        # (~2^-14 rel err) and tiled-matmul rounding flip pixels whose
        # logit sits within ~1e-4 of a threshold; boxes may move by a
        # boundary pixel for the same reason.
        np.testing.assert_allclose(s[:, 0].sum(1), ref["hi"], atol=8)
        np.testing.assert_allclose(s[:, 1].sum(1), ref["lo"], atol=8)
        np.testing.assert_allclose(s[:, 6].sum(1), ref["n_pos"], atol=8)
        np.testing.assert_allclose(s[:, 2].min(1), ref["xmin"], atol=4)
        np.testing.assert_allclose(s[:, 3].min(1), ref["ymin"], atol=4)
        np.testing.assert_allclose(s[:, 4].max(1), ref["xmax"], atol=4)
        np.testing.assert_allclose(s[:, 5].max(1), ref["ymax"], atol=4)

    def test_stats_match_decoder_tail(self):
        """Kernel stats vs statistics computed from the ACTUAL decoder
        tail masks (f32, exact-erf GELU): the kernel's sigmoid-form
        GELU (~0.02 max logit deviation) may flip boundary pixels, so
        stability tolerates 0.02 and boxes a couple of pixels — the
        kept masks' logits themselves are recomputed exactly in XLA."""
        from sam6d_tpu.models.ism.sam.amg import (
            calculate_stability_score,
            mask_to_box,
        )
        from sam6d_tpu.models.ism.sam.decoder import MaskDecoder

        rng = np.random.RandomState(1)
        P, h = 2, 8
        N = h * h
        dec = MaskDecoder()
        emb = jnp.asarray(rng.randn(P, h, h, 256).astype(np.float32) * 0.3)
        pe = jnp.asarray(rng.randn(1, h, h, 256).astype(np.float32) * 0.3)
        sp = jnp.asarray(rng.randn(P, 2, 256).astype(np.float32) * 0.3)
        dn = jnp.asarray(rng.randn(P, h, h, 256).astype(np.float32) * 0.3)
        variables = dec.init(jax.random.PRNGKey(0), emb, pe, sp, dn)

        keys, hyper, iou = dec.apply(
            variables, emb, pe, sp, dn,
            method=MaskDecoder.transformer_forward,
        )
        masks = dec.apply(
            variables, keys, hyper, h, h, method=MaskDecoder.tail
        )[:, 1:]  # (P, 3, 4h, 4h)
        params = dec.apply(
            variables, method=MaskDecoder.tail_kernel_params
        )
        thr, off = 0.0, 0.25
        stats = decode_tail_stats(
            keys, hyper[:, 1:], **params, mask_threshold=thr,
            stability_offset=off, interpret=True,
        )
        stability, boxes, n_pos = fold_stats(stats, 1.0)

        flat = masks.reshape(P * 3, 4 * h, 4 * h)
        stab_ref = np.asarray(calculate_stability_score(flat, thr, off))
        boxes_ref = np.asarray(mask_to_box(flat > thr))
        np.testing.assert_allclose(
            np.asarray(stability).reshape(-1), stab_ref, atol=0.02
        )
        np.testing.assert_allclose(
            np.asarray(boxes).reshape(-1, 4), boxes_ref, atol=3.0
        )
        np.testing.assert_array_equal(
            np.asarray(n_pos).reshape(-1) > 0,
            np.asarray(flat > thr).any(axis=(1, 2)),
        )


class TestFusedDecodePath:
    @pytest.mark.slow
    def test_fused_matches_xla_path(self):
        """Full _decode_and_filter: fused (stats kernel + top-K logit
        recompute) vs the plain XLA path on a tiny SAM, same candidate
        set, same logits."""
        import functools

        from sam6d_tpu.models.ism.sam.amg import (
            _decode_and_filter_all,
            _decode_and_filter_fused,
            build_point_grid,
        )
        from tests.test_ism import tiny_sam

        sam = tiny_sam()
        emb = sam.encode(
            jnp.asarray(
                np.random.RandomState(0)
                .randn(1, 64, 64, 3)
                .astype(np.float32)
            )
        )
        pts = jnp.asarray(
            build_point_grid(3) * 64, np.float32
        )[None]  # 9 prompts -> 27 candidates
        kw = dict(
            sam=sam, points_per_batch=3, mask_threshold=0.0,
            stability_offset=1.0, top_k=27,
        )
        lx, ix, sx, bx = _decode_and_filter_all(emb, pts, **kw)
        lf, i_f, sf, bf = _decode_and_filter_fused(
            emb, pts, interpret=True, **kw
        )
        # Same candidates, possibly different order: align by score.
        ox = np.argsort(np.asarray(ix + 1e-3 * sx))
        of = np.argsort(np.asarray(i_f + 1e-3 * sf))
        np.testing.assert_allclose(
            np.asarray(ix)[ox], np.asarray(i_f)[of], atol=1e-5
        )
        # fused stability/boxes come from the sigmoid-GELU stats kernel
        # (~0.02 logit deviation -> boundary pixels can flip)
        np.testing.assert_allclose(
            np.asarray(sx)[ox], np.asarray(sf)[of], atol=0.02
        )
        np.testing.assert_allclose(
            np.asarray(bx)[ox], np.asarray(bf)[of], atol=3.0
        )
        np.testing.assert_allclose(
            np.asarray(lx)[ox], np.asarray(lf)[of], atol=1e-3, rtol=1e-3
        )

    def test_generate_masks_fused_flag(self):
        """generate_masks with fused_tail forced on (interpret) returns
        the same mask set as the XLA path on a real image."""
        import dataclasses

        from sam6d_tpu.config import SegmentorConfig
        from sam6d_tpu.models.ism.sam.amg import SamAutomaticMaskGenerator
        from tests.test_ism import tiny_sam

        sam = tiny_sam()
        rng = np.random.RandomState(3)
        image = (rng.rand(48, 60, 3) * 255).astype(np.uint8)
        outs = []
        for fused in (False, True):
            cfg = SegmentorConfig(
                points_per_side=4, points_per_batch=8,
                pred_iou_thresh=-1e9, stability_score_thresh=-1e9,
                segmentor_width_size=0, fused_tail=fused,
            )
            gen = SamAutomaticMaskGenerator(sam, cfg)
            outs.append(gen.generate_masks(image))
        a, b = outs
        assert a["masks"].shape == b["masks"].shape
        # identical pixels up to float tie-breaks on identical scores
        same = (a["masks"] == b["masks"]).mean()
        assert same > 0.999, same


class TestSharedKeysFactorization:
    def test_singleton_image_batch_matches_broadcast(self):
        """Decoder with image side at batch 1 (block-1 projections
        shared across prompts) == explicitly broadcast image batch."""
        from sam6d_tpu.models.ism.sam.decoder import MaskDecoder

        rng = np.random.RandomState(5)
        B, h = 5, 8
        dec = MaskDecoder()
        emb1 = jnp.asarray(rng.randn(1, h, h, 256).astype(np.float32) * 0.3)
        pe = jnp.asarray(rng.randn(1, h, h, 256).astype(np.float32) * 0.3)
        sp = jnp.asarray(rng.randn(B, 2, 256).astype(np.float32) * 0.3)
        dn1 = jnp.asarray(rng.randn(1, h, h, 256).astype(np.float32) * 0.3)
        variables = dec.init(jax.random.PRNGKey(0), emb1, pe, sp, dn1)

        m1, i1 = dec.apply(variables, emb1, pe, sp, dn1)
        embB = jnp.broadcast_to(emb1, (B, h, h, 256))
        dnB = jnp.broadcast_to(dn1, (B, h, h, 256))
        mB, iB = dec.apply(variables, embB, pe, sp, dnB)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(mB),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(iB),
                                   atol=2e-5, rtol=1e-5)
