"""Fused SAM AMG decode tail: per-prompt stage1 -> LN -> GELU -> stage2
-> hypernetwork contraction -> threshold statistics, in one Pallas
kernel that never writes an intermediate (or a mask logit) to HBM.

Reference hot loop: segment_anything/automatic_mask_generator.py:266-321
+ modeling/mask_decoder.py:16 — the reference materializes every
prompt's (4, 256, 256) logits, then filters on host.  Round-2 traces
showed the XLA tail running at 0.9% MFU / ~150-250 GB/s effective: the
(B, N, 4, 64/128) stage intermediates and the (B*4, 256, 256) logits
are pure HBM traffic (BASELINE.md decode findings).  This kernel reads
each prompt's post-transformer image features (4096, 256) ONCE from HBM
and emits 8x12 floats of statistics — the counts and boxes that AMG
filtering actually consumes:

  row 0: count(logit > thr + stability_offset)   per column
  row 1: count(logit > thr - stability_offset)   (stability denominator)
  row 2..5: xmin / ymin / xmax / ymax over logit > thr (BIG when empty)
  row 6: count(logit > thr)                      (emptiness)
  row 7: unused (lane-tile padding)

Columns are the (e, f, t) = (stage-2 row offset, col offset, mask
token) nesting produced by the flat block-channel ConvTranspose layout
(models/ism/sam/decoder.py ConvTranspose2x2); `fold_stats` reduces them
to per-token values.  Kept masks' logits are recomputed afterwards for
the (much smaller) top-K set only (sam/amg.py).

Layout notes (measured round 1/2, CLAUDE.md): trailing tiny dims are
poison, so stage-1 columns stay flat (a, d, c4) and the LN over each
64-channel group is computed with two tiny MXU matmuls against static
group-indicator matrices instead of a (R, 4, 64) reshape; stage 2 runs
as four (R, 64) @ (64, 128) slices — no relayouts anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _gelu_fast(x):
    """Sigmoid-form GELU x * sigmoid(1.702 x) (Hendrycks & Gimpel):
    one exp + one approximate reciprocal per element, vs ~12 ops for an
    erf polynomial (Mosaic has no erf/erfc lowering at all).  Max
    deviation from exact GELU is ~0.02 at |x|~2.3.

    Accuracy budget: this kernel produces FILTER STATISTICS, not mask
    logits — kept masks are recomputed with exact-erf XLA afterwards
    (sam/amg.py).  A 0.02-level logit wobble moves per-mask stability
    by <~1% (ratio of thousands of counts) and boxes by at most a
    boundary pixel; candidate selection uses iou + 1e-3*stability, so
    the selection-score perturbation is ~1e-5.  Measured: the erf
    version spent 43 ms/frame on 3.2e9 transcendental evaluations —
    the whole point of the fusion was to stop paying HBM, not to start
    paying VPU."""
    return x * pl.reciprocal(1.0 + jnp.exp(-1.702 * x), approx=True)


def _kernel(keys_ref, hyper_ref, w1_ref, b1_ref, lns_ref, lnb_ref,
            w2_ref, b2_ref, out_ref, *, R: int, grid_side: int,
            thr: float, off: float, ln_eps: float):
    r = pl.program_id(1)

    x = keys_ref[0].astype(jnp.float32)  # (R, 256)
    h1 = (
        jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    )  # (R, 256), cols (a, d, c4)

    # LayerNorm over each 64-channel (a, d) group without reshapes:
    # group means/second-moments via static indicator matmuls.
    cols = jax.lax.broadcasted_iota(jnp.int32, (256, 4), 0) // 64
    grp = jax.lax.broadcasted_iota(jnp.int32, (256, 4), 1)
    G = jnp.where(cols == grp, 1.0 / 64.0, 0.0)  # (256, 4)
    Gb = G.T * 64.0  # (4, 256) indicator
    mu = jnp.dot(h1, G, preferred_element_type=jnp.float32)  # (R, 4)
    ex2 = jnp.dot(h1 * h1, G, preferred_element_type=jnp.float32)
    mu_f = jnp.dot(mu, Gb, preferred_element_type=jnp.float32)
    var_f = jnp.dot(ex2, Gb, preferred_element_type=jnp.float32) - mu_f * mu_f
    xn = (h1 - mu_f) * jax.lax.rsqrt(var_f + ln_eps)
    xn = xn * lns_ref[:] + lnb_ref[:]
    g = _gelu_fast(xn)  # (R, 256)

    # Hypernetwork weights as a (128, 12) block-diagonal matrix built
    # from this prompt's (3, 32) hyper vectors: cols (e, f, t).
    hyp = hyper_ref[0].astype(jnp.float32)  # (3, 32)
    tile = jnp.tile(hyp.T, (4, 4))  # (128, 12)
    rr = jax.lax.broadcasted_iota(jnp.int32, (128, 12), 0) // 32
    cc = jax.lax.broadcasted_iota(jnp.int32, (128, 12), 1) // 3
    Wh = jnp.where(rr == cc, tile, 0.0)

    # Per-(row, col) output-pixel coordinates shared across ad except
    # for the (2a, 2d) offsets added below.
    n = r * R + jax.lax.broadcasted_iota(jnp.int32, (R, 12), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, 12), 1)
    Ybase = 4 * (n // grid_side) + (col // 6)
    Xbase = 4 * (n % grid_side) + ((col // 3) % 2)

    hi = jnp.zeros((1, 12), jnp.float32)
    lo = jnp.zeros((1, 12), jnp.float32)
    pos = jnp.zeros((1, 12), jnp.float32)
    xmin = jnp.full((1, 12), _BIG, jnp.float32)
    ymin = jnp.full((1, 12), _BIG, jnp.float32)
    xmax = jnp.full((1, 12), -_BIG, jnp.float32)
    ymax = jnp.full((1, 12), -_BIG, jnp.float32)
    for ad in range(4):
        a, d = ad // 2, ad % 2
        ga = g[:, ad * 64:(ad + 1) * 64]  # (R, 64)
        y2 = (
            jnp.dot(ga, w2_ref[:], preferred_element_type=jnp.float32)
            + b2_ref[:]
        )  # (R, 128), cols (e, f, c8)
        y2 = _gelu_fast(y2)
        m = jnp.dot(y2, Wh, preferred_element_type=jnp.float32)  # (R, 12)
        mp = m > thr
        hi += jnp.sum((m > thr + off).astype(jnp.float32), axis=0,
                      keepdims=True)
        lo += jnp.sum((m > thr - off).astype(jnp.float32), axis=0,
                      keepdims=True)
        pos += jnp.sum(mp.astype(jnp.float32), axis=0, keepdims=True)
        Y = (Ybase + 2 * a).astype(jnp.float32)
        X = (Xbase + 2 * d).astype(jnp.float32)
        xmin = jnp.minimum(
            xmin, jnp.min(jnp.where(mp, X, _BIG), axis=0, keepdims=True)
        )
        ymin = jnp.minimum(
            ymin, jnp.min(jnp.where(mp, Y, _BIG), axis=0, keepdims=True)
        )
        xmax = jnp.maximum(
            xmax, jnp.max(jnp.where(mp, X, -_BIG), axis=0, keepdims=True)
        )
        ymax = jnp.maximum(
            ymax, jnp.max(jnp.where(mp, Y, -_BIG), axis=0, keepdims=True)
        )

    stats = jnp.concatenate(
        [hi, lo, xmin, ymin, xmax, ymax, pos,
         jnp.zeros((1, 12), jnp.float32)],
        axis=0,
    )  # (8, 12)

    @pl.when(r == 0)
    def _():
        out_ref[0] = stats

    @pl.when(r > 0)
    def _():
        prev = out_ref[0]
        out_ref[0] = jnp.concatenate(
            [
                prev[0:2] + stats[0:2],
                jnp.minimum(prev[2:4], stats[2:4]),
                jnp.maximum(prev[4:6], stats[4:6]),
                prev[6:8] + stats[6:8],
            ],
            axis=0,
        )


@functools.partial(
    jax.jit,
    static_argnames=("mask_threshold", "stability_offset", "ln_eps",
                     "row_tile", "interpret"),
)
def decode_tail_stats(
    keys: jax.Array,
    hyper: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    mask_threshold: float = 0.0,
    stability_offset: float = 1.0,
    ln_eps: float = 1e-6,
    row_tile: int = 2048,
    interpret: bool = False,
):
    """Fused tail statistics for every (prompt, mask-token) pair.

    Args:
      keys: (P, N, 256) post-transformer image features (N = h*w, h=w).
      hyper: (P, 3, 32) hypernetwork outputs of mask tokens 1..3.
      w1: (256, 256) stage-1 kernel, cols (a, d, c4) — ConvTranspose2x2
        kernel reshaped (C, 4*c4); b1: (256,) bias tiled 4x.
      ln_scale/ln_bias: (256,) LayerNorm2d params tiled 4x.
      w2: (64, 128) stage-2 kernel, cols (e, f, c8); b2: (128,).
    Returns:
      (P, 8, 12) float32 statistics (see module docstring).
    """
    P, N, C = keys.shape
    grid_side = int(round(np.sqrt(N)))
    assert grid_side * grid_side == N, N
    R = min(row_tile, N)
    assert N % R == 0, (N, R)

    kern = functools.partial(
        _kernel, R=R, grid_side=grid_side,
        thr=float(mask_threshold), off=float(stability_offset),
        ln_eps=float(ln_eps),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((P, 8, 12), jnp.float32),
        grid=(P, N // R),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda p, r: (p, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 32), lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 256), lambda p, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda p, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda p, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda p, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda p, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda p, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 12), lambda p, r: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        keys,
        hyper,
        w1.astype(jnp.float32),
        b1.reshape(1, 256).astype(jnp.float32),
        ln_scale.reshape(1, 256).astype(jnp.float32),
        ln_bias.reshape(1, 256).astype(jnp.float32),
        w2.astype(jnp.float32),
        b2.reshape(1, 128).astype(jnp.float32),
    )


def fold_stats(stats: jax.Array, upscale: float):
    """(P, 8, 12) kernel stats -> per-token AMG quantities.

    Returns:
      stability: (P, 3) = count(>thr+off) / count(>thr-off).
      boxes: (P, 3, 4) xyxy in logit coords * upscale, [xmin, ymin,
        xmax+1, ymax+1], zeros when the mask is empty (the
        sam/amg.mask_to_box convention).
      n_pos: (P, 3) pixel count above threshold.
    """
    s = stats.reshape(stats.shape[0], 8, 4, 3)  # cols (e*2+f, t)
    hi = s[:, 0].sum(axis=1)
    lo = s[:, 1].sum(axis=1)
    xmin = s[:, 2].min(axis=1)
    ymin = s[:, 3].min(axis=1)
    xmax = s[:, 4].max(axis=1)
    ymax = s[:, 5].max(axis=1)
    n_pos = s[:, 6].sum(axis=1)
    stability = hi / jnp.maximum(lo, 1.0)
    boxes = jnp.stack(
        [xmin, ymin, xmax + 1.0, ymax + 1.0], axis=-1
    ) * upscale
    boxes = jnp.where((n_pos > 0)[..., None], boxes, 0.0)
    return stability, boxes, n_pos


def decode_tail_stats_reference(
    keys, hyper, w1, b1, ln_scale, ln_bias, w2, b2,
    *, mask_threshold=0.0, stability_offset=1.0, ln_eps=1e-6,
):
    """jnp mirror of the kernel arithmetic (f32), for parity tests."""
    P, N, C = keys.shape
    side = int(round(np.sqrt(N)))
    def gelu_fast(v):
        # mirror of the kernel's sigmoid-form GELU (exact reciprocal
        # here; the kernel's approx reciprocal differs at ~2^-14)
        return v * jax.nn.sigmoid(1.702 * v)

    x = keys.astype(jnp.float32)
    h1 = x @ w1.astype(jnp.float32) + b1.astype(jnp.float32)
    h1 = h1.reshape(P, N, 4, 64)
    mu = h1.mean(axis=-1, keepdims=True)
    var = ((h1 - mu) ** 2).mean(axis=-1, keepdims=True)
    xn = (h1 - mu) / jnp.sqrt(var + ln_eps)
    xn = xn.reshape(P, N, 256) * ln_scale + ln_bias
    g = gelu_fast(xn)
    g = g.reshape(P, N, 4, 64)
    y2 = jnp.einsum("pnac,ck->pnak", g, w2.astype(jnp.float32)) + b2
    y2 = gelu_fast(y2)
    # y2 cols (e, f, c8); contract c8 with hyper.
    y2 = y2.reshape(P, N, 4, 4, 32)  # (a d) (e f) c8
    m = jnp.einsum("pnjkc,ptc->ptnjk", y2, hyper.astype(jnp.float32))
    # pixel (4y+2a+e, 4x+2d+f)
    yy, xx = jnp.divmod(jnp.arange(N), side)
    a, d = jnp.divmod(jnp.arange(4), 2)
    e, f = jnp.divmod(jnp.arange(4), 2)
    Y = 4 * yy[:, None, None] + 2 * a[None, :, None] + e[None, None, :]
    X = 4 * xx[:, None, None] + 2 * d[None, :, None] + f[None, None, :]
    thr, off = mask_threshold, stability_offset
    mp = m > thr
    hi = (m > thr + off).sum(axis=(2, 3, 4))
    lo = (m > thr - off).sum(axis=(2, 3, 4))
    n_pos = mp.sum(axis=(2, 3, 4))
    Yb = jnp.broadcast_to(Y[None, None], m.shape)
    Xb = jnp.broadcast_to(X[None, None], m.shape)
    xmin = jnp.where(mp, Xb, _BIG).min(axis=(2, 3, 4))
    ymin = jnp.where(mp, Yb, _BIG).min(axis=(2, 3, 4))
    xmax = jnp.where(mp, Xb, -_BIG).max(axis=(2, 3, 4))
    ymax = jnp.where(mp, Yb, -_BIG).max(axis=(2, 3, 4))
    return dict(hi=hi, lo=lo, n_pos=n_pos, xmin=xmin, ymin=ymin,
                xmax=xmax, ymax=ymax)
