"""Fused (flash) attention with decomposed relative-position bias.

The SAM image encoder's hot kernel. The reference computes
`attn = q@k.T*scale` then materializes the full attention matrix to add
the decomposed rel-pos bias (segment_anything/modeling/image_encoder.py
add_decomposed_rel_pos :325) and softmax it — at the 4 global blocks
that is a (heads, 4096, 4096) tensor round-tripped through HBM several
times (measured 27 ms/block on v5e vs ~1 ms of matmul FLOPs).

This kernel streams k/v blocks through VMEM with the online-softmax
recurrence and reconstructs the bias per (q_tile, k_tile) on-chip:

  bias[n, m] = q[n]·Rh[y(n)-y(m)+h-1] + q[n]·Rw[x(n)-x(m)+w-1]

is factored outside the kernel into per-token tables
  QRh[n, Y] = q[n]·Rh[y(n)-Y+h-1]   (BH, N, h)
  QRw[n, X] = q[n]·Rw[x(n)-X+w-1]   (BH, N, w)
(tiny: N x (h+w) per head) and reassembled inside as two MXU matmuls
against one-hot k-block selectors:  bias_tile = QRh_tile @ YH[j] +
QRw_tile @ XH[j].  No (N, N) tensor ever exists.

Used for both the 14x14 windowed blocks (batch = windows*heads) and the
64x64 global blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, qrh_ref, qrw_ref, yh_ref, xh_ref,
            kmask_ref, out_ref, *, scale: float, block_k: int):
    """Grid (BH, nq). Full k/v for this batch element resident in VMEM."""
    q = q_ref[0]          # (bq, dpad)
    qrh = qrh_ref[0]      # (bq, h)
    qrw = qrw_ref[0]      # (bq, w)
    bq, dpad = q.shape
    Np = k_ref.shape[1]
    nk = Np // block_k

    def body(j, carry):
        m_i, l_i, acc = carry
        kblk = k_ref[0, pl.ds(j * block_k, block_k), :]   # (bk, dpad)
        vblk = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                         # (bq, bk)
        bias = jax.lax.dot_general(
            qrh, yh_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            qrw, xh_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias + kmask_ref[0, pl.ds(j * block_k, block_k)][None, :]

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, dpad), jnp.float32)
    _, l_f, acc_f = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    out_ref[0] = (acc_f / jnp.maximum(l_f, 1e-30)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("hw", "block_q", "block_k", "interpret"),
)
def flash_rpe_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    hw: tuple[int, int],
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Softmax(q k^T/sqrt(d) + decomposed rel-pos bias) v, fused.

    Args:
      q, k, v: (BH, N, d) with N == h*w tokens in row-major (y, x) order.
      rel_pos_h: (2h-1, d) table; rel_pos_w: (2w-1, d).
      hw: the (h, w) token grid.

    Returns:
      (BH, N, d), same dtype as q.
    """
    BH, N, d = q.shape
    h, w = hw
    assert N == h * w, (N, hw)
    scale = 1.0 / float(np.sqrt(d))

    Np = _round_up(N, max(block_q, block_k))
    block_q = min(block_q, Np)
    block_k = min(block_k, Np)
    # No explicit head-dim padding: Mosaic pads lanes internally without
    # HBM copies, and the un-padded K dim skips wasted MXU work
    # (measured 3.15 -> 0.57 ms on the 16x4096x80 global block).
    dpad = d

    n = np.arange(Np)
    y = np.where(n < N, n // w, 0)
    x = np.where(n < N, n % w, 0)

    # Per-token rel-pos tables: QRh[z, n, Y] = q[z, n]·Rh[y(n)-Y+h-1].
    # One wide matmul against the raw (2h-1, d) table, then static
    # reversed slices per grid row: QA[..., y-Y+h-1] over Y=0..h-1 is
    # QA[..., y:y+h] flipped. (A direct einsum against gathered tables
    # is h/w-wide matmuls — ~11% MXU lane utilization at h=14.)
    qg = q.reshape(BH, h, w, d)
    qa_h = jnp.einsum("zyxd,rd->zyxr", qg, rel_pos_h)      # (BH,h,w,2h-1)
    qa_w = jnp.einsum("zyxd,rd->zyxr", qg, rel_pos_w)      # (BH,h,w,2w-1)
    qrh = jnp.stack(
        [qa_h[:, yy, :, yy:yy + h][..., ::-1] for yy in range(h)], axis=1
    ).reshape(BH, N, h)
    qrw = jnp.stack(
        [qa_w[:, :, xx, xx:xx + w][..., ::-1] for xx in range(w)], axis=2
    ).reshape(BH, N, w)

    # One-hot k-block selectors (nk, h|w, block_k) and the padded-token
    # mask; all tiny and shared across the batch.
    nk = Np // block_k
    yb = y.reshape(nk, block_k)
    xb = x.reshape(nk, block_k)
    yh = (yb[:, None, :] == np.arange(h)[None, :, None]).astype(q.dtype)
    xh = (xb[:, None, :] == np.arange(w)[None, :, None]).astype(q.dtype)
    kmask = np.where(n < N, 0.0, NEG_INF).astype(np.float32)[None]  # (1, Np)

    pad_n = Np - N
    pad = lambda a: jnp.pad(a, ((0, 0), (0, pad_n), (0, dpad - d)))
    qp, kp, vp = pad(q), pad(k), pad(v)
    qrh = jnp.pad(qrh, ((0, 0), (0, pad_n), (0, 0)))
    qrw = jnp.pad(qrw, ((0, 0), (0, pad_n), (0, 0)))

    nq = Np // block_q
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((BH, Np, dpad), q.dtype),
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, dpad), lambda z, i: (z, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, dpad), lambda z, i: (z, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, dpad), lambda z, i: (z, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, h), lambda z, i: (z, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, w), lambda z, i: (z, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nk, h, block_k), lambda z, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nk, w, block_k), lambda z, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda z, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dpad), lambda z, i: (z, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, qrh, qrw, yh, xh, jnp.asarray(kmask))
    return out[:, :N, :d]


def _kernel_plain(q_ref, k_ref, v_ref, kmask_ref, out_ref, *, scale: float,
                  block_k: int):
    """Grid (BH, nq); the no-bias variant of `_kernel` (used by the
    DINOv2 descriptor ViT, whose materialized (BH, N, N) attention is
    pure HBM traffic at N=257 x 2048 batch-heads)."""
    q = q_ref[0]          # (bq, d)
    bq, dpad = q.shape
    Np = k_ref.shape[1]
    nk = Np // block_k

    def body(j, carry):
        m_i, l_i, acc = carry
        kblk = k_ref[0, pl.ds(j * block_k, block_k), :]
        vblk = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + kmask_ref[0, pl.ds(j * block_k, block_k)][None, :]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, dpad), jnp.float32)
    _, l_f, acc_f = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    out_ref[0] = (acc_f / jnp.maximum(l_f, 1e-30)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v without materializing the (N, N)
    attention matrix.  q, k, v: (BH, N, d); returns (BH, N, d)."""
    BH, N, d = q.shape
    scale = 1.0 / float(np.sqrt(d))
    Np = _round_up(N, max(block_q, block_k))
    block_q = min(block_q, Np)
    block_k = min(block_k, Np)

    n = np.arange(Np)
    kmask = np.where(n < N, 0.0, NEG_INF).astype(np.float32)[None]
    pad_n = Np - N
    pad = lambda a: jnp.pad(a, ((0, 0), (0, pad_n), (0, 0)))
    qp, kp, vp = pad(q), pad(k), pad(v)

    nq = Np // block_q
    out = pl.pallas_call(
        functools.partial(_kernel_plain, scale=scale, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((BH, Np, d), q.dtype),
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda z, i: (z, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, d), lambda z, i: (z, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, d), lambda z, i: (z, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda z, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda z, i: (z, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, jnp.asarray(kmask))
    return out[:, :N, :]


def rpe_attention_reference(q, k, v, rel_pos_h, rel_pos_w, hw):
    """Unfused XLA reference (the original encoder formulation), used as
    the parity oracle for the kernel."""
    BH, N, d = q.shape
    h, w = hw
    scale = 1.0 / float(np.sqrt(d))
    attn = jnp.einsum("znd,zmd->znm", q, k) * scale
    coords_h = np.arange(h)[:, None] - np.arange(h)[None, :] + h - 1
    coords_w = np.arange(w)[:, None] - np.arange(w)[None, :] + w - 1
    Rh = rel_pos_h[jnp.asarray(coords_h)]  # (h, h, d)
    Rw = rel_pos_w[jnp.asarray(coords_w)]  # (w, w, d)
    qg = q.reshape(BH, h, w, d)
    bias_h = jnp.einsum("zyxd,yYd->zyxY", qg, Rh)
    bias_w = jnp.einsum("zyxd,xXd->zyxX", qg, Rw)
    attn = attn.reshape(BH, h, w, h, w)
    attn = attn + bias_h[..., None] + bias_w[..., :, None, :]
    attn = attn.reshape(BH, N, N)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("znm,zmd->znd", attn, v)
