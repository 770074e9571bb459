"""Fused geometric-structure embedding (Chebyshev basis + max-over-k)
as a Pallas fwd/bwd pair.

The coarse geometric embedding (geo_embedding.py, reference
transformer.py:288-363) evaluates a projected sinusoidal embedding of
the pairwise-distance field plus a max over k=3 triplet-angle
embeddings.  The XLA formulation materializes the (B, N, N, k, d)
angle-embedding tensor (1.9 GB at the bs-16 train step) plus the
(B, N, N, k, P) Chebyshev bases in HBM, and the max backward
re-materializes both to build its selection mask — measured 14.0 ms
fwd + 7.8 ms bwd standalone at the (32, 197, 197) coarse shape, more
inside the train step where it shares fusion buckets (BASELINE.md
round 4; VERDICT r4 #4 names this cluster the next sink).

This kernel keeps the k axis AND the bases on-chip: per tile it runs
the Chebyshev recurrences on the scalar index fields in VMEM, hits the
MXU with a (P, S, R) x (P, d) dot per branch, reduces the k-max in
registers, and writes only the (B, N*N, d) result.  The backward
recomputes the branch embeddings (cheap: the recurrence is a handful
of VPU fmas) to rebuild the argmax mask and accumulates the TINY
parameter cotangents (dMd (Pd, d), dMa (Pa, d), dbias (1, d)) across
the sequential grid — index fields are stop_gradient'd upstream
(geo_embedding.py:114-123), so no (B, N, N, ...) cotangent ever
exists.

Layout notes (each measured the hard way):
  * The pair axis is processed FLATTENED ((B, N, N) -> (B, N*N), a
    free reshape); blocks take SB=8 batch rows x R pair columns so
    every VPU op runs at full sublane occupancy — the first cut used
    (1, R) slabs (1/8 of the VPU) and its backward lost 3x to XLA.
  * Mosaic supports the 3D dot_general (P, S, R) x (P, d) -> (S, R, d)
    directly (probed on v5e), so the stacked basis multiplies against
    the coefficient matrix without any relayout.
  * Partial edge blocks are handled in-kernel with iota validity masks
    on the COTANGENT (out writes are masked by Pallas already); index
    loads are where-masked to 0 before the recurrence so edge garbage
    can never reach an accumulator as inf*0.
  * The unrolled recurrences + mask recompute exceed the 16 MB
    scoped-vmem default; vmem_limit_bytes raises it (v5e has 128 MB).

Reference analog: none — the reference materializes the full tensors
(transformer.py:305-341); this is TPU roofline engineering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _cheb_basis(x, P):
    """Chebyshev basis: list of P arrays shaped like x (f32)."""
    t_prev = jnp.ones_like(x)
    t_cur = x
    terms = [t_prev, t_cur]
    for _ in range(P - 2):
        t_prev, t_cur = t_cur, 2.0 * x * t_cur - t_prev
        terms.append(t_cur)
    return terms[:P]


def _norm_idx(raw, hi):
    """Index field -> Chebyshev domain [-1, 1] (clamped: edge-block
    garbage must stay bounded through the recurrence)."""
    x = raw * (2.0 / hi) - 1.0
    return jnp.clip(x, -1.0, 1.0)


def _basis(x, P):
    """(S, R) f32 scalar field -> (P, S, R) stacked basis."""
    return jnp.stack(_cheb_basis(x, P), axis=0)


def _branch(x, P, m_ref):
    """(S, R) scalar field -> (S, R, d) projected embedding."""
    t = _basis(x, P).astype(m_ref.dtype)
    return jax.lax.dot_general(
        t, m_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(d_idx_ref, a_idx_ref, md_ref, ma_ref, bias_ref, out_ref,
                *, hi_d: float, hi_a: float, k: int, pd: int, pa: int):
    xd = _norm_idx(d_idx_ref[...].astype(jnp.float32), hi_d)  # (S, R)
    acc = _branch(xd, pd, md_ref)  # (S, R, d)
    amax = None
    for kk in range(k):
        xa = _norm_idx(a_idx_ref[:, kk].astype(jnp.float32), hi_a)
        ek = _branch(xa, pa, ma_ref)
        amax = ek if amax is None else jnp.maximum(amax, ek)
    out_ref[...] = (
        acc + amax + bias_ref[...].astype(jnp.float32)
    ).astype(out_ref.dtype)


def _bwd_kernel(d_idx_ref, a_idx_ref, md_ref, ma_ref, g_ref,
                dmd_ref, dma_ref, dbias_ref,
                *, hi_d: float, hi_a: float, k: int, pd: int, pa: int,
                n_batch: int, total: int, sb: int, block_r: int):
    bi = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when((bi == 0) & (r == 0))
    def _init():
        dmd_ref[...] = jnp.zeros_like(dmd_ref)
        dma_ref[...] = jnp.zeros_like(dma_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    # Validity mask for partial edge blocks (batch rows AND pair cols).
    # Built separately in 2D and 3D: expanding an i1 vector's minor dim
    # is unsupported by Mosaic (32-bit types only).
    row = jax.lax.broadcasted_iota(jnp.int32, (sb, block_r), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sb, block_r), 1)
    valid = ((row + bi * sb) < n_batch) & ((col + r * block_r) < total)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (sb, block_r, 1), 0)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (sb, block_r, 1), 1)
    valid3 = ((row3 + bi * sb) < n_batch) & ((col3 + r * block_r) < total)

    g = jnp.where(
        valid3, g_ref[...].astype(jnp.float32), 0.0
    )  # (S, R, d)

    xd = _norm_idx(d_idx_ref[...].astype(jnp.float32), hi_d)
    xd = jnp.where(valid, xd, 0.0)
    td = _basis(xd, pd).astype(jnp.bfloat16)  # (Pd, S, R)
    gb = g.astype(jnp.bfloat16)
    # dMd += sum_{s,r} Td[:, s, r] * g[s, r, :].  Mosaic's matmul
    # supports only ONE contracting dim; unroll the S=8 sublane rows
    # into 2D (Pd, R) x (R, d) dots (the r contraction carries the
    # work: R >= 512).
    acc_d = None
    for s in range(td.shape[1]):
        part = jax.lax.dot_general(
            td[:, s], gb[s], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_d = part if acc_d is None else acc_d + part
    dmd_ref[...] += acc_d
    dbias_ref[...] += jnp.sum(g, axis=(0, 1))[None]

    # Recompute the k branch embeddings to rebuild the max mask.
    xas, eks = [], []
    emax = None
    for kk in range(k):
        xa = _norm_idx(a_idx_ref[:, kk].astype(jnp.float32), hi_a)
        xa = jnp.where(valid, xa, 0.0)
        ek = _branch(xa, pa, ma_ref)
        xas.append(xa)
        eks.append(ek)
        emax = ek if emax is None else jnp.maximum(emax, ek)
    # Tie count for the even-split max-VJP convention (jnp.max splits
    # the cotangent equally among ties).
    cnt = None
    for ek in eks:
        m = (ek == emax).astype(jnp.float32)
        cnt = m if cnt is None else cnt + m
    for xa, ek in zip(xas, eks):
        gk = (g * (ek == emax).astype(jnp.float32) / cnt).astype(
            jnp.bfloat16
        )
        ta = _basis(xa, pa).astype(jnp.bfloat16)
        acc_a = None
        for s in range(ta.shape[1]):
            part = jax.lax.dot_general(
                ta[:, s], gk[s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_a = part if acc_a is None else acc_a + part
        dma_ref[...] += acc_a


def _flatten_pair_axes(d_idx, a_idx):
    B, N, M = d_idx.shape
    k = a_idx.shape[-1]
    d_flat = d_idx.reshape(B, N * M)
    # (B, N, M, k) -> (B, k, N*M): k in the middle so each slice is a
    # clean 2D field (a trailing k=3 minor dim is layout poison,
    # CLAUDE.md) and the (SB, k, R) block stays legal (k == array dim).
    a_flat = jnp.moveaxis(a_idx, -1, 1).reshape(B, k, N * M)
    return d_flat, a_flat


def _sb(B: int) -> int:
    """Batch rows per block: 8 (full sublane occupancy) or the whole
    batch when it is smaller (a block dim may exceed neither the array
    dim nor legality: equal-to-array-dim is always legal)."""
    return 8 if B >= 8 else B


@functools.partial(
    jax.jit,
    static_argnames=("hi_d", "hi_a", "out_dtype", "block_r", "interpret"),
)
def _geo_embed_fwd_call(d_flat, a_flat, Md, Ma, bias, *, hi_d, hi_a,
                        out_dtype, block_r=1024, interpret=False):
    B, T = d_flat.shape
    k = a_flat.shape[1]
    pd, d = Md.shape
    pa = Ma.shape[0]
    sb = _sb(B)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hi_d=hi_d, hi_a=hi_a, k=k,
                          pd=pd, pa=pa),
        grid=(pl.cdiv(B, sb), pl.cdiv(T, block_r)),
        in_specs=[
            pl.BlockSpec((sb, block_r), lambda b, r: (b, r)),
            pl.BlockSpec((sb, k, block_r), lambda b, r: (b, 0, r)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (sb, block_r, d), lambda b, r: (b, r, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(d_flat, a_flat, Md, Ma, bias)


@functools.partial(
    jax.jit,
    static_argnames=("hi_d", "hi_a", "block_r", "interpret"),
)
def _geo_embed_bwd_call(d_flat, a_flat, Md, Ma, g, *, hi_d, hi_a,
                        block_r=512, interpret=False):
    B, T = d_flat.shape
    k = a_flat.shape[1]
    pd, d = Md.shape
    pa = Ma.shape[0]
    sb = _sb(B)
    dmd, dma, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, hi_d=hi_d, hi_a=hi_a, k=k,
                          pd=pd, pa=pa, n_batch=B, total=T, sb=sb,
                          block_r=block_r),
        grid=(pl.cdiv(B, sb), pl.cdiv(T, block_r)),
        in_specs=[
            pl.BlockSpec((sb, block_r), lambda b, r: (b, r)),
            pl.BlockSpec((sb, k, block_r), lambda b, r: (b, 0, r)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, block_r, d), lambda b, r: (b, r, 0)),
        ],
        out_specs=[
            pl.BlockSpec((pd, d), lambda b, r: (0, 0)),
            pl.BlockSpec((pa, d), lambda b, r: (0, 0)),
            pl.BlockSpec((1, d), lambda b, r: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pd, d), jnp.float32),
            jax.ShapeDtypeStruct((pa, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(d_flat, a_flat, Md, Ma, g)
    return dmd, dma, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def geo_embed_maxk(d_idx, a_idx, Md, Ma, bias, hi_d, hi_a,
                   out_dtype=jnp.float32, interpret=False):
    """out[b,n,m] = T_cheb(d_idx) @ Md + max_k T_cheb(a_idx_k) @ Ma + bias.

    Args:
      d_idx: (B, N, M) f32 distance indices, already clamped to hi_d.
      a_idx: (B, N, M, k) f32 angle indices in [0, hi_a].
      Md: (Pd, d), Ma: (Pa, d) — Chebyshev coefficient matrices with
        the projection kernels folded in (geo_embedding._cheb_proj).
      bias: (1, d) combined proj_d + proj_a bias.

    Returns:
      (B, N, M, d) out_dtype.

    Differentiable in Md/Ma/bias only (the index fields are geometry,
    stop_gradient'd by the caller).
    """
    B, N, M = d_idx.shape
    d_flat, a_flat = _flatten_pair_axes(d_idx, a_idx)
    out = _geo_embed_fwd_call(
        d_flat, a_flat, Md, Ma, bias, hi_d=hi_d, hi_a=hi_a,
        out_dtype=out_dtype, interpret=interpret,
    )
    return out.reshape(B, N, M, -1)


def _vjp_fwd(d_idx, a_idx, Md, Ma, bias, hi_d, hi_a, out_dtype,
             interpret):
    out = geo_embed_maxk(d_idx, a_idx, Md, Ma, bias, hi_d, hi_a,
                         out_dtype, interpret)
    return out, (d_idx, a_idx, Md, Ma)


def _vjp_bwd(hi_d, hi_a, out_dtype, interpret, res, g):
    d_idx, a_idx, Md, Ma = res
    B, N, M = d_idx.shape
    d_flat, a_flat = _flatten_pair_axes(d_idx, a_idx)
    dmd, dma, dbias = _geo_embed_bwd_call(
        d_flat, a_flat, Md, Ma, g.reshape(B, N * M, -1),
        hi_d=hi_d, hi_a=hi_a, interpret=interpret,
    )
    return (
        jnp.zeros_like(d_idx),
        jnp.zeros_like(a_idx),
        dmd.astype(Md.dtype),
        dma.astype(Ma.dtype),
        dbias.astype(jnp.float32),
    )


geo_embed_maxk.defvjp(_vjp_fwd, _vjp_bwd)
