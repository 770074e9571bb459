"""Furthest point sampling as a Pallas TPU kernel.

Replaces the reference's per-batch sequential kernels
(_ext_src/src/sampling_gpu.cu:75-229 block-parallel min-dist reduction,
ov_pointnet2_op/furthest_point_sampling.cl:52-93 sequential scan).

Design: the WHOLE batch in one program (the selection loop is the
sequential bottleneck; a per-batch grid would serialize B*npoint steps
on the single TensorCore).  The point cloud is laid out (B, 3, N) so N
rides the 128-lane dimension, and the running (B, N) min-distance
field lives in a VMEM scratch for the whole selection loop — each of the
`npoint` steps is a single fused VPU pass: broadcast-subtract the last
selected point per row, square-accumulate, min with the distance field,
per-row argmax.
This avoids the HBM round-trip per step that a naive XLA while-loop incurs
for large N (e.g. the 42x5000-template cloud, N=210k).

TPU constraints shape the kernel: dynamic single-lane loads/stores are not
lowerable, so the selected point is extracted by a masked cross-lane
reduction and the output indices accumulate in a VMEM scratch row via
masked select, stored once at the end.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(pts_ref, out_ref, dist_ref, idx_ref, *, n_valid: int, npoint: int):
    """Whole batch in ONE program; pts_ref (B, 3, Np), out_ref (B, npoint_pad).

    The selection loop is the sequential part — running it per batch
    item (grid=(B,)) serializes B*npoint steps on the one TensorCore
    (25.6 ms for the 16 x 10k->2048 train-template FPS, round-4 trace).
    All rows advance together here: each of the `npoint` steps is one
    (B, Np) VPU pass (broadcast-subtract, min, per-row argmax), so the
    step count is npoint regardless of B (25.6 -> ~3 ms at bs 16)."""
    B = pts_ref.shape[0]
    Np = pts_ref.shape[2]
    npoint_pad = out_ref.shape[1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Np), 1)
    valid = lane < n_valid
    dist_ref[:, :] = jnp.where(valid, jnp.float32(3.4e38), jnp.float32(-1.0))

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (B, npoint_pad), 1)
    idx_ref[:, :] = jnp.zeros((B, npoint_pad), jnp.int32)

    px = pts_ref[:, 0, :]  # (B, Np)
    py = pts_ref[:, 1, :]
    pz = pts_ref[:, 2, :]

    def step(i, last_idx):  # last_idx (B, 1)
        onehot = (lane == last_idx).astype(jnp.float32)  # (B, Np)
        # Selected point per row via masked cross-lane reduction
        # (dynamic single-lane loads are not lowerable).
        sx = jnp.sum(px * onehot, axis=1, keepdims=True)  # (B, 1)
        sy = jnp.sum(py * onehot, axis=1, keepdims=True)
        sz = jnp.sum(pz * onehot, axis=1, keepdims=True)
        d2 = (px - sx) ** 2 + (py - sy) ** 2 + (pz - sz) ** 2
        new_dist = jnp.where(valid, jnp.minimum(dist_ref[:, :], d2), -1.0)
        dist_ref[:, :] = new_dist
        nxt = jnp.argmax(new_dist, axis=1).astype(jnp.int32)[:, None]
        idx_ref[:, :] = jnp.where(out_lane == i, nxt, idx_ref[:, :])
        return nxt

    jax.lax.fori_loop(1, npoint, step, jnp.zeros((B, 1), jnp.int32))
    out_ref[:, :] = idx_ref[:, :]


def _fps_kernel_rowgrid(pts_ref, out_ref, dist_ref, idx_ref, *, n_valid: int,
                        npoint: int):
    """One grid program per batch row — for B=1 / very large N.

    The batched kernel keeps ~B*Np*4-byte temporaries live per step;
    at the 210k-point onboarding cloud that overflows the 16 MB scoped
    VMEM budget, while per-row state fits.  Sequential cost is the same
    at B=1."""
    b = pl.program_id(0)
    Np = pts_ref.shape[2]
    npoint_pad = out_ref.shape[1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    valid = lane < n_valid
    dist_ref[:, :] = jnp.where(valid, jnp.float32(3.4e38), jnp.float32(-1.0))

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, npoint_pad), 1)
    idx_ref[:, :] = jnp.zeros((1, npoint_pad), jnp.int32)

    def step(i, last_idx):
        pts = pts_ref[b, :, :]  # (3, Np)
        onehot = (lane == last_idx).astype(jnp.float32)  # (1, Np)
        sel = jnp.sum(pts * onehot, axis=1, keepdims=True)  # (3, 1)
        delta = pts - sel
        d2 = jnp.sum(delta * delta, axis=0, keepdims=True)  # (1, Np)
        new_dist = jnp.where(valid, jnp.minimum(dist_ref[:, :], d2), -1.0)
        dist_ref[:, :] = new_dist
        nxt = jnp.argmax(new_dist, axis=1).astype(jnp.int32)[0]
        idx_ref[:, :] = jnp.where(out_lane == i, nxt, idx_ref[:, :])
        return nxt

    jax.lax.fori_loop(1, npoint, step, jnp.int32(0))
    out_ref[pl.ds(b, 1), :] = idx_ref[:, :]


@partial(jax.jit, static_argnames=("npoint",))
def fps_pallas(pts: jax.Array, npoint: int) -> jax.Array:
    """Furthest point sampling.

    Args:
      pts: (B, N, 3) float point cloud.
      npoint: number of samples (static).

    Returns:
      (B, npoint) int32 indices, first index always 0 (reference semantics).
    """
    B, N, _ = pts.shape
    Np = _round_up(N, 128)
    npoint_pad = _round_up(npoint, 128)
    ptsT = jnp.swapaxes(pts.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if Np != N:
        ptsT = jnp.pad(ptsT, ((0, 0), (0, 0), (0, Np - N)))

    # Batched kernel for real batches; per-row grid for B == 1 (or
    # clouds big enough that B rows of temporaries blow scoped VMEM).
    # Resident bytes: (B, 3, Np) f32 input (12 B/entry) + (B, Np) f32
    # dist scratch (4 B/entry) = 16*B*Np, which must fit the ~16 MB
    # VMEM with headroom for the (B, npoint_pad) index buffers.
    if B > 1 and 16 * B * Np <= 14 * 1024 * 1024:
        out = pl.pallas_call(
            functools.partial(_fps_kernel, n_valid=N, npoint=npoint),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, npoint_pad), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((B, Np), jnp.float32),
                pltpu.VMEM((B, npoint_pad), jnp.int32),
            ],
        )(ptsT)
    else:
        out = pl.pallas_call(
            functools.partial(
                _fps_kernel_rowgrid, n_valid=N, npoint=npoint
            ),
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, npoint_pad), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((1, Np), jnp.float32),
                pltpu.VMEM((1, npoint_pad), jnp.int32),
            ],
        )(ptsT)
    return out[:, :npoint]
