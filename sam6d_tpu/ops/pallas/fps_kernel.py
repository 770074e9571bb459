"""Furthest point sampling as a Pallas TPU kernel.

Replaces the reference's per-batch sequential kernels
(_ext_src/src/sampling_gpu.cu:75-229 block-parallel min-dist reduction,
ov_pointnet2_op/furthest_point_sampling.cl:52-93 sequential scan).

Design: one grid program per batch element.  The point cloud is laid out
(3, N) so N rides the 128-lane dimension, and the running min-distance
field lives in a VMEM scratch for the whole selection loop — each of the
`npoint` steps is a single fused VPU pass: broadcast-subtract the last
selected point, square-accumulate, min with the distance field, argmax.
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
    """Grid over batch; pts_ref (B, 3, Np), out_ref (B, npoint_pad)."""
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

    out = pl.pallas_call(
        functools.partial(_fps_kernel, n_valid=N, npoint=npoint),
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
