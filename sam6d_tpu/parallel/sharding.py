"""Sharding rules: tensor-parallel parameter layout + data-parallel batch.

Megatron-style TP over the `tp` mesh axis applied to the PEM's matmul-heavy
params (ViT qkv/proj, MLP fc1/fc2, transformer expand/squeeze, per-head
projections): column-parallel into the hidden dim, row-parallel out of it,
so each pair needs a single psum that XLA inserts automatically under
pjit.  Everything else (LayerNorm, biases, bg tokens, pos embeds) is
replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense-kernel name -> partition spec for its (in, out) kernel.
_COL_PARALLEL = {"qkv", "fc1", "expand", "proj_q", "proj_k", "proj_v", "proj_p"}
_ROW_PARALLEL = {"fc2", "squeeze", "proj", "linear"}


def param_partition_spec(path: tuple[str, ...], leaf: Any) -> P:
    """PartitionSpec for one parameter, keyed on its flax module path."""
    names = [p for p in path]
    leaf_name = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if leaf_name == "kernel" and getattr(leaf, "ndim", 0) == 2:
        if parent in _COL_PARALLEL:
            return P(None, "tp")
        if parent in _ROW_PARALLEL:
            return P("tp", None)
    return P()


def _tree_path_specs(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, leaf in flat:
        key = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        specs[key] = param_partition_spec(key, leaf)
    return specs


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree matching `params`' structure."""

    def one(path, leaf):
        key = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        return NamedSharding(mesh, param_partition_spec(key, leaf))

    return jax.tree_util.tree_map_with_path(one, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp"):
    """Shard the leading (batch) dim of every batch leaf over `axis`."""
    return NamedSharding(mesh, P(axis))


def shard_train_state(state, mesh: Mesh):
    """device_put a TrainState with TP params + replicated rest."""
    p_shard = param_shardings(state.params, mesh)
    rep = replicated(mesh)

    new_params = jax.device_put(state.params, p_shard)
    # Optimizer state mirrors param structure where it does.
    def opt_shard(x):
        return jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, rep), x
        )

    try:
        new_opt = jax.device_put(state.opt_state, _opt_state_shardings(
            state.opt_state, state.params, p_shard, mesh))
    except Exception:
        new_opt = opt_shard(state.opt_state)
    return state.replace(
        params=new_params,
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=new_opt,
        step=jax.device_put(state.step, rep),
    )


def _opt_state_shardings(opt_state, params, p_shard, mesh):
    """Map param shardings onto optimizer-state leaves of matching shape."""
    rep = replicated(mesh)
    flat_params, _ = jax.tree_util.tree_flatten(params)
    flat_shards, _ = jax.tree_util.tree_flatten(p_shard)
    by_shape = {}
    for leaf, sh in zip(flat_params, flat_shards):
        by_shape.setdefault((leaf.shape, leaf.dtype), sh)

    def one(leaf):
        if hasattr(leaf, "shape"):
            return by_shape.get((leaf.shape, leaf.dtype), rep)
        return rep

    return jax.tree_util.tree_map(one, opt_state)
