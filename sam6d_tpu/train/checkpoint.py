"""Checkpoint save/restore via orbax.

Replaces the reference's gorilla checkpointing (utils/solver.py:34-45
resume, :65-68 per-epoch save): full train state (params, batch stats,
optimizer state, step) with retention, plus a params-only export for
inference runners.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_train_state(ckpt_dir: str, state, step: int | None = None,
                     max_to_keep: int = 5):
    """Save params/batch_stats/opt_state/step under ckpt_dir/<step>."""
    mgr = _manager(ckpt_dir, max_to_keep)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    step = int(state.step) if step is None else step
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def restore_train_state(ckpt_dir: str, state, step: int | None = None,
                        params_only: bool = False):
    """Restore into the structure of `state` (latest step by default).

    params_only=True skips the optimizer state — evaluation of a
    checkpoint saved under a DIFFERENT optimizer recipe (the opt_state
    pytree structure changes with every optax chain revision) only needs
    params/batch_stats/step.

    Known structure break (round 4): dropping optax.apply_if_finite from
    make_optimizer removed the ApplyIfFiniteState wrapper, so full
    restores of checkpoints saved before that change fail — restore
    those with params_only=True (Adam moments from the old recipe are
    not transferable anyway)."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if params_only:
        # Raw restore through a shape/dtype template built from the
        # checkpoint's own metadata (host-dtype arrays, so checkpoints
        # written on the TPU restore fine on CPU), then take only the
        # non-optimizer leaves.
        import jax.tree_util as jtu
        import numpy as np

        mgr.close()
        path = os.path.join(os.path.abspath(ckpt_dir), str(step), "default")
        ckptr = ocp.StandardCheckpointer()
        meta = ckptr.metadata(path)
        tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
        raw_template = jtu.tree_map(
            lambda m: np.zeros(m.shape, m.dtype), tree,
            is_leaf=lambda x: hasattr(x, "shape") and hasattr(x, "dtype"),
        )
        restored = ckptr.restore(path, raw_template)
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            step=jax.numpy.asarray(restored["step"]),
        )
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def save_params(path: str, variables: dict[str, Any]):
    """Params-only export for inference (PEMRunner / ISM).

    Overwrites an existing checkpoint (orbax refuses by default — a
    3000-step tiny-SAM run once died at the final save over this)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables, force=True)
    ckptr.wait_until_finished()


def restore_params(path: str, template: dict[str, Any]):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def restore_params_tolerant(path: str, template: dict[str, Any],
                            verbose: bool = True,
                            max_miss_fraction: float = 0.5):
    """Non-strict restore: take every checkpoint leaf whose path AND
    shape match the template, keep the template value elsewhere.

    The analog of the reference's fallback checkpoint loader
    (run_inference_custom_pytorch.py:393-420: strip module./model.
    prefixes, filter by name+shape, load non-strict) — lets older or
    partial checkpoints (e.g. backbone-only) drive a newer model.

    Guard rail: if MORE than max_miss_fraction of the template's leaves
    fail to restore, this raises instead of silently returning a
    mostly-random model (e.g. a vit_large checkpoint loaded against a
    depth-12 config would otherwise "load successfully" in demo/
    pem_runner).  Pass max_miss_fraction=1.0 to allow any partial load.

    Returns:
      (merged tree, list of "kept template" leaf paths).
    """
    import jax.tree_util as jtu

    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(os.path.abspath(path), template)
        return restored, []
    except Exception:
        pass  # structure mismatch: fall through to the merge path

    restored = ckptr.restore(os.path.abspath(path))  # raw tree

    def flatten(tree, prefix=()):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix] = tree
        return out

    flat_ckpt = flatten(restored)
    misses = []

    def merge(tmpl, prefix=()):
        if isinstance(tmpl, dict):
            return {k: merge(v, prefix + (k,)) for k, v in tmpl.items()}
        leaf = flat_ckpt.get(prefix)
        if leaf is not None and getattr(leaf, "shape", None) == getattr(
            tmpl, "shape", None
        ):
            return jax.numpy.asarray(leaf, getattr(tmpl, "dtype", None))
        misses.append("/".join(map(str, prefix)))
        return tmpl

    merged = merge(template)
    n_total = len(flatten(template))
    if n_total and len(misses) / n_total > max_miss_fraction:
        raise ValueError(
            f"tolerant restore of {path} matched only "
            f"{n_total - len(misses)}/{n_total} template leaves "
            f"(> {max_miss_fraction:.0%} missed) — the checkpoint almost "
            f"certainly belongs to a different architecture (check "
            f"vit_type/depth/num_heads in the config). First misses: "
            f"{misses[:8]}. Pass max_miss_fraction=1.0 to force."
        )
    if verbose and misses:
        print(
            f"[checkpoint] kept template values for {len(misses)} leaves "
            f"missing/mismatched in {path}: {misses[:8]}"
            + ("..." if len(misses) > 8 else "")
        )
    return merged, misses
