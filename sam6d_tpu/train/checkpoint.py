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


def restore_train_state(ckpt_dir: str, state, step: int | None = None):
    """Restore into the structure of `state` (latest step by default)."""
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
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def save_params(path: str, variables: dict[str, Any]):
    """Params-only export for inference (PEMRunner / ISM)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables)
    ckptr.wait_until_finished()


def restore_params(path: str, template: dict[str, Any]):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
