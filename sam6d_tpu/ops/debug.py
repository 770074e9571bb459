"""Insertable debug-identity tap.

TPU-native analog of the reference's CustomDebugNode
(pointnet2_utils.py:528-549, custom_debug_node.cpp): an identity op that
can be inserted anywhere in a jitted graph to dump intermediate tensors
for side-by-side diffing, without changing semantics or breaking jit.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_DEBUG_ENV = "SAM6D_TPU_DEBUG_TAP"


def debug_tap(x: jax.Array, name: str = "tap", out_dir: str = "output") -> jax.Array:
    """Identity; when $SAM6D_TPU_DEBUG_TAP is set, append the tensor to
    `{out_dir}/jax_debug_node_{name}.npy` from inside jit via io_callback.
    """
    if not os.environ.get(_DEBUG_ENV):
        return x

    def _dump(val):
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"jax_debug_node_{name}.npy")
        np.save(path, np.asarray(val))

    jax.debug.callback(_dump, x)
    return x
