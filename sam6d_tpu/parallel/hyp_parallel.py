"""Hypothesis-parallel coarse pose solving over a device mesh.

The reference's scaling ceiling is the 6000-hypothesis scoring loop it
pins to host CPU (model_utils.py:204-275, run_inference_custom_openvino_
gpu.py:489-521).  Here the hypothesis axis shards over a mesh axis with
shard_map: every device samples and solves its own hypothesis block from
the attention (decorrelated PRNG via fold_in on the axis index), rescores
locally, and the global best pose is selected with one all_gather of
(score, R, t) per instance — the score reduction rides ICI.

Composes with data parallelism: on a ("dp", "hyp") mesh the instance
batch shards over dp while each dp shard's hypotheses spread over hyp
(pass batch_axis="dp").  The serving path threads this through
PEM.forward_with_bank(coarse_solver=...) — see pipeline.pem_runner.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sam6d_tpu.models.pem.matching import compute_coarse_Rt


def sharded_compute_coarse_Rt(
    mesh: Mesh,
    axis: str,
    key: jax.Array,
    atten: jax.Array,
    pts1: jax.Array,
    pts2: jax.Array,
    model_pts: jax.Array,
    n_proposal1: int = 6000,
    n_proposal2: int = 300,
    dist_field: jax.Array | None = None,
    batch_axis: str | None = None,
    n_refine: int = 32,
):
    """compute_coarse_Rt with the hypothesis axis sharded over `axis`.

    Each of the n_dev devices draws n_proposal1/n_dev hypotheses, keeps
    its local top n_proposal2/n_dev, rescores, and the argmax over
    devices picks the winner.  Statistically equivalent to the
    single-device solver (same total hypothesis budget, independent
    draws).

    Args:
      batch_axis: optional second mesh axis the (B, ...) inputs are
        already sharded over (data parallel); outputs keep that layout.
      dist_field: optional (1, G, G, G) shared min-distance field from
        the template bank (voxel pre-score + exact top-k refine path).

    Returns:
      (R, t): (B, 3, 3), (B, 3), sharded over batch_axis (or replicated).
    """
    n_dev = mesh.shape[axis]
    local_n1 = max(n_proposal1 // n_dev, 3)
    local_n2 = max(n_proposal2 // n_dev, 1)
    local_refine = max(n_refine // n_dev, 1)

    rep = P()
    bspec = P(batch_axis) if batch_axis else P()

    def solve(key, atten, pts1, pts2, model_pts, dist_field):
        dev = jax.lax.axis_index(axis)
        local_key = jax.random.fold_in(key, dev)
        R, t, score = compute_coarse_Rt(
            local_key, atten, pts1, pts2, model_pts,
            n_proposal1=local_n1, n_proposal2=local_n2,
            score_chunk=min(50, local_n2), return_score=True,
            dist_field=dist_field, n_refine=local_refine,
        )
        # Gather every device's best and pick the global winner.
        all_scores = jax.lax.all_gather(score, axis)  # (n_dev, B)
        all_R = jax.lax.all_gather(R, axis)  # (n_dev, B, 3, 3)
        all_t = jax.lax.all_gather(t, axis)
        best = jnp.argmax(all_scores, axis=0)  # (B,)
        bi = jnp.arange(score.shape[0])
        return all_R[best, bi], all_t[best, bi]

    if dist_field is None:
        inner = shard_map(
            lambda k, a, p1, p2, m: solve(k, a, p1, p2, m, None),
            mesh=mesh,
            in_specs=(rep, bspec, bspec, bspec, bspec),
            out_specs=(bspec, bspec),
            check_vma=False,
        )
        return inner(key, atten, pts1, pts2, model_pts)

    inner = shard_map(
        solve,
        mesh=mesh,
        # The dist field is the bank's SHARED (1, G, G, G) table —
        # replicated, indexed by every local instance.
        in_specs=(rep, bspec, bspec, bspec, bspec, rep),
        out_specs=(bspec, bspec),
        check_vma=False,
    )
    return inner(key, atten, pts1, pts2, model_pts, dist_field)
