"""Train state, optimizer schedule, and the jitted train step.

Replaces reference train.py:27-138 + utils/solver.py (gorilla Solver):
Adam(lr 1e-4, betas (0.5, 0.999)) with WarmupCosineLR (warmup 1000 iters,
cosine to 600k — config/base.yaml:3-14), loss/metrics from train/loss.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from sam6d_tpu.config import OptimConfig, PEMConfig
from sam6d_tpu.models.pem.model import PEM
from sam6d_tpu.train.loss import pem_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)
    # Per-stage correspondence-label thresholds (reference
    # config/base.yaml loss_dis_thres); static so they fold into the
    # jitted step.
    coarse_dis_thres: float = struct.field(pytree_node=False, default=0.15)
    fine_dis_thres: float = struct.field(pytree_node=False, default=0.15)
    # Mirror of OptimConfig's spike threshold so train_step can report
    # update_skipped without reaching into the optimizer chain (advisor
    # r4: skipped batches must be observable, not silent).
    spike_skip_norm: float = struct.field(
        pytree_node=False, default=float("inf")
    )


def warmup_cosine_schedule(cfg: OptimConfig) -> optax.Schedule:
    """Linear warmup from warmup_factor*lr over warmup_iters, then cosine
    decay to 0 at max_iters (reference gorilla WarmupCosineLR)."""
    warmup = optax.linear_schedule(
        init_value=cfg.lr * cfg.warmup_factor,
        end_value=cfg.lr,
        transition_steps=cfg.warmup_iters,
    )
    cosine = optax.cosine_decay_schedule(
        init_value=cfg.lr,
        decay_steps=max(cfg.max_iters - cfg.warmup_iters, 1),
    )
    return optax.join_schedules([warmup, cosine], [cfg.warmup_iters])


def skip_spike_updates(
    inner: optax.GradientTransformation, max_norm: float
) -> optax.GradientTransformation:
    """Zero the update (params AND optimizer state) on gradient-spike
    batches.

    Round-4 flagship forensics: the training collapse is triggered by
    rare batches whose gradient norm jumps 3-6 orders of magnitude
    (healthy ~10 -> 6.7e3 -> 1.8e13 -> overflow within 50 steps,
    .ckpt_flagship_r4/metrics.jsonl) while the params stay small —
    global-norm clipping preserves the spike DIRECTION and ~50
    clip-normalized steps in it land the net in a flat all-background
    basin it never escapes.  A spike batch carries no usable signal;
    dropping it entirely (like skip-nonfinite, but for finite cliffs)
    is the standard large-run guard.  max_norm should sit far above the
    healthy range (10x+)."""

    def init(params):
        return inner.init(params)

    def update(grads, state, params=None):
        gnorm = optax.global_norm(grads)
        updates, new_state = inner.update(grads, state, params)
        ok = jnp.isfinite(gnorm) & (gnorm < max_norm)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates
        )
        new_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_state, state
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    adam = optax.adamw(
        learning_rate=warmup_cosine_schedule(cfg),
        b1=cfg.betas[0],
        b2=cfg.betas[1],
        eps=cfg.eps,
        weight_decay=cfg.weight_decay,
    )
    parts = []
    if getattr(cfg, "grad_clip", 0.0):
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    parts.append(adam)
    tx = optax.chain(*parts) if len(parts) > 1 else adam
    if getattr(cfg, "spike_skip_norm", 0.0):
        # skip_spike_updates already checks isfinite(grad_norm) (any
        # inf/NaN leaf makes the global norm non-finite), zeroes the
        # update AND rolls back the optimizer state — it strictly
        # subsumes optax.apply_if_finite, whose separate all-leaves
        # isfinite pass + state-select conditional cost ~18 ms/step in
        # the round-4 bs-16 trace.  Only one guard is installed.
        tx = skip_spike_updates(tx, cfg.spike_skip_norm)
    elif getattr(cfg, "skip_nonfinite", False):
        # A single overflowed bf16 batch must not poison the params:
        # non-finite grads skip the update entirely (params AND
        # optimizer state roll back; a permanently-diverged run
        # therefore freezes rather than NaN-ing — watch the
        # update_skipped metric / solver's consecutive-skip warning).
        tx = skip_spike_updates(tx, float("inf"))
    if getattr(cfg, "accum_steps", 1) > 1:
        # Microbatch accumulation OUTSIDE the guards: each train_step
        # call contributes one microbatch's gradients; the inner chain
        # (clip + spike-skip + adam) fires on the averaged gradient at
        # every accum_steps-th call.  Effective batch = accum_steps x
        # per-step batch (reference trains at effective 28-32,
        # config/base.yaml:3).
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def create_train_state(
    rng: jax.Array,
    pem_cfg: PEMConfig,
    optim_cfg: OptimConfig,
    example_batch: dict,
    compute_dtype: Any = jnp.float32,
) -> TrainState:
    """compute_dtype=jnp.bfloat16 runs the network matmuls in bf16 with
    f32 params/optimizer (mixed precision; geometry/pose solvers stay
    f32 inside the model) — with ViTConfig.remat this is what makes
    600k-iteration ViT-base training fit per-chip memory."""
    model = PEM(pem_cfg, dtype=compute_dtype)
    variables = model.init(rng, **example_batch, key=rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(optim_cfg)
    skip_norm = float("inf")
    if getattr(optim_cfg, "spike_skip_norm", 0.0):
        skip_norm = float(optim_cfg.spike_skip_norm)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
        coarse_dis_thres=pem_cfg.coarse_point_matching.loss_dis_thres,
        fine_dis_thres=pem_cfg.fine_point_matching.loss_dis_thres,
        spike_skip_norm=skip_norm,
    )


def train_step(state: TrainState, batch: dict, key: jax.Array):
    """One SGD step.

    Two batch layouts are supported (both contain gt_r/gt_t):
      * precomputed templates: pts/rgb/rgb_choose/model_pts/dense_po/dense_fo
      * raw templates (the real training path, reference
        provider/training_dataset.py): pts/rgb/rgb_choose +
        tem_rgb/tem_pts/tem_choose — template features are extracted
        in-graph via PEM.train_forward.
    """
    gt_r, gt_t = batch["gt_r"], batch["gt_t"]
    with_templates = "tem_rgb" in batch
    # uint8 image planes (RenderedPoseDataset uint8_rgb=True): the
    # ImageNet normalization moves ON-DEVICE so batches cross the
    # host->TPU link at 1/4 the bytes (the tunnel upload capped the
    # 20k flagship run at 0.95 of 3.69 device steps/s).
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    batch = {
        k: ((v.astype(jnp.float32) / 255.0 - mean) / std
            if k in ("rgb", "tem_rgb") and v.dtype == jnp.uint8 else v)
        for k, v in batch.items()
    }

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        if with_templates:
            out, updates = state.apply_fn(
                variables,
                batch["pts"], batch["rgb"], batch["rgb_choose"],
                batch["tem_rgb"], batch["tem_pts"], batch["tem_choose"],
                key, gt_r, gt_t,
                method="train_forward",
                mutable=["batch_stats"],
            )
        else:
            model_inputs = {
                k: v for k, v in batch.items() if k not in ("gt_r", "gt_t")
            }
            out, updates = state.apply_fn(
                variables,
                **model_inputs,
                key=key,
                train=True,
                gt_r=gt_r,
                gt_t=gt_t,
                mutable=["batch_stats"],
            )
        loss, metrics = pem_loss(
            out, gt_r, gt_t,
            coarse_dis_thres=state.coarse_dis_thres,
            fine_dis_thres=state.fine_dis_thres,
        )
        return loss, (metrics, updates["batch_stats"])

    (loss, (metrics, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt_state = state.tx.update(
        grads, state.opt_state, state.params
    )
    new_params = optax.apply_updates(state.params, updates)
    # A non-finite batch must not leak through ANY state channel: the
    # optimizer side is guarded by skip_spike_updates (make_optimizer),
    # but BatchNorm running stats would absorb the same overflowed
    # forward permanently (a single inf in a running mean never washes
    # out).  Keep the old batch_stats when the grads are non-finite.
    # Finiteness is read off the global norm (any inf/NaN leaf makes it
    # non-finite) instead of a per-leaf isfinite sweep — one pass over
    # the gradients instead of two, and XLA CSEs this norm with the one
    # inside skip_spike_updates.
    grad_norm = optax.global_norm(grads)
    grads_finite = jnp.isfinite(grad_norm)
    new_bs = jax.tree_util.tree_map(
        lambda n, o: jnp.where(grads_finite, n, o),
        new_bs, state.batch_stats,
    )
    metrics = dict(
        metrics,
        grads_finite=grads_finite.astype(jnp.float32),
        # Pre-clip gradient norm: the divergence diagnostic (a healthy
        # run clips rarely; a run living above grad_clip is doing
        # normalized-direction descent and spikes pass straight through).
        grad_norm=grad_norm,
        # 1.0 when skip_spike_updates dropped this batch (same predicate
        # as the guard: non-finite OR above the spike threshold).  The
        # solver counts consecutive skips off this so a permanently
        # diverged run surfaces instead of silently freezing.
        update_skipped=(
            ~(grads_finite & (grad_norm < state.spike_skip_norm))
        ).astype(jnp.float32),
    )
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_bs,
        opt_state=new_opt_state,
    )
    return new_state, metrics
