"""Training-scale hygiene check: one sharded train step at FULL
reference scale (ViT-base 768/12, 196/2048 points, bs = dp) on the
8-virtual-device CPU mesh with bf16 compute + block remat.

Proves the 600k-iteration training configuration (reference
config/base.yaml: bs 28, ViT-base) compiles and executes under the
dp x tp sharding without OOM tricks.  Run:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/train_scale_check.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main():
    import dataclasses

    from sam6d_tpu.config import OptimConfig, default_pem_config
    from sam6d_tpu.parallel import (
        batch_sharding,
        make_mesh,
        shard_train_state,
    )
    from sam6d_tpu.train.state import create_train_state, train_step

    cfg = default_pem_config()
    cfg = dataclasses.replace(
        cfg,
        feature_extraction=dataclasses.replace(
            cfg.feature_extraction, remat=True
        ),
    )

    n_dev = len(jax.devices())
    tp = 2 if n_dev % 2 == 0 else 1
    dp = n_dev // tp
    mesh = make_mesh((dp, tp))
    B = dp  # one instance per dp shard
    N, M, S = cfg.fine_npoint, cfg.n_sample_model_point, \
        cfg.feature_extraction.img_size

    rng = np.random.RandomState(0)
    batch = {
        "pts": jnp.array(rng.randn(B, N, 3).astype(np.float32) * 0.02),
        "rgb": jnp.array(rng.rand(B, S, S, 3).astype(np.float32)),
        "rgb_choose": jnp.array(
            rng.randint(0, S * S, (B, N)).astype(np.int32)
        ),
        "model_pts": jnp.array(rng.randn(B, M, 3).astype(np.float32) * 0.02),
        "dense_po": jnp.array(rng.randn(B, N, 3).astype(np.float32) * 0.02),
        "dense_fo": jnp.array(
            rng.randn(B, N, cfg.feature_extraction.out_dim).astype(
                np.float32
            )
        ),
        "gt_r": jnp.array(np.stack([np.eye(3, dtype=np.float32)] * B)),
        "gt_t": jnp.array(
            np.tile(np.array([0, 0, 0.5], np.float32), (B, 1))
        ),
    }

    t0 = time.time()
    model_batch = {
        k: v for k, v in batch.items() if k not in ("gt_r", "gt_t")
    }
    state = create_train_state(
        jax.random.PRNGKey(0), cfg, OptimConfig(), model_batch,
        compute_dtype=jnp.bfloat16,
    )
    print(f"init: {time.time()-t0:.1f} s", flush=True)
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    print(f"params: {n_params/1e6:.1f} M", flush=True)

    state = shard_train_state(state, mesh)
    batch = jax.device_put(batch, batch_sharding(mesh))

    step = jax.jit(train_step)
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(state.params)
    print(f"step 1 (compile+run): {time.time()-t0:.1f} s, "
          f"loss {float(metrics['loss']):.3f}", flush=True)
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(state.params)
    print(f"step 2: {time.time()-t0:.1f} s, "
          f"loss {float(metrics['loss']):.3f} "
          f"(dp={dp} tp={tp}, bf16+remat, ViT-base {N}/{M} pts) OK",
          flush=True)


if __name__ == "__main__":
    main()
