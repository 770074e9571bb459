"""Op-level TPU breakdown of the FLAGSHIP train step (VERDICT r3 #4:
train MFU 13.2% at bs 8, never traced — the serving side got exactly
this treatment and tripled).

Reuses tools/trace_breakdown.py's perfetto parsing (the method that
works through the axon tunnel; tensorboard is unavailable).

Usage: python -u tools/trace_train_step.py [--batch 16] [--iters 6]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import dataclasses
    import tempfile

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.config import OptimConfig, TrainConfig, default_pem_config
    from sam6d_tpu.train.state import create_train_state, train_step
    from tools.trace_breakdown import breakdown, find_trace

    cfg = default_pem_config()
    cfg = dataclasses.replace(
        cfg,
        feature_extraction=dataclasses.replace(
            cfg.feature_extraction, remat=True
        ),
    )
    tc = TrainConfig()
    B = args.batch
    N, S = tc.n_sample_observed_point, cfg.feature_extraction.img_size
    Np, T = tc.n_sample_template_point, 2
    rng = np.random.RandomState(0)
    batch = {
        "pts": jnp.array(rng.randn(B, N, 3).astype(np.float32) * 0.02),
        "rgb": jnp.array(rng.rand(B, S, S, 3).astype(np.float32)),
        "rgb_choose": jnp.array(
            rng.randint(0, S * S, (B, N)).astype(np.int32)
        ),
        "tem_rgb": jnp.array(rng.rand(B, T, S, S, 3).astype(np.float32)),
        "tem_pts": jnp.array(
            rng.randn(B, T, Np, 3).astype(np.float32) * 0.02
        ),
        "tem_choose": jnp.array(
            rng.randint(0, S * S, (B, T, Np)).astype(np.int32)
        ),
        "gt_r": jnp.array(np.stack([np.eye(3, dtype=np.float32)] * B)),
        "gt_t": jnp.array(
            np.tile(np.array([0, 0, 0.5], np.float32), (B, 1))
        ),
    }
    init_batch = {
        "pts": batch["pts"],
        "rgb": batch["rgb"],
        "rgb_choose": batch["rgb_choose"],
        "model_pts": jnp.zeros((B, cfg.fine_npoint, 3), jnp.float32),
        "dense_po": jnp.zeros((B, cfg.fine_npoint, 3), jnp.float32),
        "dense_fo": jnp.zeros(
            (B, cfg.fine_npoint, cfg.feature_extraction.out_dim),
            jnp.float32,
        ),
    }
    state = create_train_state(
        jax.random.PRNGKey(0), cfg, OptimConfig(), init_batch,
        compute_dtype=jnp.bfloat16,
    )
    step = jax.jit(train_step)
    st, metrics = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(st.params)
    print(f"warm loss {float(metrics['loss']):.3f}", flush=True)

    tmpdir = tempfile.mkdtemp(prefix="jaxtrace_train_")
    jax.profiler.start_trace(tmpdir, create_perfetto_trace=True)
    for i in range(args.iters):
        st, metrics = step(st, batch, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(st.params)
    jax.profiler.stop_trace()
    trace = find_trace(tmpdir)
    print(f"trace: {trace}", flush=True)
    breakdown(trace, args.top, args.iters)


if __name__ == "__main__":
    main()
