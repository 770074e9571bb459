"""A/B the SAM ViT-H encoder variants on the real TPU (VERDICT r3 #5a:
84.4 ms at 31.6% MFU, untouched since round 1).

Hypotheses measured:
  flash-all        round-1 shipped config (flash on all 32 blocks)
  flash-global     Pallas flash ONLY at the 4 global blocks; the 28
                   windowed blocks (25 windows x 196 tokens) use
                   materialized XLA attention — the DINOv2 N=257 lesson
                   says short sequences lose on the Pallas grid
  flash-none       materialized everywhere (sanity: global blocks were
                   27 ms/block materialized in round 1)

Usage: python -u tools/bench_sam_encoder.py [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--variants", default="flash-all,flash-global")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.models.ism.sam.encoder import ImageEncoderViT
    from sam6d_tpu.utils.timer import device_time_per_iter

    kind = jax.devices()[0].device_kind.lower()
    peak = 459e12 if "v5p" in kind else (918e12 if "v6" in kind else 197e12)

    flags = {
        "flash-all": dict(flash=True),
        "flash-global": dict(flash=True, flash_windowed=False),
        "flash-none": dict(flash=False),
    }
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 1024, 1024, 3).astype(np.float32))

    results = {}
    params = None
    for name in args.variants.split(","):
        enc = ImageEncoderViT(
            img_size=1024, embed_dim=1280, depth=32, num_heads=16,
            global_attn_indexes=(7, 15, 23, 31), dtype=jnp.bfloat16,
            **flags[name],
        )
        if params is None:
            params = enc.init(jax.random.PRNGKey(0), img)

        def fwd(v, x):
            return enc.apply(v, x)

        dt = device_time_per_iter(fwd, 1, (params, img), iters=args.iters)
        try:
            cost = jax.jit(fwd).lower(params, img).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
        except Exception:
            flops = 0.0
        mfu = flops / dt / peak * 100.0
        results[name] = {"ms": round(dt * 1e3, 2),
                         "mfu_pct": round(mfu, 1)}
        print(f"{name}: {dt*1e3:.2f} ms  MFU {mfu:.1f}%", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
