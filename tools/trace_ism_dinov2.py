"""Op-level TPU breakdown of the DINOv2 descriptor pass (Q proposals).

Usage: python -u tools/trace_ism_dinov2.py [--proposals 128] [--iters 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_breakdown import breakdown, find_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--proposals", type=int, default=128)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.config import default_ism_config
    from sam6d_tpu.models.ism.dinov2 import DescriptorModel

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = default_ism_config()
    rng = np.random.RandomState(0)
    Q, S = args.proposals, cfg.descriptor.image_size

    desc = DescriptorModel(cfg.descriptor, dtype=dtype)
    desc_vars = desc.init(jax.random.PRNGKey(1))
    crops = jnp.asarray(rng.rand(Q, S, S, 3).astype(np.float32))
    masks = jnp.asarray(rng.rand(Q, S, S) > 0.4)
    both = jax.jit(desc.compute_cls_and_patch)
    out = both(desc_vars, crops, masks)
    jax.block_until_ready(out)

    tmpdir = tempfile.mkdtemp(prefix="jaxtrace_dino_")
    jax.profiler.start_trace(tmpdir, create_perfetto_trace=True)
    for _ in range(args.iters):
        out = both(desc_vars, crops, masks)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    trace = find_trace(tmpdir)
    print(f"trace: {trace}")
    breakdown(trace, args.top, args.iters)


if __name__ == "__main__":
    main()
