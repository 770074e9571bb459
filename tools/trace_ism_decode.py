"""Op-level TPU breakdown of the ISM AMG decode+filter program.

Usage: python -u tools/trace_ism_decode.py [--top 30] [--iters 8]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_breakdown import breakdown, find_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.config import default_ism_config
    from sam6d_tpu.models.ism.sam.amg import (
        _decode_and_filter_all,
        build_point_grid,
    )
    from sam6d_tpu.models.ism.sam.model import SAM

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = default_ism_config()
    rng = np.random.RandomState(0)

    sam = SAM("vit_h", dtype=dtype)
    sam.init(jax.random.PRNGKey(0))
    emb = jnp.asarray(rng.randn(1, 64, 64, 256).astype(np.float32))
    seg = cfg.segmentor
    grid = build_point_grid(seg.points_per_side) * 1024.0
    pts = jnp.asarray(grid)[None]
    decode = jax.jit(
        functools.partial(
            _decode_and_filter_all,
            sam=sam,
            points_per_batch=seg.points_per_batch,
            mask_threshold=seg.mask_threshold,
            stability_offset=seg.stability_score_offset,
            top_k=256,
        )
    )
    out = decode(embedding=emb, points=pts)
    jax.block_until_ready(out)

    tmpdir = tempfile.mkdtemp(prefix="jaxtrace_decode_")
    jax.profiler.start_trace(tmpdir, create_perfetto_trace=True)
    for _ in range(args.iters):
        out = decode(embedding=emb, points=pts)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    trace = find_trace(tmpdir)
    print(f"trace: {trace}")
    breakdown(trace, args.top, args.iters)


if __name__ == "__main__":
    main()
