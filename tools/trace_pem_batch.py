"""Op-level trace of the PEM serving forward at B=1 vs B=8 (VERDICT r4
#6: 327 inst/s @ B=8 is LESS device-efficient than 405 frames/s
sequential B=1 — find which ops scale worse than linearly with the
instance batch).

Reuses tools/trace_breakdown.py's perfetto parsing ("XLA Ops" thread
only — the method that works through the axon tunnel).

Usage: python -u tools/trace_pem_batch.py [--batches 1,8] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import tempfile

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from __graft_entry__ import _pem_example_batch, entry
    from sam6d_tpu.config import default_pem_config
    from tools.trace_breakdown import breakdown, find_trace

    fn, example_args = entry()
    variables, _, _, _, _, bank, key = example_args
    cfg = default_pem_config()
    rng = np.random.RandomState(1)
    jfn = jax.jit(fn)

    for B in [int(b) for b in args.batches.split(",")]:
        batch = _pem_example_batch(
            rng, B=B, N=cfg.fine_npoint, M=cfg.n_sample_model_point,
            H=cfg.feature_extraction.img_size,
            C=cfg.feature_extraction.out_dim,
        )
        a = (variables, batch["pts"], batch["rgb"], batch["rgb_choose"],
             batch["model_pts"], bank, key)
        out = jfn(*a)
        jax.block_until_ready(out)
        tmpdir = tempfile.mkdtemp(prefix=f"jaxtrace_pemB{B}_")
        jax.profiler.start_trace(tmpdir, create_perfetto_trace=True)
        for _ in range(args.iters):
            out = jfn(*a)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        trace = find_trace(tmpdir)
        print(f"\n===== B={B} (per-call = per-{args.iters}-iters / "
              f"{args.iters}) =====", flush=True)
        breakdown(trace, args.top, args.iters)


if __name__ == "__main__":
    main()
