"""PEM serving throughput vs instance batch size on the real TPU.

Multi-instance frames batch their proposal crops through one
forward_with_bank call (pipeline/pem_runner.py buckets counts to powers
of two); this records instances/s at each bucket.

Usage: python -u tools/bench_pem_batch.py [--batches 1,2,4,8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from __graft_entry__ import _pem_example_batch, entry
    from sam6d_tpu.config import default_pem_config
    from sam6d_tpu.utils.timer import device_time_per_iter

    fn, example_args = entry()
    variables, _, _, _, _, bank, key = example_args
    cfg = default_pem_config()
    rng = np.random.RandomState(1)

    for B in [int(b) for b in args.batches.split(",")]:
        batch = _pem_example_batch(
            rng, B=B, N=cfg.fine_npoint, M=cfg.n_sample_model_point,
            H=cfg.feature_extraction.img_size,
            C=cfg.feature_extraction.out_dim,
        )
        a = (variables, batch["pts"], batch["rgb"], batch["rgb_choose"],
             batch["model_pts"], bank, key)
        dt = device_time_per_iter(fn, 1, a, iters=args.iters)
        print(f"B={B}: {dt * 1e3:7.2f} ms/call -> {B / dt:8.1f} inst/s",
              flush=True)


if __name__ == "__main__":
    main()
