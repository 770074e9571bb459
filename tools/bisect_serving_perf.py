"""Attribute the round-2 PEM-serving fps delta (411 -> 376 fps) to the
round-2 correctness fixes, by measuring the forward with each fix
toggled back to its round-1 form (VERDICT r2 next-round #2).

Variants:
  current    — as shipped (f32 Chebyshev recurrence, f16 CDF compare).
  cheb_bf16  — Chebyshev recurrence in compute dtype (round-1 form;
               percent-level embedding error, rejected by the advisor).
  cdf_bf16   — CDF compare-and-count in bf16 (round-1 form; can swallow
               small sampling bins).
  both       — both reverts at once.

Each variant is a separate jitted program; runs on the real TPU.

Usage: python -u tools/bisect_serving_perf.py [--variants a,b,...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(label: str):
    import jax

    from __graft_entry__ import entry
    from sam6d_tpu.utils.timer import device_time_per_iter

    fn, example_args = entry()
    dt = device_time_per_iter(fn, 1, example_args, iters=20)
    print(f"{label:12s}: {dt*1e3:6.3f} ms/frame  ({1.0/dt:6.1f} fps)",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="current,cheb_bf16,cdf_bf16,both")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    import sam6d_tpu.models.pem.geo_embedding as ge
    import sam6d_tpu.ops.sampling as sampling

    for variant in args.variants.split(","):
        ge._CHEB_RECURRENCE_F32 = variant not in ("cheb_bf16", "both")
        sampling._CDF_COMPARE_DTYPE = (
            jnp.bfloat16 if variant in ("cdf_bf16", "both") else jnp.float16
        )
        measure(variant)
    # restore
    ge._CHEB_RECURRENCE_F32 = True
    sampling._CDF_COMPARE_DTYPE = jnp.float16


if __name__ == "__main__":
    main()
