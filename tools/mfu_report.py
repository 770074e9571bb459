"""Roofline/MFU report for the hot programs (BASELINE.json north-star:
"PEM kernel % of roofline").

For each jitted program we take XLA's own FLOP count
(compiled.cost_analysis()["flops"]) and the tunnel-robust device time
(utils.timer.device_time_per_iter), and report
MFU = flops / time / peak_flops.  Peak is the per-chip bf16 matmul
roofline of the attached TPU generation (v5e: 197 TFLOP/s bf16).

Usage: python -u tools/mfu_report.py [--stages pem,encoder,dinov2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = {
    # per-chip dense bf16 TFLOP/s
    "v5e": 197e12,
    "v5litepod": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6e": 918e12,
}


def peak_flops() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_BF16.items():
        if k in kind:
            return v
    return 197e12  # conservative default


def measure(name, fn, args, iters=8, perturb_arg=1):
    import jax

    from sam6d_tpu.utils.timer import device_time_per_iter

    jfn = jax.jit(fn)
    compiled = jfn.lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    t = device_time_per_iter(jfn, perturb_arg, args, iters=iters)
    mfu = flops / t / peak_flops() * 100.0
    return {
        "stage": name,
        "ms": round(t * 1e3, 3),
        "gflops": round(flops / 1e9, 1),
        "mfu_pct": round(mfu, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="pem,encoder,dinov2,decode")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    stages = args.stages.split(",")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
    rows = []
    rng = np.random.RandomState(0)

    if "pem" in stages:
        from __graft_entry__ import entry

        fn, eargs = entry()
        rows.append(measure("pem_forward_b1", fn, eargs, args.iters, perturb_arg=1))

    if "encoder" in stages or "decode" in stages:
        from sam6d_tpu.config import default_ism_config
        from sam6d_tpu.models.ism.sam.model import SAM

        cfg = default_ism_config()
        sam = SAM("vit_h", dtype=jnp.bfloat16)
        sam.init(jax.random.PRNGKey(0))
        if "encoder" in stages:
            img = jnp.asarray(rng.randn(1, 1024, 1024, 3).astype(np.float32))
            rows.append(
                measure(
                    "sam_encoder_1024",
                    sam._encode_impl,
                    (sam.variables, img),
                    args.iters,
                    perturb_arg=1,
                )
            )
        if "decode" in stages:
            import functools

            from sam6d_tpu.models.ism.sam.amg import (
                _decode_and_filter_all,
                build_point_grid,
            )

            emb = jnp.asarray(
                rng.randn(1, 64, 64, 256).astype(np.float32),
                dtype=jnp.bfloat16,
            )
            pts = jnp.asarray(
                build_point_grid(cfg.segmentor.points_per_side)
                * np.array([1024, 768], np.float32)
            )[None]
            dec = functools.partial(
                _decode_and_filter_all,
                sam=sam,
                points_per_batch=cfg.segmentor.points_per_batch,
                mask_threshold=0.0,
                stability_offset=1.0,
                top_k=256,
            )
            rows.append(
                measure(
                    "amg_decode_filter_1024pts",
                    lambda e, p: dec(embedding=e, points=p),
                    (emb, pts), args.iters, perturb_arg=0,
                )
            )

    if "dinov2" in stages:
        from sam6d_tpu.config import default_ism_config
        from sam6d_tpu.models.ism.dinov2 import DescriptorModel

        cfg = default_ism_config()
        desc = DescriptorModel(cfg.descriptor, dtype=jnp.bfloat16)
        dvars = desc.init(jax.random.PRNGKey(1))
        Q = 128
        imgs = jnp.asarray(rng.rand(Q, 224, 224, 3).astype(np.float32))
        masks = jnp.asarray(np.ones((Q, 224, 224), bool))
        rows.append(
            measure(
                "dinov2_descriptors_q128",
                desc.compute_cls_and_patch,
                (dvars, imgs, masks),
                args.iters,
                perturb_arg=1,
            )
        )

    kind = jax.devices()[0].device_kind
    print(json.dumps({
        "device": kind,
        "peak_bf16_tflops": peak_flops() / 1e12,
        "stages": rows,
    }))


if __name__ == "__main__":
    main()
