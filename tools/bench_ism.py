"""ISM full-frame stage breakdown on the real TPU.

Measures the device time of each jitted stage of the ISM pass at
flagship shapes (SAM ViT-H 1024^2 encoder, 32x32 grid decode+filter,
DINOv2 ViT-L/14 descriptor batch, scoring) with the tunnel-robust
scan-chained timer, and prints a per-stage table plus the implied
frames/s. Random weights — identical FLOPs/layout to converted ones.

Usage: python -u tools/bench_ism.py [--proposals 128] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proposals", type=int, default=128,
                    help="padded proposal batch (power-of-two bucket)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--xla_decode", action="store_true",
                    help="measure the plain-XLA decode path instead of "
                         "the fused Pallas tail")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.config import default_ism_config
    from sam6d_tpu.models.ism.dinov2 import DescriptorModel
    from sam6d_tpu.models.ism.sam.amg import (
        SamAutomaticMaskGenerator,
        build_point_grid,
        _decode_and_filter_all,
        _decode_and_filter_fused,
        _upscale_masks,
    )
    from sam6d_tpu.models.ism.sam.model import SAM
    from sam6d_tpu.models.ism import scoring
    from sam6d_tpu.utils.bbox import crop_resize_pad
    from sam6d_tpu.utils.timer import device_time_per_iter

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = default_ism_config()
    rng = np.random.RandomState(0)
    stages = {}

    # --- SAM encoder -----------------------------------------------------
    sam = SAM("vit_h", dtype=dtype)
    sam.init(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.randn(1, 1024, 1024, 3).astype(np.float32))
    enc = jax.jit(sam._encode_impl)
    stages["sam_encoder_1024"] = device_time_per_iter(
        enc, 1, (sam.variables, img), iters=args.iters
    )
    emb = enc(sam.variables, img)

    # --- grid decode + on-device filter ---------------------------------
    seg_cfg = cfg.segmentor
    grid = build_point_grid(seg_cfg.points_per_side) * 1024.0
    pts = jnp.asarray(grid)[None]
    # Fused Pallas tail (the TPU default in SamAutomaticMaskGenerator);
    # --xla_decode measures the plain-XLA path instead for comparison.
    decode_impl = (
        _decode_and_filter_all if args.xla_decode
        else _decode_and_filter_fused
    )
    decode = jax.jit(
        functools.partial(
            decode_impl,
            sam=sam,
            points_per_batch=seg_cfg.points_per_batch,
            mask_threshold=seg_cfg.mask_threshold,
            stability_offset=seg_cfg.stability_score_offset,
            top_k=256,
        )
    )

    def decode_fn(emb_, pts_):
        return decode(embedding=emb_, points=pts_)[0]

    tag = "xla" if args.xla_decode else "fused"
    stages[f"amg_decode_{seg_cfg.points_per_side}x{seg_cfg.points_per_side}_{tag}"] = (
        device_time_per_iter(decode_fn, 0, (emb, pts), iters=args.iters)
    )

    # --- mask upscale of kept candidates --------------------------------
    logits = jnp.asarray(rng.randn(256, 256, 256).astype(np.float32))
    upscale = jax.jit(
        functools.partial(
            _upscale_masks, eff_h=1024, eff_w=768, out_h=480, out_w=640,
            mask_threshold=seg_cfg.mask_threshold,
        )
    )

    def upscale_fn(lg):
        return upscale(lg).astype(jnp.float32)

    stages["amg_upscale_256"] = device_time_per_iter(
        upscale_fn, 0, (logits,), iters=args.iters
    )

    # --- proposal crops --------------------------------------------------
    Q = args.proposals
    img_f = jnp.asarray(rng.rand(480, 640, 3).astype(np.float32))
    boxes = np.zeros((Q, 4), np.float32)
    boxes[:, 0] = rng.randint(0, 300, Q)
    boxes[:, 1] = rng.randint(0, 200, Q)
    boxes[:, 2] = boxes[:, 0] + rng.randint(40, 300, Q)
    boxes[:, 3] = boxes[:, 1] + rng.randint(40, 250, Q)
    boxes = jnp.asarray(boxes)
    S = cfg.descriptor.image_size
    crop = jax.jit(lambda im, bx: crop_resize_pad(im, bx, S))
    stages[f"proposal_crops_{Q}"] = device_time_per_iter(
        crop, 0, (img_f, boxes), iters=args.iters
    )
    crops = crop(img_f, boxes)

    # --- DINOv2 descriptors (fused cls+patch pass) ----------------------
    desc = DescriptorModel(cfg.descriptor, dtype=dtype)
    desc_vars = desc.init(jax.random.PRNGKey(1))
    masks = jnp.asarray(rng.rand(Q, S, S) > 0.4)
    both = jax.jit(desc.compute_cls_and_patch)

    def desc_fn(v, c, m):
        cls, patch = both(v, c, m)
        return cls.astype(jnp.float32)

    stages[f"dinov2_descriptors_{Q}"] = device_time_per_iter(
        desc_fn, 1, (desc_vars, crops, masks), iters=args.iters
    )
    cls, patch = both(desc_vars, crops, masks)

    # --- scoring ---------------------------------------------------------
    O, T, Np = 1, 42, patch.shape[1]
    ref_cls = jnp.asarray(rng.randn(O, T, cls.shape[-1]).astype(np.float32))
    ref_patch = jnp.asarray(
        rng.randn(Q, Np, patch.shape[-1]).astype(np.float32)
    )
    sem = jax.jit(
        functools.partial(scoring.semantic_score,
                          aggregation=cfg.aggregation_function)
    )

    def sem_fn(q, r):
        return sem(q, r)[0]

    stages["semantic_score"] = device_time_per_iter(
        sem_fn, 0, (cls.astype(jnp.float32), ref_cls), iters=args.iters
    )
    appe = jax.jit(scoring.appearance_score)
    stages["appearance_score"] = device_time_per_iter(
        appe, 0, (patch.astype(jnp.float32), ref_patch), iters=args.iters
    )

    total = sum(stages.values())
    print(f"\n=== ISM stage breakdown ({args.dtype}, Q={Q}) ===")
    for name, dt in stages.items():
        print(f"{dt * 1e3:9.2f} ms  {name}")
    print(f"{total * 1e3:9.2f} ms  TOTAL (device) -> {1.0 / total:.2f} fps")

    # Record for bench.py to surface to the driver.
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_ISM.json"), "w") as f:
        json.dump(
            {
                "dtype": args.dtype,
                "proposals": Q,
                "stages_ms": {k: round(v * 1e3, 2)
                              for k, v in stages.items()},
                "total_ms": round(total * 1e3, 2),
            },
            f,
        )


if __name__ == "__main__":
    main()
