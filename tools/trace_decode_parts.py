"""Decompose the AMG decode time: transformer chunks vs fused-stats
kernel vs top-K gather vs logit recompute (round-3 follow-up to the
fused tail landing at ~unchanged 140 ms)."""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.config import default_ism_config
    from sam6d_tpu.models.ism.sam.amg import build_point_grid
    from sam6d_tpu.models.ism.sam.model import SAM
    from sam6d_tpu.ops.pallas.decode_tail import decode_tail_stats
    from sam6d_tpu.utils.timer import device_time_per_iter

    dtype = jnp.bfloat16
    sam = SAM("vit_h", dtype=dtype)
    sam.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(1, 64, 64, 256).astype(np.float32) * 0.1)
    grid = build_point_grid(32) * 1024.0
    pts = jnp.asarray(grid)[None]
    P, ppb = 1024, 64

    def transformer_only(emb_, pts_):
        p = pts_.reshape(P // ppb, ppb, 2)

        def one(pb):
            keys, hyper, iou = sam.decode_points_pre(emb_, pb[:, None, :])
            return keys.astype(jnp.bfloat16), hyper, iou[:, 1:]

        keys, hyper, iou = jax.lax.map(one, p)
        return keys.reshape(P, 4096, 256), hyper.reshape(P, 4, 32), iou

    tf = jax.jit(transformer_only)
    dt = device_time_per_iter(
        lambda e, q: tf(e, q)[2], 0, (emb, pts), iters=6
    )
    print(f"transformer chunks (P=1024): {dt*1e3:8.2f} ms", flush=True)

    keys, hyper, iou = tf(emb, pts)
    params = sam.decoder_tail_params()

    kern = jax.jit(functools.partial(
        decode_tail_stats, mask_threshold=0.0, stability_offset=1.0,
    ))

    # NB: keys is 2.1 GB — always an ARGUMENT, never a closure constant
    # (tunnel payload limit + constant capture).
    def kern_fn(h, k):
        return kern(k, h, **params)

    dt = device_time_per_iter(kern_fn, 0, (hyper[:, 1:], keys), iters=6)
    print(f"fused stats kernel:          {dt*1e3:8.2f} ms", flush=True)

    def gather_recompute(scores, k, h):
        _, keep = jax.lax.top_k(scores.reshape(-1), 256)
        pi = keep // 3
        tok = keep % 3
        kk = k[pi]
        hh = h[pi, 1 + tok][:, None]
        return sam.decode_tail(kk, hh, 64, 64)[:, 0]

    gr = jax.jit(gather_recompute)
    scores = jnp.asarray(rng.rand(P, 3).astype(np.float32))
    dt = device_time_per_iter(gr, 0, (scores, keys, hyper), iters=6)
    print(f"top-K gather + recompute:    {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
