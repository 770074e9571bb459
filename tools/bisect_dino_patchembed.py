"""A/B the DINOv2 descriptor pass: explicit 6-D-transpose patch embed
(current) vs a single-einsum contraction (no materialized transpose),
plus a no-patch-validity variant to locate the convert_reduce cost.

The round-3 trace of compute_cls_and_patch (Q=128, 235 ms) shows
40 ms 'copy' + 26.6 ms 'convolution_add_fusion' + 45 ms
'convert_reduce_fusion' besides the 122 ms of matmul fusions —
this measures which formulation removes what.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.config import DescriptorConfig
    from sam6d_tpu.models.ism.dinov2 import DescriptorModel
    from sam6d_tpu.utils.timer import device_time_per_iter

    rng = np.random.RandomState(0)
    Q = 128
    cfg = DescriptorConfig()
    imgs = jnp.asarray(rng.randn(Q, 224, 224, 3).astype(np.float32))
    masks = jnp.asarray(rng.rand(Q, 224, 224) > 0.5)

    # RESULT (2026-08-21, v5e): transpose 234.45 ms vs einsum 234.42 ms
    # at Q=128 — identical; XLA lowers both formulations the same way.
    # The switch was removed from models/vit.py; this tool remains the
    # record of the measurement and measures the current implementation.
    model = DescriptorModel(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0))
    fn = jax.jit(model.compute_cls_and_patch)
    dt = device_time_per_iter(
        lambda v, im, mk: fn(v, im, mk)[0].astype(jnp.float32),
        1, (variables, imgs, masks), iters=4,
    )
    print(f"descriptor pass: {dt*1e3:8.2f} ms / {Q} crops", flush=True)


if __name__ == "__main__":
    main()
