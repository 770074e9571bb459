"""Diagnose the gradient-norm cliff on the real TPU (round-4 training
forensics).

Observed: from the frozen cliff state (.ckpt_cliff_1000), every TPU
batch gives global grad norm ~1750 (bs 16, bf16) while the identical
params/batch recipe on CPU gives ~33.  This script measures, ON the
TPU, grad norms for (a) bf16, (b) f32, (c) several PRNG keys, (d) bf16
per-module norms — isolating whether the 50x is TPU-bf16 numerics and
where it lives.

Usage: python -u tools/diag_cliff_grads.py [--batch 8] [--ckpt ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/root/repo/.ckpt_cliff_1000/default")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtypes", default="bf16,f32")
    ap.add_argument("--keys", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import orbax.checkpoint as ocp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    ck = ocp.StandardCheckpointer()

    def load(path):
        meta = ck.metadata(path)
        tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
        template = jtu.tree_map(
            lambda m: np.zeros(m.shape, m.dtype), tree,
            is_leaf=lambda x: hasattr(x, "shape") and hasattr(x, "dtype"),
        )
        return ck.restore(path, template)

    cliff = load(args.ckpt)

    from sam6d_tpu.config import TrainConfig, default_pem_config
    from sam6d_tpu.models.pem.model import PEM
    from sam6d_tpu.provider.training_dataset import (
        RenderedPoseDataset,
        collate,
    )
    from sam6d_tpu.train.loss import pem_loss

    cfg = default_pem_config()
    cfg = dataclasses.replace(
        cfg,
        feature_extraction=dataclasses.replace(
            cfg.feature_extraction, remat=True
        ),
    )
    B = args.batch
    tc = TrainConfig(batch_size=B)
    ds = RenderedPoseDataset(tc, n_objects=64, n_template_views=8,
                             n_samples=10**9, seed=0)
    batches = [
        collate([ds[base + j] for j in range(B)])
        for base in (23000, 30000)
    ]

    def flatten(tree, prefix=()):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix] = tree
        return out

    for dname in args.dtypes.split(","):
        dtype = jnp.bfloat16 if dname == "bf16" else jnp.float32
        model = PEM(cfg, dtype=dtype)

        def loss_fn(params, batch, key):
            variables = {"params": params,
                         "batch_stats": cliff["batch_stats"]}
            out, _ = model.apply(
                variables, batch["pts"], batch["rgb"],
                batch["rgb_choose"], batch["tem_rgb"], batch["tem_pts"],
                batch["tem_choose"], key, batch["gt_r"], batch["gt_t"],
                method="train_forward", mutable=["batch_stats"],
            )
            loss, _ = pem_loss(out, batch["gt_r"], batch["gt_t"],
                               coarse_dis_thres=0.15,
                               fine_dis_thres=0.15)
            return loss

        gfn = jax.jit(jax.value_and_grad(loss_fn))
        for bi, batch in enumerate(batches):
            for k in range(args.keys):
                loss, grads = gfn(cliff["params"], batch,
                                  jax.random.PRNGKey(100 + k))
                import optax

                gn = float(optax.global_norm(grads))
                print(f"{dname} batch{bi} key{k}: loss {float(loss):.3f} "
                      f"gnorm {gn:.1f}", flush=True)
            if dname == "bf16" and bi == 0:
                import collections

                fg = flatten(jax.device_get(grads))
                bymod = collections.Counter()
                for kk, v in fg.items():
                    top = "/".join(kk[:2])
                    bymod[top] += float(np.sum(np.asarray(v, np.float32) ** 2))
                print("  per-module norms:")
                for mod, ss in bymod.most_common(8):
                    print(f"    {np.sqrt(ss):10.1f}  {mod}", flush=True)


if __name__ == "__main__":
    main()
