"""Train a small DINOv2-style descriptor on procedural NOCS-colored
objects so the ISM 3-score pipeline can be validated WITHOUT pretrained
weights (VERDICT r2 #4).

No DINOv2 checkpoint can exist in this environment (zero egress), so
the semantic/appearance scoring path has only ever run on random
weights.  This trains a tiny DinoViT with an NT-Xent objective over CLS
descriptors of masked template-style crops: two random views of the
same object are positives, other objects in the batch are negatives —
exactly the invariance the reference's semantic score exploits
(model/loss.py PairwiseSimilarity over CLS features).  View-dependent
appearance similarity (what best-template retrieval uses) is preserved
because nearby views share pixels.

Held-out objects are never seen: the descriptor must generalize
zero-shot like the real DINOv2 (reference detector.py:65-134 onboards
arbitrary new objects).

Usage:
  python -u tools/train_ism_descriptor.py --steps 1500 \
      --ckpt_dir /root/repo/.ckpt_ism_desc
Then: python -u tools/ism_accuracy_eval.py --desc_ckpt ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tiny_descriptor_config():
    from sam6d_tpu.config import DescriptorConfig

    # Round 5 (VERDICT r4 #3): 96-d/4-block selected the right object on
    # only 85/100 frames against 16-object banks; selection is a
    # capacity-bound retrieval problem, so the in-repo descriptor grows
    # to 128-d/6 blocks (still ~100x under the reference's ViT-L/14,
    # dinov2.py:115) and trains against more objects/negatives
    # (tools defaults below).
    return DescriptorConfig(
        model_type="tiny", image_size=64, patch_size=8, embed_dim=128,
        depth=6, num_heads=4, chunk_size=16,
    )


def render_object_views(mesh, n_views: int, crop_size: int, rng,
                        jitter: bool = True):
    """(V, S, S, 3) [0,1] masked crops + (V, S, S) masks of one object,
    rendered from icosphere-ish directions with random in-plane roll."""
    from PIL import Image

    from sam6d_tpu.provider.training_dataset import (
        _render_view,
        random_rotation,
    )
    from sam6d_tpu.utils.bbox import square_bbox

    S = 96
    f = float(S)
    K = np.array([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)
    radius = float(np.linalg.norm(mesh.vertices, axis=1).max())
    imgs, masks = [], []
    for _ in range(n_views):
        R = random_rotation(rng)
        t = np.array([0.0, 0.0, 2.8 * radius], np.float32)
        if jitter:
            t[2] *= rng.uniform(0.9, 1.2)
        rgb, mask, _, _ = _render_view(mesh, R, t, K, (S, S))
        if mask.sum() < 16:
            continue
        y1, y2, x1, x2 = square_bbox(mask)
        crop = rgb[y1:y2, x1:x2] * (mask[y1:y2, x1:x2, None] > 0)
        m = mask[y1:y2, x1:x2]
        crop = np.asarray(
            Image.fromarray(crop.astype(np.uint8)).resize(
                (crop_size, crop_size), Image.BILINEAR
            ), np.float32,
        ) / 255.0
        m = np.asarray(
            Image.fromarray((m * 255).astype(np.uint8)).resize(
                (crop_size, crop_size), Image.NEAREST
            )
        ) > 127
        imgs.append(crop)
        masks.append(m)
    return np.stack(imgs), np.stack(masks)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--objects", type=int, default=160)
    p.add_argument("--views_per_object", type=int, default=16)
    p.add_argument("--batch_objects", type=int, default=24)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--ckpt_dir", default="/root/repo/.ckpt_ism_desc")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.models.ism.detector import normalize_rgb
    from sam6d_tpu.models.ism.dinov2 import DescriptorModel
    from sam6d_tpu.ops.geometry import l2_normalize
    from sam6d_tpu.provider.training_dataset import make_procedural_mesh
    from sam6d_tpu.train.checkpoint import save_params

    cfg = tiny_descriptor_config()
    model = DescriptorModel(cfg)
    rng = np.random.RandomState(0)

    print(f"rendering view pools: {args.objects} objects x "
          f"{args.views_per_object} views", flush=True)
    t0 = time.time()
    pools = []
    for _ in range(args.objects):
        mesh = make_procedural_mesh(rng)
        imgs, _ = render_object_views(
            mesh, args.views_per_object, cfg.image_size, rng
        )
        pools.append(imgs)
    print(f"pools ready in {time.time()-t0:.0f} s", flush=True)

    variables = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    B = args.batch_objects
    tau = args.temperature

    def loss_fn(params, batch):
        """batch: (2B, S, S, 3); rows [0..B) and [B..2B) are paired."""
        cls, _ = model.vit.apply({"params": params}, batch)
        z = l2_normalize(cls.astype(jnp.float32))
        sim = z @ z.T / tau  # (2B, 2B)
        sim = sim - 1e9 * jnp.eye(2 * B)
        targets = jnp.concatenate(
            [jnp.arange(B) + B, jnp.arange(B)]
        )  # each row's positive
        loss = optax.softmax_cross_entropy_with_integer_labels(
            sim, targets
        ).mean()
        acc = (jnp.argmax(sim, axis=1) == targets).mean()
        return loss, acc

    @jax.jit
    def step(params, opt_state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    def photometric(rng, img):
        """Brightness/contrast jitter: the query crops come from shaded
        scene renders (fg mean ~0.26 vs template ~0.31 measured); the
        descriptor must be invariant to that band or zero-shot objects
        collide (the round-4 0.85 selection, and round-5's single
        obj1<->distractor8 confusion pair, both live in this margin)."""
        g = rng.uniform(0.75, 1.25)
        c = rng.uniform(0.8, 1.2)
        mean = img.mean(axis=(0, 1), keepdims=True)
        out = (img - mean) * c + mean * g
        return np.clip(out, 0.0, 1.0).astype(np.float32)

    params = variables["params"]
    for it in range(args.steps):
        objs = rng.choice(args.objects, B, replace=False)
        a, b = [], []
        for o in objs:
            v1, v2 = rng.choice(len(pools[o]), 2, replace=False)
            a.append(photometric(rng, pools[o][v1]))
            b.append(photometric(rng, pools[o][v2]))
        batch = np.concatenate([np.stack(a), np.stack(b)])
        batch = np.asarray(normalize_rgb(jnp.asarray(batch)))
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(batch)
        )
        if (it + 1) % 50 == 0:
            print(f"step {it+1}/{args.steps} nt-xent {float(loss):.3f} "
                  f"pair-acc {float(acc):.3f}", flush=True)

    save_params(args.ckpt_dir, {"params": params})
    rec = {"steps": args.steps, "final_pair_acc": float(acc),
           "objects": args.objects}
    json.dump(rec, open(os.path.join(args.ckpt_dir, "train_meta.json"),
                        "w"))
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
