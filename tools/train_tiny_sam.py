"""Train a tiny SAM on rendered scenes so the REAL AMG machinery can
generate ISM proposals in-repo (VERDICT r3 #3: the amg.py/sam grid
path had never produced proposals in any accuracy measurement — no SAM
checkpoint can exist here, zero egress — so we train our own).

Model: the SAME ImageEncoderViT/PromptEncoder/MaskDecoder stack as the
full SAM (models/ism/sam/*), shrunk (128^2 input, 4-block 96-d encoder,
all-global attention over the 8x8 grid; decoder at its native 256-d).
Data: multi-object scenes composed by z-buffer merge of procedural
NOCS-colored meshes (provider/training_dataset.make_procedural_mesh)
over the same rasterizer as the PEM training pool.
Loss: the SAM recipe — per prompt, min over the 4 multimask outputs of
(20*focal + dice) on the low-res logits + MSE of the IoU head against
the actual IoU of the chosen mask (segment-anything paper §3; reference
inference uses the same multimask contract via utils/amg.py).

Usage:
  python -u tools/train_tiny_sam.py --steps 1500 \
      --ckpt /root/repo/.ckpt_tiny_sam
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Round 5 (VERDICT r4 #2): 96-d/4-block topped out at AMG recall@0.5 =
# 0.50 (mean best-IoU 0.47, n=14) — underfit, not logit-resolution
# (the 64^2 logit cap was removed in round 4).  128-d/6-block + 2x the
# prompt-samples lifts it; still ~300x under SAM ViT-H.
TINY_ENCODER = dict(
    embed_dim=128,
    depth=6,
    num_heads=4,
    global_attn_indexes=(0, 1, 2, 3, 4, 5),  # 16x16 grid: all-global is cheap
    window_size=16,
)
# 256 input -> 64^2 low-res logits: at 128 input the 32^2 logits cap
# best-IoU at ~0.5 for ~40-px objects (measured, /tmp/amg_debug round 4).
TINY_IMG = 256


def make_tiny_sam(dtype=None):
    import jax.numpy as jnp

    from sam6d_tpu.models.ism.sam.model import SAM

    # flash=False: the Pallas flash-RPE kernel is forward-only (serving);
    # training needs the differentiable materialized path, and at 256
    # tokens materialized attention is the faster form anyway (the
    # DINOv2 short-sequence lesson, BASELINE.md).
    return SAM(
        model_type="vit_b",
        img_size=TINY_IMG,
        dtype=dtype or jnp.float32,
        encoder_kwargs=dict(TINY_ENCODER, flash=False),
    )


def load_tiny_sam_amg(ckpt: str, points_per_side: int = 24,
                      pred_iou_thresh: float = 0.5,
                      stability_score_thresh: float = 0.7):
    """Tiny SAM + the real SamAutomaticMaskGenerator (amg.py)."""
    import jax

    from sam6d_tpu.config import SegmentorConfig
    from sam6d_tpu.models.ism.sam.amg import SamAutomaticMaskGenerator
    from sam6d_tpu.train.checkpoint import restore_params

    sam = make_tiny_sam()
    sam.init(jax.random.PRNGKey(0))
    sam.variables = restore_params(ckpt, sam.variables)
    cfg = SegmentorConfig(
        points_per_side=points_per_side,
        points_per_batch=64,
        pred_iou_thresh=pred_iou_thresh,
        stability_score_thresh=stability_score_thresh,
        segmentor_width_size=0,  # frames are already small
        min_mask_region_area=0,
    )
    return SamAutomaticMaskGenerator(sam, cfg)


# ---------------------------------------------------------------------------
# data: multi-object rendered scenes with instance masks


def render_scene(meshes, rng, S=160, n_min=1, n_max=3,
                 background_mm=900.0):
    """Compose 1-3 objects into one frame by z-buffer merge.

    Returns (rgb uint8 (S,S,3), depth_mm (S,S), inst_masks (K,S,S))."""
    from sam6d_tpu.provider.training_dataset import (
        _render_view,
        random_rotation,
    )

    f = 4.0 * S
    K = np.array([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)
    n = rng.randint(n_min, n_max + 1)
    rgb = np.full((S, S, 3), 90, np.uint8)
    depth = np.full((S, S), background_mm, np.float32)
    inst = []
    for _ in range(n):
        mesh = meshes[rng.randint(len(meshes))]
        R = random_rotation(rng)
        z = rng.uniform(400.0, 600.0)
        lat = z / f
        t = np.array([rng.uniform(-35, 35) * lat,
                      rng.uniform(-35, 35) * lat, z], np.float32)
        orgb, omask, _, odepth = _render_view(mesh, R, t, K, (S, S))
        closer = omask & (odepth < depth)
        if closer.sum() < 48:
            continue
        rgb[closer] = orgb[closer]
        depth[closer] = odepth[closer]
        # Earlier instances lose the occluded pixels.
        inst = [m & ~closer for m in inst]
        inst.append(closer)
    inst = [m for m in inst if m.sum() >= 48]
    if not inst:
        return render_scene(meshes, rng, S, n_min, n_max, background_mm)
    return rgb, depth, np.stack(inst)


def make_training_batch(meshes, rng, sam, B=4, P=8, S=160):
    """Images preprocessed exactly like AMG will at test time
    (ResizeLongestSide to TINY_IMG + SAM pixel norm), prompts in input
    coords, GT masks at the low-res logit resolution (TINY_IMG/4)."""
    lowres = TINY_IMG // 4
    imgs = np.zeros((B, TINY_IMG, TINY_IMG, 3), np.float32)
    pts = np.zeros((B, P, 2), np.float32)
    gts = np.zeros((B, P, lowres, lowres), np.float32)
    from PIL import Image

    for b in range(B):
        rgb, _, inst = render_scene(meshes, rng, S=S)
        padded, scale, _ = sam.preprocess_numpy(rgb)
        imgs[b] = padded
        # Low-res GT per instance: bilinear to (lowres, lowres),
        # threshold at 0.5 (the frame is square so no padding offset).
        inst_low = np.stack([
            np.asarray(
                Image.fromarray(m.astype(np.uint8) * 255).resize(
                    (lowres, lowres), Image.BILINEAR
                )
            ) > 127
            for m in inst
        ])
        for p in range(P):
            if rng.rand() < 0.75 and len(inst):
                # Foreground prompt: a random pixel of a random instance.
                mi = rng.randint(len(inst))
                ys, xs = np.nonzero(inst[mi])
                j = rng.randint(len(ys))
                y, x = ys[j], xs[j]
                gts[b, p] = inst_low[mi]
            else:
                # Background prompt: empty target.
                while True:
                    y = rng.randint(S)
                    x = rng.randint(S)
                    if not inst.any(axis=0)[y, x]:
                        break
            pts[b, p] = (x * scale, y * scale)
    return imgs, pts, gts


# ---------------------------------------------------------------------------
# loss + train step


def sam_loss(sam, variables, imgs, pts, gts):
    import jax
    import jax.numpy as jnp

    emb = sam.encoder.apply(variables["encoder"], imgs)  # (B, h, w, 256)

    def decode_one(e, p):
        logits, iou = sam._decode_impl(
            variables, e[None], p[:, None, :],
            jnp.ones((p.shape[0], 1), jnp.int32),
        )
        return logits, iou  # (P, 4, 4h, 4w), (P, 4)

    logits, iou = jax.vmap(decode_one)(emb, pts)
    gt = gts[:, :, None]  # (B, P, 1, H, W)

    p = jax.nn.sigmoid(logits)
    eps = 1e-6
    # Focal (gamma=2, alpha=.25 on fg) per pixel, mean over the mask.
    pt = p * gt + (1 - p) * (1 - gt)
    alpha = 0.25 * gt + 0.75 * (1 - gt)
    focal = -(alpha * (1 - pt) ** 2 * jnp.log(pt + eps)).mean(axis=(-2, -1))
    inter = (p * gt).sum(axis=(-2, -1))
    dice = 1 - (2 * inter + 1) / (p.sum(axis=(-2, -1))
                                  + gt.sum(axis=(-2, -1)) + 1)
    per_mask = 20.0 * focal + dice  # (B, P, 4)

    best = jnp.argmin(per_mask, axis=-1)  # (B, P)
    mask_loss = jnp.take_along_axis(
        per_mask, best[..., None], axis=-1
    )[..., 0].mean()

    # IoU head regressed against the ACTUAL IoU of each predicted mask.
    hard = logits > 0
    ti = (hard & (gt > 0.5)).sum(axis=(-2, -1))
    tu = (hard | (gt > 0.5)).sum(axis=(-2, -1))
    true_iou = ti / jnp.maximum(tu, 1)
    iou_loss = ((iou - true_iou) ** 2).mean()
    return mask_loss + iou_loss, (mask_loss, iou_loss, true_iou.mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4500)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prompts", type=int, default=8)
    p.add_argument("--objects", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--ckpt", default="/root/repo/.ckpt_tiny_sam")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.provider.training_dataset import make_procedural_mesh
    from sam6d_tpu.train.checkpoint import save_params

    rng = np.random.RandomState(11)
    meshes = [make_procedural_mesh(rng) for _ in range(args.objects)]

    sam = make_tiny_sam()
    variables = sam.init(jax.random.PRNGKey(0))
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(variables)
    )
    print(f"tiny SAM: {n_params/1e6:.2f} M params", flush=True)

    tx = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps))
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state, imgs, pts, gts):
        (loss, aux), grads = jax.value_and_grad(
            lambda v: sam_loss(sam, v, imgs, pts, gts), has_aux=True
        )(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss, aux

    t0 = time.time()
    for it in range(args.steps):
        imgs, pts, gts = make_training_batch(
            meshes, rng, sam, B=args.batch, P=args.prompts
        )
        variables, opt_state, loss, aux = step(
            variables, opt_state, imgs, pts, gts
        )
        if (it + 1) % 50 == 0:
            ml, il, tiou = (float(a) for a in aux)
            print(
                f"step {it+1}/{args.steps} loss {float(loss):.3f} "
                f"mask {ml:.3f} iou {il:.3f} true_iou {tiou:.3f} "
                f"| {(it+1)/(time.time()-t0):.2f} steps/s",
                flush=True,
            )
    sam.variables = variables
    save_params(args.ckpt, variables)
    print(f"saved {args.ckpt}", flush=True)

    # self-check: AMG recall of GT instances on fresh scenes (>= 100
    # instances, VERDICT r4 weak #2: n=14 was far too small).
    amg = load_tiny_sam_amg(args.ckpt)
    recalls = []
    for _ in range(56):
        rgb, _, inst = render_scene(meshes, rng)
        out = amg.generate_masks(rgb)
        for m in inst:
            if len(out["masks"]) == 0:
                recalls.append(0.0)
                continue
            ious = [
                (m & pm).sum() / max((m | pm).sum(), 1)
                for pm in out["masks"]
            ]
            recalls.append(float(max(ious)))
    rec = {
        "amg_mean_best_iou": float(np.mean(recalls)),
        "amg_recall_at_0.5": float(np.mean(np.array(recalls) > 0.5)),
        "n_instances": len(recalls),
    }
    print(json.dumps(rec), flush=True)
    with open("BENCH_TINY_SAM.json", "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
