"""End-to-end learnability experiment: train a small PEM on synthetic
data and verify that INFERENCE pose accuracy improves.

No pretrained weights exist in this environment, so this is the
strongest available whole-system validation: train with the reference's
correspondence loss, then run the FULL inference path (coarse hypothesis
solve + fine dense solve, template bank from get_obj_feats) on held-out
samples and report rotation/translation error vs ground truth before and
after training.

Two data sources:
  --dataset rendered (default): RenderedPoseDataset — procedurally
    generated NOCS-colored meshes rendered with the in-repo rasterizer;
    appearance is position-correlated, so correspondence is learnable on
    both the geometric and appearance paths.  Held-out eval uses NEW
    objects (zero-shot, like the real system).
  --dataset random: round-1's SyntheticPoseDataset (noise RGB, Gaussian
    blob geometry).  Kept as the negative control: round 1 recorded that
    attention metrics improve but held-out pose accuracy does NOT —
    noise RGB carries no correspondence signal and blob geometry is
    ambiguous (VERDICT r1, Weak #1).

Round-2 result (recorded; see BASELINE.md): with the rendered dataset +
density-scaled label thresholds, 2000 steps / bs 8 / 128 train objects:
  held-out NEW objects (16 scenes): rot err median 141.7 -> 12.0 deg,
  trans err median 23.5 -> 2.2 mm, coarse-stage rot median 162 -> 11.7.
The round-1 failure was two-fold: (a) noise RGB had no correspondence
signal (fixed by NOCS-colored rendering); (b) the correspondence-label
threshold 0.15 x radius was below the sparse template point spacing at
the smoke's 32/128 point counts, so every coarse GT label was background
and the net correctly learned to predict nothing, starving the
hypothesis solver of foreground weights (fixed: loss_dis_thres flows
from config; smoke uses 0.4/0.25).

Usage: python tools/smoke_train_eval.py [--steps 2000] [--eval 16]
Reference contract: Pose_Estimation_Model/utils/loss_utils.py:7-52 +
run_inference_custom_pytorch.py:444-455.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def rot_err_deg(Ra, Rb):
    cos = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--eval", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dataset", choices=("rendered", "random"),
                   default="rendered")
    p.add_argument("--objects", type=int, default=32)
    p.add_argument("--eval_objects", type=int, default=8)
    p.add_argument("--template_views", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--eval_every", type=int, default=0,
                   help="also eval mid-training every N steps")
    p.add_argument("--ckpt_dir", default="",
                   help="save (and resume) train state here")
    p.add_argument("--cpu", action="store_true", default=True)
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sam6d_tpu.config import (
        CoarseMatchingConfig,
        FineMatchingConfig,
        GeoEmbeddingConfig,
        OptimConfig,
        PEMConfig,
        TrainConfig,
        ViTConfig,
    )
    from sam6d_tpu.provider.training_dataset import (
        RenderedPoseDataset,
        SyntheticPoseDataset,
        collate,
    )
    from sam6d_tpu.train.state import create_train_state, train_step

    pem_cfg = PEMConfig(
        coarse_npoint=32,
        fine_npoint=128,
        feature_extraction=ViTConfig(
            embed_dim=48, out_dim=32, img_size=32, patch_size=8
        ),
        geo_embedding=GeoEmbeddingConfig(hidden_dim=64),
        coarse_point_matching=CoarseMatchingConfig(
            input_dim=32, hidden_dim=64, out_dim=64, nproposal1=512,
            nproposal2=64,
            # Label threshold must exceed the sparse template point
            # spacing (~2r/sqrt(32)) or every GT label is background and
            # the hypothesis solver gets zero foreground weights (the
            # round-1 "coarse never learns" failure).
            loss_dis_thres=0.4,
        ),
        fine_point_matching=FineMatchingConfig(
            input_dim=32, hidden_dim=64, out_dim=64, pe_nsample1=8,
            pe_nsample2=16, pe_radius1=0.3, pe_radius2=0.6,
            loss_dis_thres=0.25, dis_thres=0.25,
        ),
    )
    train_cfg = TrainConfig(
        batch_size=args.batch_size, img_size=32,
        n_sample_observed_point=128, n_sample_template_point=128,
    )
    optim = OptimConfig(lr=args.lr, warmup_iters=20,
                        max_iters=args.steps * 2)

    if args.dataset == "rendered":
        ds = RenderedPoseDataset(
            train_cfg, n_objects=args.objects,
            n_template_views=args.template_views, n_samples=10**9, seed=0,
        )
        ev = RenderedPoseDataset(
            train_cfg, n_objects=args.eval_objects,
            n_template_views=args.template_views, n_samples=args.eval,
            seed=987654321,
        )
    else:
        ds = SyntheticPoseDataset(train_cfg, n_samples=10**9, seed=0)
        ev = SyntheticPoseDataset(train_cfg, n_samples=args.eval,
                                  seed=777777)

    b0 = collate([ds[i] for i in range(args.batch_size)])
    state = create_train_state(
        jax.random.PRNGKey(0), pem_cfg, optim,
        {
            "pts": b0["pts"],
            "rgb": b0["rgb"],
            "rgb_choose": b0["rgb_choose"],
            "model_pts": b0["tem_pts"][:, 0],
            "dense_po": b0["tem_pts"][:, 0],
            "dense_fo": np.zeros(
                (args.batch_size, b0["tem_pts"].shape[2], 32), np.float32
            ),
        },
    )
    step = jax.jit(train_step)

    if args.ckpt_dir:
        from sam6d_tpu.train.checkpoint import (
            restore_train_state,
            save_train_state,
        )

        try:
            state = restore_train_state(args.ckpt_dir, state)
            print(f"resumed from step {int(state.step)}", flush=True)
        except FileNotFoundError:
            pass

    def evaluate(st, tag, dataset=None, index_base=0):
        from sam6d_tpu.models.pem.model import PEM

        source = dataset if dataset is not None else ev
        model = PEM(pem_cfg)
        variables = {"params": st.params, "batch_stats": st.batch_stats}
        rerrs, terrs, crerrs = [], [], []
        for i in range(args.eval):
            if args.dataset == "rendered":
                s = source.sample(index_base + i, aug=False)
                tem_rgb, tem_choose, tem_pts = source.template_arrays(
                    s["obj_idx"], seed=i
                )
            else:
                s = source[i]
                tem_rgb, tem_choose, tem_pts = (
                    s["tem_rgb"], s["tem_choose"], s["tem_pts"]
                )
            po, fo = model.apply(
                variables, jnp.asarray(tem_rgb), jnp.asarray(tem_pts),
                jnp.asarray(tem_choose), 128, method=PEM.get_obj_feats,
            )
            out = model.apply(
                variables,
                pts=jnp.asarray(s["pts"])[None],
                rgb=jnp.asarray(s["rgb"])[None],
                rgb_choose=jnp.asarray(s["rgb_choose"])[None],
                model_pts=po,
                dense_po=po,
                dense_fo=fo,
                key=jax.random.PRNGKey(i),
            )
            R = np.asarray(out["pred_R"])[0]
            t = np.asarray(out["pred_t"])[0]
            rerrs.append(rot_err_deg(R, s["gt_r"]))
            terrs.append(np.linalg.norm(t - s["gt_t"]))
            # Coarse-stage diagnostic: init pose error.
            iR = np.asarray(out["init_R"])[0]
            crerrs.append(rot_err_deg(iR, s["gt_r"]))

        # Attention diagnostics on an eval batch through the TRAIN path:
        # does the learned correspondence generalize, and how many eval
        # points even get a foreground assignment (all-background makes
        # the coarse hypothesis solve degenerate + param-independent)?
        from sam6d_tpu.train.loss import pem_loss

        nb = min(args.eval, args.batch_size)
        if args.dataset == "rendered":
            ebatch = collate(
                [source.sample(index_base + i, aug=False) for i in range(nb)]
            )
        else:
            ebatch = collate([source[i] for i in range(nb)])
        eout, _ = model.apply(
            variables,
            jnp.asarray(ebatch["pts"]), jnp.asarray(ebatch["rgb"]),
            jnp.asarray(ebatch["rgb_choose"]),
            jnp.asarray(ebatch["tem_rgb"]), jnp.asarray(ebatch["tem_pts"]),
            jnp.asarray(ebatch["tem_choose"]),
            jax.random.PRNGKey(0), jnp.asarray(ebatch["gt_r"]),
            jnp.asarray(ebatch["gt_t"]),
            method="train_forward", mutable=["batch_stats"],
        )
        _, em = pem_loss(
            eout, jnp.asarray(ebatch["gt_r"]), jnp.asarray(ebatch["gt_t"]),
            coarse_dis_thres=pem_cfg.coarse_point_matching.loss_dis_thres,
            fine_dis_thres=pem_cfg.fine_point_matching.loss_dis_thres,
        )
        print(
            f"[{tag}] rot err: mean {np.mean(rerrs):.1f} deg "
            f"median {np.median(rerrs):.1f} | trans err: "
            f"mean {np.mean(terrs)*1000:.1f} mm "
            f"median {np.median(terrs)*1000:.1f} mm | "
            f"coarse rot median {np.median(crerrs):.1f} deg | "
            f"eval c_acc {float(em['coarse_acc']):.3f} "
            f"f_acc {float(em['fine_acc']):.3f} "
            f"c_fg {float(em['coarse_fg_num']):.0f} "
            f"f_fg {float(em['fine_fg_num']):.0f}",
            flush=True,
        )
        return np.median(rerrs), np.median(terrs)

    r0, t0 = evaluate(state, "untrained")

    key = jax.random.PRNGKey(1)
    idx = 0
    tstart = time.time()
    for it in range(args.steps):
        batch = collate([ds[idx + j] for j in range(args.batch_size)])
        idx += args.batch_size
        key, sk = jax.random.split(key)
        state, metrics = step(state, batch, sk)
        if (it + 1) % 25 == 0:
            print(
                f"step {it + 1}: loss {float(metrics['loss']):.3f} "
                f"coarse_acc {float(metrics['coarse_acc']):.3f} "
                f"fine_acc {float(metrics['fine_acc']):.3f} "
                f"({(time.time()-tstart)/(it+1):.2f} s/step)",
                flush=True,
            )
        if args.eval_every and (it + 1) % args.eval_every == 0:
            evaluate(state, f"step {it + 1}")
            if args.dataset == "rendered":
                # Diagnostic: held-out VIEWS of TRAINING objects —
                # separates generalization-to-new-objects from
                # structural inference-path problems.
                evaluate(state, f"step {it + 1} train-obj", dataset=ds,
                         index_base=500_000_000)

    if args.ckpt_dir:
        save_train_state(args.ckpt_dir, state)
        print(f"saved state at step {int(state.step)}", flush=True)

    r1, t1 = evaluate(state, f"trained {args.steps} steps")
    print(
        f"improvement: rot {r0:.1f} -> {r1:.1f} deg, "
        f"trans {t0 * 1000:.1f} -> {t1 * 1000:.1f} mm"
    )


if __name__ == "__main__":
    main()
