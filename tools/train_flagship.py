"""Flagship-size training on the real TPU + full-size synthetic BOP AR.

VERDICT r2 #1: the learnability proof ran a 64-d toy config; this tool
trains the SHIPPED config (196/2048 points, 256-d transformer, ViT-B/16
feature extraction — reference config/base.yaml:16-105) with bf16
compute + block remat on rendered synthetic data, then scores held-out
frames of a NEVER-TRAINED object at BOP AR through the REAL file
pipeline (tools/e2e_synthetic_ar.run_eval: PEMRunner.run_file_pipeline
+ pipeline/bop_score), random weights vs trained.

Data: a pre-generated in-memory pool of RenderedPoseDataset samples at
full shapes (2048 observed points, 224^2 crops, 5000-point template
views); the pool regenerates epochs by reshuffling.  Host rendering is
NOT on the training critical path this way; device-only train
throughput is measured separately by tools/bench_train.py.

Usage:
  python -u tools/train_flagship.py --steps 2000 --batch_size 8 \
      --ckpt_dir /root/repo/.ckpt_flagship [--eval_only]
Reference: Pose_Estimation_Model/train.py:27-138, utils/solver.py:75-129.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--pool", type=int, default=0,
                   help="0 (default) = UNBOUNDED fresh-sample stream via "
                        "worker processes; >0 = round-3 fixed pool mode")
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--objects", type=int, default=64)
    p.add_argument("--template_views", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max_iters", type=int, default=None,
                   help="cosine-decay horizon; default = --steps so the "
                        "floor is actually reached (round-3 runs used "
                        "2x steps, leaving lr at ~half peak at the end)")
    p.add_argument("--ckpt_dir", default="/root/repo/.ckpt_flagship")
    p.add_argument("--ckpt_every", type=int, default=500)
    p.add_argument("--eval_frames", type=int, default=12)
    p.add_argument("--eval_out", default="/tmp/e2e_ar_flagship")
    p.add_argument("--eval_only", action="store_true")
    p.add_argument("--eval_step", type=int, default=None,
                   help="evaluate this checkpoint step (default latest)")
    p.add_argument("--eval_curve", default=None,
                   help="comma-separated checkpoint steps to evaluate "
                        "(AR curve); skips the random-weights baseline "
                        "re-eval when BENCH_FLAGSHIP_AR.json has one")
    p.add_argument("--skip_eval", action="store_true")
    p.add_argument("--dev_prefetch", action="store_true",
                   help="overlap host->device uploads with device steps "
                        "via a device_put thread (~2.4 vs ~1.3 wall "
                        "steps/s on the axon tunnel) — LEAKS host RAM "
                        "on that client (~10 MB/step, the remote-buffer "
                        "handle registry); run in chunks and restart "
                        "(resume picks up the latest checkpoint)")
    p.add_argument("--dtype", choices=("bf16", "f32"), default="bf16",
                   help="network compute dtype; f32 matches the "
                        "reference's full-precision training")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from sam6d_tpu.config import OptimConfig, TrainConfig, default_pem_config
    from sam6d_tpu.provider.training_dataset import (
        RenderedPoseDataset,
        collate,
    )
    from sam6d_tpu.train.checkpoint import (
        restore_train_state,
        save_train_state,
    )
    from sam6d_tpu.train.state import create_train_state, train_step

    cfg = default_pem_config()
    cfg = dataclasses.replace(
        cfg,
        feature_extraction=dataclasses.replace(
            cfg.feature_extraction, remat=True
        ),
    )
    tc = TrainConfig(batch_size=args.batch_size)
    optim = OptimConfig(lr=args.lr, warmup_iters=200,
                        max_iters=args.max_iters or max(args.steps, 1000))

    B = args.batch_size
    state = None

    def make_state():
        # init goes through PEM.__call__ (precomputed-template layout);
        # train_forward shares every param (cf. tools/smoke_train_eval).
        N = cfg.fine_npoint
        dummy = {
            "pts": np.zeros((B, tc.n_sample_observed_point, 3), np.float32),
            "rgb": np.zeros((B, tc.img_size, tc.img_size, 3), np.float32),
            "rgb_choose": np.zeros(
                (B, tc.n_sample_observed_point), np.int32
            ),
            "model_pts": np.zeros((B, N, 3), np.float32),
            "dense_po": np.zeros((B, N, 3), np.float32),
            "dense_fo": np.zeros(
                (B, N, cfg.feature_extraction.out_dim), np.float32
            ),
        }
        return create_train_state(
            jax.random.PRNGKey(0), cfg, optim, dummy,
            compute_dtype=(
                jnp.float32 if args.dtype == "f32" else jnp.bfloat16
            ),
        )

    if not args.eval_only:
        t0 = time.time()
        ds = RenderedPoseDataset(
            tc, n_objects=args.objects,
            n_template_views=args.template_views, n_samples=10**9, seed=0,
            uint8_rgb=True,  # 1/4-byte image planes over the tunnel
        )
        print(f"dataset ready in {time.time()-t0:.0f} s", flush=True)

        # Peek the resume step BEFORE any device work so the worker
        # processes fork from a JAX-quiet parent.
        import orbax.checkpoint as ocp

        try:
            mgr = ocp.CheckpointManager(os.path.abspath(args.ckpt_dir))
            done_before = int(mgr.latest_step() or 0)
            mgr.close()
        except Exception:
            done_before = 0

        from sam6d_tpu.train.solver import BatchPrefetcher, ProcessSampleStream

        if args.pool > 0:
            # round-3 fixed-pool mode (kept for A/B against streaming)
            print(f"generating sample pool ({args.pool} samples)...",
                  flush=True)
            pool = [ds[i] for i in range(args.pool)]

            def batch_stream():
                rng = np.random.RandomState(7)
                order = rng.permutation(args.pool)
                pos = 0
                for _ in range(done_before, args.steps):
                    if pos + B > args.pool:
                        order = rng.permutation(args.pool)
                        pos = 0
                    yield collate([pool[j] for j in order[pos:pos + B]])
                    pos += B

            stream = BatchPrefetcher(batch_stream(), depth=3)
        else:
            # UNBOUNDED fresh samples (each index rendered exactly once
            # over the run) — kills the pool over-cycling named as the
            # prime collapse driver in BASELINE.md round 3.
            stream = ProcessSampleStream(
                ds, B, n_workers=args.workers,
                start_index=done_before * B,
            )

        t0 = time.time()
        state = make_state()
        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(state.params)
        )
        print(f"state init {time.time()-t0:.0f} s, "
              f"{n_params/1e6:.1f} M params", flush=True)
        try:
            state = restore_train_state(args.ckpt_dir, state)
            print(f"resumed from step {int(state.step)}", flush=True)
        except Exception:
            pass

        step = jax.jit(train_step, donate_argnums=(0,))
        key = jax.random.PRNGKey(1)
        t_start = time.time()

        metrics_log = open(
            os.path.join(args.ckpt_dir, "metrics.jsonl"), "a"
        )
        # Explicit device_put prefetch (DevicePrefetcher) leaks HOST
        # memory through the axon client (~97% RAM by step 7.7k of the
        # round-5 20k run — remote buffer handles are never released),
        # but overlaps the per-call upload latency that otherwise costs
        # ~45% of the wall rate; --dev_prefetch opts in for bounded
        # chunks (see the flag help).
        if args.dev_prefetch:
            from sam6d_tpu.train.solver import DevicePrefetcher

            stream_iter = iter(DevicePrefetcher(iter(stream), depth=2))
        else:
            stream_iter = iter(stream)
        try:
            batches = stream_iter
            for it in range(done_before, args.steps):
                batch = next(batches)
                key, sk = jax.random.split(key)
                state, metrics = step(state, batch, sk)
                if (it + 1) % 5 == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    metrics_log.write(
                        json.dumps({"step": it + 1, **m}) + "\n"
                    )
                    metrics_log.flush()
                if (it + 1) % 25 == 0:
                    el = time.time() - t_start
                    sps = (it + 1 - done_before) / el
                    print(
                        f"step {it+1}/{args.steps} loss {m['loss']:.3f} "
                        f"c_acc {m.get('coarse_acc', 0):.3f} "
                        f"f_acc {m.get('fine_acc', 0):.3f} "
                        f"c_fg {m.get('coarse_fg_num', 0):.0f} "
                        f"gnorm {m.get('grad_norm', 0):.2f} "
                        f"cl2 {m.get('coarse_loss2', 0):.2f} "
                        f"fl2 {m.get('fine_loss2', 0):.2f} "
                        f"| {sps:.2f} steps/s (wall, incl. host)",
                        flush=True,
                    )
                if (it + 1) % args.ckpt_every == 0 or it + 1 == args.steps:
                    save_train_state(args.ckpt_dir, state, max_to_keep=20)
                    print(f"checkpointed @ {it+1}", flush=True)
        finally:
            if hasattr(stream, "close"):
                stream.close()
        wall_sps = (args.steps - done_before) / max(
            time.time() - t_start, 1e-9
        )
        print(f"training done: {wall_sps:.2f} steps/s wall-clock",
              flush=True)

    if args.skip_eval:
        return

    # ---- full-size synthetic BOP AR (held-out object) ----
    from tools.e2e_synthetic_ar import build_dataset, run_eval

    cad, tdir, scene, dets = build_dataset(
        args.eval_out, frames=args.eval_frames
    )
    scene_cam = json.load(
        open(os.path.join(scene, "scene_camera.json"))
    )["0"]
    json.dump(scene_cam,
              open(os.path.join(args.eval_out, "camera.json"), "w"))

    if state is None:
        state = make_state()
    bench_path = os.path.join(os.path.dirname(__file__), "..",
                              "BENCH_FLAGSHIP_AR.json")
    prev = {}
    if os.path.exists(bench_path):
        try:
            prev = json.load(open(bench_path))
        except Exception:
            prev = {}

    if "ar_random" in prev:
        ar_random = prev["ar_random"]
    else:
        rand_state = make_state()
        out_rand = run_eval(
            {"params": rand_state.params,
             "batch_stats": rand_state.batch_stats},
            cfg, cad, tdir, scene, dets, args.eval_out, "random-flagship",
        )
        ar_random = out_rand["ar"]

    eval_steps = (
        [int(s) for s in args.eval_curve.split(",")]
        if args.eval_curve else [args.eval_step]
    )
    curve = dict(prev.get("ar_curve", {}))
    out_tr = None
    for es in eval_steps:
        state = restore_train_state(args.ckpt_dir, state, step=es)
        out_tr = run_eval(
            {"params": state.params, "batch_stats": state.batch_stats},
            cfg, cad, tdir, scene, dets, args.eval_out,
            f"trained-flagship(step {int(state.step)})",
        )
        curve[str(int(state.step))] = out_tr["ar"]
        print(f"AR @ step {int(state.step)}: {out_tr['ar']:.3f}",
              flush=True)

    rec = {
        "config": "flagship ViT-B 196/2048 bf16+remat",
        "steps": int(state.step),
        "ar_random": ar_random,
        "ar_trained": out_tr["ar"],
        "ar_curve": {k: curve[k] for k in sorted(curve, key=int)},
        "detail_trained": out_tr,
    }
    with open(bench_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
