"""Training CLI.

Replaces reference Pose_Estimation_Model/train.py (:27-138): config from
dataclasses (optionally overridden on the command line), MegaPose or
synthetic dataset, mesh-sharded train step, Solver loop with
checkpoint/resume.

Usage:
  python -m sam6d_tpu.train.train_cli --data_dir /data/MegaPose \
      --log_dir log/pem --epochs 15
  python -m sam6d_tpu.train.train_cli --synthetic --steps 100   # smoke
"""

from __future__ import annotations

import argparse

import numpy as np
import jax

from sam6d_tpu.config import OptimConfig, PEMConfig, TrainConfig
from sam6d_tpu.parallel import batch_sharding, make_mesh, shard_train_state
from sam6d_tpu.parallel.distributed import init_distributed
from sam6d_tpu.provider.training_dataset import (
    MegaPoseDataset,
    SyntheticPoseDataset,
    batch_iterator,
)
from sam6d_tpu.train.solver import Solver
from sam6d_tpu.train.state import create_train_state, train_step


def main(argv=None):
    p = argparse.ArgumentParser(description="Train PEM on TPU")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--log_dir", default="log/pem")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None,
                   help="steps per epoch (default: dataset size / bs)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    init_distributed()
    train_cfg = TrainConfig()
    if args.batch_size:
        train_cfg = TrainConfig(batch_size=args.batch_size)
    pem_cfg = PEMConfig()

    if args.synthetic:
        dataset = SyntheticPoseDataset(train_cfg, n_samples=1024)
    else:
        assert args.data_dir, "--data_dir required without --synthetic"
        dataset = MegaPoseDataset(train_cfg, args.data_dir)

    bs = train_cfg.batch_size
    steps = args.steps or max(1, len(dataset) // bs)

    sample = dataset[0]
    example = {
        k: np.stack([v] * bs)
        for k, v in sample.items()
        if k != "K"
    }
    model_example = {
        k: example[k]
        for k in ("pts", "rgb", "rgb_choose", "tem_rgb", "tem_pts",
                  "tem_choose")
    }
    # Build via the precomputed-template layout for init (cheaper).
    init_batch = {
        "pts": example["pts"],
        "rgb": example["rgb"],
        "rgb_choose": example["rgb_choose"],
        "model_pts": example["tem_pts"][:, 0],
        "dense_po": example["tem_pts"][:, 0],
        "dense_fo": np.zeros(
            (bs, example["tem_pts"].shape[2],
             pem_cfg.feature_extraction.out_dim),
            np.float32,
        ),
    }
    state = create_train_state(
        jax.random.PRNGKey(train_cfg.rd_seed), pem_cfg, OptimConfig(),
        init_batch,
    )

    n_dev = jax.device_count()
    mesh = make_mesh((n_dev // args.tp, args.tp))
    state = shard_train_state(state, mesh)
    b_shard = batch_sharding(mesh)

    def sharded_loader():
        for batch in batch_iterator(dataset, bs, steps):
            yield jax.device_put(batch, b_shard)

    solver = Solver(
        state, train_cfg, sharded_loader(), log_dir=args.log_dir,
        step_fn=jax.jit(train_step),
    )
    if args.resume:
        solver.resume()
    solver.solve(args.epochs or train_cfg.training_epoch)


if __name__ == "__main__":
    main()
