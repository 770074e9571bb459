"""Training solver: epoch loop with timing, logging, checkpoint/resume.

Re-derivation of reference utils/solver.py (Solver :15-191): per-iteration
data/forward timing, periodic metric logging in the reference's format,
per-epoch checkpointing, and resume.  tensorboardX is replaced by a plain
JSONL metrics log (metrics.jsonl) which any dashboard can tail.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Iterable

import jax
import numpy as np

from sam6d_tpu.config import TrainConfig
from sam6d_tpu.train.checkpoint import restore_train_state, save_train_state
from sam6d_tpu.train.state import TrainState, train_step


def get_logger(log_dir: str | None = None, name: str = "sam6d_tpu"):
    """File+console logger (reference solver.py:220-235)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, "train.log"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class BatchPrefetcher:
    """Background-thread batch pipeline: host collation overlaps device
    steps (the flagship run measured 5.8 device steps/s vs ~1.5-2.0
    wall — the device idled behind the 2-core Python collate; the
    reference hides the same latency behind torch DataLoader workers,
    train.py:115-116).

    Wraps any iterable of host batches; `depth` batches are staged
    ahead in a queue.  Iteration order is unchanged."""

    def __init__(self, batches: Iterable, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: list = []

        def worker():
            try:
                for b in batches:
                    self._q.put(b)
            except BaseException as e:  # surfaced on the consumer side
                self._err.append(e)
            finally:
                self._q.put(self._done)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                if self._err:
                    raise self._err[0]
                return
            yield item


class Solver:
    def __init__(
        self,
        state: TrainState,
        cfg: TrainConfig,
        dataloader: Iterable,
        log_dir: str = "log",
        step_fn: Callable = None,
    ):
        self.state = state
        self.cfg = cfg
        self.dataloader = dataloader
        self.log_dir = log_dir
        self.logger = get_logger(log_dir)
        self.metrics_path = os.path.join(log_dir, "metrics.jsonl")
        os.makedirs(log_dir, exist_ok=True)
        self.step_fn = step_fn or jax.jit(train_step)
        self.epoch = 1

    def resume(self, ckpt_dir: str | None = None):
        ckpt_dir = ckpt_dir or os.path.join(self.log_dir, "ckpt")
        try:
            self.state = restore_train_state(ckpt_dir, self.state)
            self.logger.info(
                f"resumed from {ckpt_dir} at step {int(self.state.step)}"
            )
        except FileNotFoundError:
            self.logger.info("no checkpoint to resume; starting fresh")
        return self

    def solve(self, epochs: int | None = None):
        epochs = epochs or self.cfg.training_epoch
        key = jax.random.PRNGKey(self.cfg.rd_seed)
        for epoch in range(self.epoch, epochs + 1):
            key, ek = jax.random.split(key)
            self.train_epoch(epoch, ek)
            save_train_state(
                os.path.join(self.log_dir, "ckpt"), self.state
            )
        return self.state

    def train_epoch(self, epoch: int, key):
        t_data = t_step = 0.0
        t0 = time.perf_counter()
        for it, batch in enumerate(BatchPrefetcher(self.dataloader)):
            t1 = time.perf_counter()
            t_data += t1 - t0
            key, sk = jax.random.split(key)
            self.state, metrics = self.step_fn(self.state, batch, sk)
            # Force completion so timing is real.
            loss = float(metrics["loss"])
            t0 = time.perf_counter()
            t_step += t0 - t1

            if (it + 1) % self.cfg.iters_to_print == 0:
                self._log_metrics(epoch, it, metrics, t_data, t_step)
                t_data = t_step = 0.0
        return self.state

    def _log_metrics(self, epoch, it, metrics, t_data, t_step):
        scalars = {
            k: float(np.asarray(v)) for k, v in metrics.items()
        }
        scalars.update(
            epoch=epoch, iter=it + 1, step=int(self.state.step),
            t_data=round(t_data, 3), t_step=round(t_step, 3),
        )
        self.logger.info(
            f"epoch {epoch} iter {it + 1} loss {scalars['loss']:.4f} "
            f"T_data {t_data:.2f}s T_step {t_step:.2f}s"
        )
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(scalars) + "\n")
