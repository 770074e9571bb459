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
        self._stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    # Bounded put so an abandoned consumer (exception in
                    # the train loop) doesn't leave this thread blocked
                    # holding the source iterator forever — a later
                    # prefetcher over the same generator would then race
                    # it ("generator already executing").
                    while not self._stop.is_set():
                        try:
                            self._q.put(b, timeout=0.25)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._err.append(e)
            finally:
                # The done marker MUST land (a dropped marker hangs the
                # consumer's get() forever); bounded retries so a closed
                # prefetcher still lets the thread exit.
                while not self._stop.is_set():
                    try:
                        self._q.put(self._done, timeout=0.25)
                        break
                    except queue.Full:
                        continue

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def close(self):
        """Release the worker (and its hold on the source iterator)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._t.join(timeout=2.0)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                if self._err:
                    raise self._err[0]
                return
            yield item


class DevicePrefetcher:
    """Host->device double buffering on a background thread.

    Wraps an iterable of HOST batches and yields DEVICE-resident ones:
    the thread issues jax.device_put ahead of consumption, so the
    (tunnel) upload overlaps the running device step instead of
    serializing with the next dispatch — device_put releases the GIL
    for the transfer, and a depth-2 queue keeps one batch in flight.
    CAUTION (measured, round 5): through the axon remote-TPU client,
    explicit device_put handles are never released host-side — the 20k
    flagship run leaked to 97% RAM by step 7.7k and stalled.  On such
    tunnels let jit manage transfers (train_flagship does); this class
    is for hosts with locally attached devices."""

    def __init__(self, batches: Iterable, depth: int = 2):
        import queue
        import threading

        import jax as _jax

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: list = []
        self._stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    db = _jax.device_put(b)
                    while not self._stop.is_set():
                        try:
                            self._q.put(db, timeout=0.25)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:
                self._err.append(e)
            finally:
                while not self._stop.is_set():
                    try:
                        self._q.put(self._done, timeout=0.25)
                        break
                    except queue.Full:
                        continue

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._t.join(timeout=2.0)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                if self._err:
                    raise self._err[0]
                return
            yield item


class ProcessSampleStream:
    """Fresh-sample batch stream over forked worker PROCESSES.

    The thread-based BatchPrefetcher left ~21% of the device rate on the
    floor (BASELINE.md round 3): the collate thread contends for the GIL
    with the dispatch loop on this 2-core host.  Worker processes render
    AND collate out-of-process, shipping ready batches through an
    mp.Queue, so the trainer's Python thread only unpickles.

    Each worker w draws the index progression
        start_index + (i * n_workers + w) * batch_size + j
    from `dataset[index]` — with RenderedPoseDataset's deterministic
    per-index RNG this yields an UNBOUNDED fresh sample stream (no pool
    over-cycling; the round-3 512-sample pool reused each sample ~150x
    over a 5k-step run, the prime suspect for the post-peak collapse).
    Analog of reference torch DataLoader(num_workers) (train.py:115-116).
    """

    def __init__(self, dataset, batch_size: int, n_workers: int = 2,
                 depth: int = 4, start_index: int = 0, collate_fn=None):
        import multiprocessing as mp

        if collate_fn is None:
            from sam6d_tpu.provider.training_dataset import collate
            collate_fn = collate
        ctx = mp.get_context("fork")
        self._q = ctx.Queue(maxsize=depth)
        self._stop = ctx.Event()
        self._workers = []
        for w in range(n_workers):
            p = ctx.Process(
                target=self._worker,
                args=(dataset, batch_size, n_workers, w, start_index,
                      collate_fn, self._q, self._stop),
                daemon=True,
            )
            p.start()
            self._workers.append(p)

    @staticmethod
    def _worker(dataset, B, n_workers, w, start, collate_fn, q, stop):
        i = 0
        while not stop.is_set():
            base = start + (i * n_workers + w) * B
            batch = collate_fn([dataset[base + j] for j in range(B)])
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.25)
                    break
                except Exception:
                    continue
            i += 1

    def __iter__(self):
        while True:
            yield self._q.get()

    def close(self):
        self._stop.set()
        try:
            while not self._q.empty():
                self._q.get_nowait()
        except Exception:
            pass
        for p in self._workers:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()


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
        # Consecutive spike/non-finite skips (train_step's
        # update_skipped metric).  skip_spike_updates freezes params on
        # skipped batches, so a permanently diverged run would
        # otherwise look like a flat loss; surface it loudly instead
        # (reference analog: optax.apply_if_finite's
        # max_consecutive_errors=100).
        self.consecutive_skips = 0
        self.max_consecutive_skips = 100

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
            # Per-epoch image-subset resampling (reference utils/
            # solver.py:79 dataset.reset()) — duck-typed off the
            # dataloader or its .dataset.
            for obj in (self.dataloader,
                        getattr(self.dataloader, "dataset", None)):
                if hasattr(obj, "reset"):
                    obj.reset()
                    break
            key, ek = jax.random.split(key)
            self.train_epoch(epoch, ek)
            save_train_state(
                os.path.join(self.log_dir, "ckpt"), self.state
            )
        return self.state

    def train_epoch(self, epoch: int, key):
        t_data = t_step = 0.0
        t0 = time.perf_counter()
        prefetcher = BatchPrefetcher(self.dataloader)
        try:
            for it, batch in enumerate(prefetcher):
                t1 = time.perf_counter()
                t_data += t1 - t0
                key, sk = jax.random.split(key)
                self.state, metrics = self.step_fn(self.state, batch, sk)
                # Force completion so timing is real.
                loss = float(metrics["loss"])
                t0 = time.perf_counter()
                t_step += t0 - t1

                if float(metrics.get("update_skipped", 0.0)) > 0.5:
                    self.consecutive_skips += 1
                    if self.consecutive_skips >= self.max_consecutive_skips:
                        raise RuntimeError(
                            f"{self.consecutive_skips} consecutive "
                            "spike/non-finite batches skipped — the run "
                            "has diverged (params are frozen by "
                            "skip_spike_updates); aborting"
                        )
                else:
                    self.consecutive_skips = 0

                if (it + 1) % self.cfg.iters_to_print == 0:
                    self._log_metrics(epoch, it, metrics, t_data, t_step)
                    t_data = t_step = 0.0
        finally:
            prefetcher.close()
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
