"""Solver + checkpoint + synthetic-dataset training-path tests."""

import os

import numpy as np
import pytest
import jax

from sam6d_tpu.config import OptimConfig, TrainConfig
from sam6d_tpu.provider.training_dataset import (
    SyntheticPoseDataset,
    batch_iterator,
    collate,
)
from sam6d_tpu.train.checkpoint import (
    restore_train_state,
    save_train_state,
)
from sam6d_tpu.train.solver import Solver
from sam6d_tpu.train.state import create_train_state, train_step

from tests.test_pem_model import tiny_pem_config


def tiny_train_cfg():
    return TrainConfig(
        batch_size=2, iters_to_print=1, rd_seed=1, img_size=32,
        n_sample_observed_point=64, n_sample_template_point=64,
    )


@pytest.fixture(scope="module")
def template_state():
    cfg = tiny_train_cfg()
    ds = SyntheticPoseDataset(cfg, n_samples=8)
    batch = collate([ds[0], ds[1]])
    model_batch = {
        "pts": batch["pts"],
        "rgb": batch["rgb"],
        "rgb_choose": batch["rgb_choose"],
        "model_pts": batch["tem_pts"][:, 0, :32],
        "dense_po": batch["tem_pts"][:, 0],
        "dense_fo": np.zeros((2, 64, 32), np.float32),
    }
    state = create_train_state(
        jax.random.PRNGKey(0), tiny_pem_config(), OptimConfig(), model_batch
    )
    return state, cfg, ds


class TestTemplateTrainPath:
    @pytest.mark.slow
    def test_train_forward_with_templates(self, template_state):
        state, cfg, ds = template_state
        batch = collate([ds[0], ds[1]])
        step = jax.jit(train_step)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert "coarse_loss0" in metrics and "fine_loss2" in metrics

    def test_synthetic_loss_decreases(self, template_state):
        # On a fixed synthetic batch the correspondence loss should
        # decrease over a handful of steps (the geometry is learnable).
        state, cfg, ds = template_state
        batch = collate([ds[0], ds[1]])
        step = jax.jit(train_step)
        losses = []
        s = state
        for i in range(8):
            s, m = step(s, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert min(losses[4:]) < losses[0]


class TestSolverAndCheckpoint:
    def test_solver_runs_and_logs(self, template_state, tmp_path):
        state, cfg, ds = template_state
        loader = list(batch_iterator(ds, batch_size=2, steps=2))
        solver = Solver(state, cfg, loader, log_dir=str(tmp_path))
        solver.train_epoch(1, jax.random.PRNGKey(0))
        assert os.path.exists(str(tmp_path / "metrics.jsonl"))
        lines = open(str(tmp_path / "metrics.jsonl")).read().strip().split(
            "\n"
        )
        assert len(lines) == 2

    def test_checkpoint_roundtrip(self, template_state, tmp_path):
        state, cfg, ds = template_state
        batch = collate([ds[0], ds[1]])
        s1, _ = jax.jit(train_step)(state, batch, jax.random.PRNGKey(0))
        ckpt_dir = str(tmp_path / "ckpt")
        save_train_state(ckpt_dir, s1)
        restored = restore_train_state(ckpt_dir, state)
        assert int(restored.step) == int(s1.step)
        a = jax.tree_util.tree_leaves(s1.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_missing_is_graceful(self, template_state, tmp_path):
        state, cfg, ds = template_state
        solver = Solver(state, cfg, [], log_dir=str(tmp_path / "log2"))
        solver.resume(str(tmp_path / "nonexistent"))  # no raise


class TestBatchPrefetcher:
    def test_order_and_completion(self):
        from sam6d_tpu.train.solver import BatchPrefetcher

        items = list(range(17))
        out = list(BatchPrefetcher(iter(items), depth=3))
        assert out == items

    def test_exception_propagates(self):
        import pytest

        from sam6d_tpu.train.solver import BatchPrefetcher

        def gen():
            yield 1
            raise RuntimeError("boom")

        it = iter(BatchPrefetcher(gen(), depth=2))
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            list(it)
