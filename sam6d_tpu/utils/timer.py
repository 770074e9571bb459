"""Device-side timing that survives a high-latency device tunnel.

The dev environment reaches the TPU through a tunnel with ~100ms+
round-trip overhead and unreliable async-dispatch semantics, so per-call
host timing is meaningless.  `device_time_per_iter` wraps the function in
a lax.scan whose carry feeds a 1e-12-scaled perturbation into the next
iteration's input: XLA can neither CSE the iterations nor hoist the body
out of the loop, so one host round-trip measures K genuine sequential
executions.

Also provides the reference's stage-timer print format
(`[Timing] <stage>: <ms> ms`, cf. Instance_Segmentation_Model/
run_inference_custom.py:187-253) for comparable pipeline logs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def device_time_per_iter(
    fn: Callable,
    perturb_arg: int,
    args: tuple,
    iters: int = 20,
    warmup: bool = True,
) -> float:
    """Median-free simple per-iteration device time of fn(*args).

    Args:
      fn: jittable function; its first output (pytree leaf) must be a
        float array whose value depends on args[perturb_arg].
      perturb_arg: index of a float-array positional arg to perturb.
      args: positional args.
      iters: sequential iterations inside one jitted scan.

    Returns:
      seconds per iteration.
    """

    def chained(args_, n):
        def body(carry, _):
            new_args = list(args_)
            new_args[perturb_arg] = (
                args_[perturb_arg] + 1e-12 * carry
            )
            out = fn(*new_args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.mean(leaf.astype(jnp.float32)), None

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return final

    # The host<->device tunnel costs a large CONSTANT per call (~30ms);
    # difference two run lengths to cancel it: t(n) = C + n*dt.
    n1, n2 = iters, 3 * iters
    jfn1 = jax.jit(lambda a: chained(a, n1))
    jfn2 = jax.jit(lambda a: chained(a, n2))
    if warmup:
        np.asarray(jfn1(args))
        np.asarray(jfn2(args))
    t0 = time.perf_counter()
    np.asarray(jfn1(args))
    t1 = time.perf_counter()
    np.asarray(jfn2(args))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / (n2 - n1)


class StageTimer:
    """Accumulates named stage wall-times; prints in the reference format."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.stages[name] = self.stages.get(name, 0.0) + (
            time.perf_counter() - t0
        )

    def report(self):
        for name, dt in self.stages.items():
            print(f"[Timing] {name}: {dt * 1000:.1f} ms")
        total = sum(self.stages.values())
        print(f"[Timing] total: {total * 1000:.1f} ms")
        return total
