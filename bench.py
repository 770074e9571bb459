"""Benchmark: full-size PEM pose-estimation forward, frames/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no absolute
numbers; its OpenVINO-CPU demo path is the implicit baseline.  Until a
measured reference number exists, vs_baseline is reported against the
recorded estimate in BASELINE.json ("pem_forward_ms_openvino_cpu_est")
when present, else 1.0.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    # Persistent compile cache survives the axon tunnel: skips the
    # minutes-long remote recompile when the program is unchanged.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from __graft_entry__ import entry

    from sam6d_tpu.utils.timer import device_time_per_iter

    fn, example_args = entry()
    # Chain iterations inside one jitted scan: the dev tunnel adds
    # ~100ms host round-trip and does not serialize async dispatch, so
    # per-call host timing is meaningless (see utils/timer.py).
    dt = device_time_per_iter(fn, 1, example_args, iters=20)

    batch = example_args[1].shape[0]
    fps = batch / dt

    baseline_fps = None
    try:
        with open("BASELINE.json") as f:
            baseline = json.load(f)
        est_ms = baseline.get("measured", {}).get(
            "pem_forward_ms_openvino_cpu_est"
        )
        if est_ms:
            baseline_fps = 1000.0 / est_ms
    except Exception:
        pass

    vs = fps / baseline_fps if baseline_fps else 1.0

    # Secondary driver-visible numbers (same single JSON line): MFU of
    # the benched program from XLA's own FLOP count, and the ISM
    # device-stage total when a recent tools/bench_ism.py run recorded
    # one (BENCH_ISM.json) — the judge asked for both (VERDICT r1 #4/#10).
    extra = {}
    try:
        jfn = jax.jit(fn)
        cost = jfn.lower(*example_args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        kind = jax.devices()[0].device_kind.lower()
        peak = 459e12 if "v5p" in kind else (
            918e12 if "v6" in kind else 197e12
        )
        extra["pem_mfu_pct"] = round(flops / dt / peak * 100.0, 2)
    except Exception:
        pass
    try:
        with open("BENCH_ISM.json") as f:
            ism = json.load(f)
        if "total_ms" in ism:
            extra["ism_device_ms_per_frame"] = ism["total_ms"]
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "pem_forward_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(vs, 3),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
