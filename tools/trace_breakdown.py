"""Op-level TPU time breakdown from a jax.profiler perfetto trace.

Usage:
  python tools/trace_breakdown.py            # profiles __graft_entry__.entry()
  python tools/trace_breakdown.py --top 40

Tensorboard is not available in this image; instead we parse the
perfetto trace.json.gz directly and sum "X" (complete) events on the
TPU track pids, grouped by a normalized op name.  This is the method
that proved reliable through the axon tunnel (CLAUDE.md perf notes).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import tempfile


def run_and_trace(iters: int = 30) -> str:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jaxcache"
    )
    from __graft_entry__ import entry

    fn, args = entry()
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)

    tmpdir = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tmpdir, create_perfetto_trace=True)
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return tmpdir


def find_trace(tmpdir: str) -> str:
    paths = glob.glob(
        os.path.join(tmpdir, "**", "*.trace.json.gz"), recursive=True
    ) + glob.glob(os.path.join(tmpdir, "**", "trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {tmpdir}")
    return max(paths, key=os.path.getmtime)


_FUSION_RE = re.compile(r"\.\d+$")


def normalize(name: str) -> str:
    return _FUSION_RE.sub("", name)


def breakdown(trace_path: str, top: int, iters: int):
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # TPU device tracks: process names like "/device:TPU:0" or "TPU:0".
    # The TPU pid carries THREE thread tracks — "XLA Ops", "Steps" and
    # "XLA Modules" — whose spans cover the same wall time; summing all
    # of them triple-counts (the round-4 bs-16 train trace read 1263
    # ms/iter when the real XLA-Ops total was 420).  Keep only the op
    # track.
    tpu_pids = set()
    op_tids = set()
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pname = ev.get("args", {}).get("name", "")
            if "TPU" in pname and "XLA" not in pname:
                tpu_pids.add(ev["pid"])
        elif ev.get("name") == "thread_name":
            if ev.get("args", {}).get("name") == "XLA Ops":
                op_tids.add((ev["pid"], ev.get("tid")))

    per_op = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        if op_tids and (ev["pid"], ev.get("tid")) not in op_tids:
            continue
        dur = ev.get("dur", 0)
        per_op[normalize(ev.get("name", "?"))] += dur
        total += dur
    print(f"TPU total: {total / 1e3:.3f} ms over {iters} iters "
          f"({total / 1e3 / iters:.3f} ms/iter)")
    for name, dur in per_op.most_common(top):
        print(f"{dur / 1e3 / iters:9.4f} ms/iter  {100 * dur / total:5.1f}%  "
              f"{name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trace", help="existing trace.json.gz (skip running)")
    args = ap.parse_args()
    if args.trace:
        breakdown(args.trace, args.top, args.iters)
        return
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    tmpdir = run_and_trace(args.iters)
    trace = find_trace(tmpdir)
    print(f"trace: {trace}")
    breakdown(trace, args.top, args.iters)


if __name__ == "__main__":
    main()
