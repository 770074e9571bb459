"""Worker for the 2-process filesystem-merge barrier test.

Usage: python multihost_merge_worker.py <rank> <outdir> <port>
Rank 1 sleeps before writing its shard to force the race the barrier
must close (host 0 otherwise globs a partial shard set).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
outdir = sys.argv[2]
port = sys.argv[3]

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=rank,
)

from sam6d_tpu.pipeline.bop_eval import write_shard_and_merge

if rank == 1:
    time.sleep(3.0)

rows = [{"rank": rank, "payload": rank * 11}]
merged = write_shard_and_merge(
    outdir, rows, prefix="pem_shard", merged_name="merged.json"
)
if rank == 0:
    print(f"MERGED {len(merged)}")
