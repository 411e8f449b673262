"""Profile the encode kernel WITHOUT Spark: slice the bench fixture
into target_rows-sized part_id groups exactly like assign_partitions
would (hash of repo into small buckets), run make_encode_kernel() over
the first K groups under cProfile, and print the top cumulative-time
functions.  Run: python tools/profile_encode.py [K]
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from deltoid_spark.fixtures import codegen
from deltoid_spark.jobs.pipeline import make_encode_kernel

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8

fixture = codegen.ensure_fixture("bench")
tbl = pq.read_table(fixture)
n = tbl.num_rows
target = max(500, n // 128)
print(f"fixture rows={n} target_rows={target}")

# group rows by repo-hash buckets (assign_partitions analog, pure local)
repo = tbl.column("repo").to_pandas()
codes, _uniq = pd.factorize(repo)
part = (codes % 128).astype(np.int64)
tbl = tbl.append_column("part_id", pa.array(part))

kernel = make_encode_kernel()
order = np.argsort(part, kind="stable")
tbl = tbl.take(pa.array(order))
part_sorted = part[order]
bounds = np.searchsorted(part_sorted, np.arange(129))

groups = []
for g in range(K):
    lo, hi = bounds[g], bounds[g + 1]
    if hi > lo:
        groups.append(tbl.slice(lo, hi - lo).combine_chunks())

raw = sum(
    sum(len(x) for x in gr.column(c).to_pylist() if x is not None)
    for gr in groups
    for c in ("repo", "path", "commit", "lang", "content")
)
print(f"profiling {len(groups)} groups, {sum(g.num_rows for g in groups)} rows, {raw/1e6:.1f} MB raw")

# warm (allocator/page faults are VM noise; see memory: bench-methodology)
kernel(groups[0])

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
for gr in groups:
    kernel(gr)
pr.disable()
wall = time.time() - t0
print(f"wall {wall:.2f}s -> {raw/1e9/wall:.3f} GB/s single-thread")

s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
print(s.getvalue())
