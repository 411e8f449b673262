"""Profile the decode kernel WITHOUT Spark: encode the bench fixture's
first K repo-hash groups locally (same slicing as profile_encode), then
cProfile the decode kernel over the resulting block frames.
Run: python tools/profile_decode.py [K]
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
from deltoid_spark.jobs.pipeline import _decode_partition, make_encode_kernel

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8

fixture = codegen.ensure_fixture("bench")
tbl = pq.read_table(fixture)
repo = tbl.column("repo").to_pandas()
codes, _ = pd.factorize(repo)
part = (codes % 128).astype(np.int64)
tbl = tbl.append_column("part_id", pa.array(part))
order = np.argsort(part, kind="stable")
tbl = tbl.take(pa.array(order))
part_sorted = part[order]
bounds = np.searchsorted(part_sorted, np.arange(129))

kernel = make_encode_kernel()
frames = []
for g in range(K):
    lo, hi = bounds[g], bounds[g + 1]
    if hi > lo:
        frames.append(kernel(tbl.slice(lo, hi - lo).combine_chunks()).to_pandas())

raw = int(sum(f["raw_bytes"].sum() for f in frames))
print(f"decoding {len(frames)} block frames, {raw/1e6:.1f} MB raw")

_decode_partition(frames[0])  # warm

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
for f in frames:
    _decode_partition(f)
pr.disable()
wall = time.time() - t0
print(f"wall {wall:.2f}s -> {raw/1e9/wall:.3f} GB/s single-thread")

s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
print(s.getvalue())
