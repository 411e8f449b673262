"""Encode-throughput benchmark, one parallelism level per process.

Run as ``python -m deltoid_spark.bench_encode --cores N [--name bench]``;
prints one JSON line.  bench.py spawns this at two core counts to
evidence the north_rule's N -> 4N scaling efficiency with clean JVMs.

Timing covers the encode *action* only (shuffle + kernels + block
write), not session startup or fixture generation — matching how a
cluster job would be measured (input GB / job wall-clock).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time


def run(cores: int, name: str = "bench", target_rows: int | None = None) -> dict:
    from .fixtures import codegen
    from .jobs import encode, metrics_summary
    from .session import get_spark

    fixture = codegen.ensure_fixture(name)
    spark = get_spark(cores=cores, app=f"bench-encode-{cores}", shuffle_partitions=cores * 2)
    df = spark.read.parquet(fixture)
    input_bytes = int(
        df.selectExpr(
            "sum(octet_length(content) + octet_length(repo) + octet_length(path)"
            " + octet_length(commit) + octet_length(lang)) as b"
        ).collect()[0]["b"]
    )
    n_rows = df.count()

    if target_rows is None:
        # ~4 partitions per core for decent load balance at this scale
        target_rows = max(1000, n_rows // (cores * 4))

    out = tempfile.mkdtemp(prefix=f"bench_enc_{cores}_")
    t0 = time.time()
    manifest = encode(spark, df, out, target_rows=target_rows, resume=False)
    wall = time.time() - t0
    summary = metrics_summary(manifest)
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    return {
        "cores": cores,
        "rows": n_rows,
        "input_bytes": input_bytes,
        "enc_bytes": summary["enc_bytes"],
        "ratio": summary["enc_bytes"] / max(1, summary["raw_bytes"]),
        "wall_s": round(wall, 2),
        "gbps": input_bytes / wall / 1e9,
        "partitions": summary["partitions"],
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--name", default="bench")
    ap.add_argument("--target-rows", type=int, default=None)
    args = ap.parse_args()
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    print(json.dumps(run(args.cores, args.name, args.target_rows)))
