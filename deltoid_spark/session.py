"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip the deltoid_spark package for shipping to executors.

    This is the same artifact a cluster run passes to
    ``spark-submit --py-files``; locally we ``addPyFile`` it so Python
    workers can unpickle the kernels regardless of their cwd.
    """
    import hashlib

    import deltoid_spark

    pkg_dir = os.path.dirname(deltoid_spark.__file__)
    entries = []
    digest = hashlib.sha256()
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.join("deltoid_spark", os.path.relpath(full, pkg_dir))
                data = open(full, "rb").read()
                digest.update(rel.encode())
                digest.update(data)
                entries.append((rel, data))
    # content-hashed name: concurrent sessions with identical source share
    # the artifact; different source never overwrites a zip executors may
    # still be reading (and a squatter's stale file is never reused)
    out = os.path.join(
        tempfile.gettempdir(), f"deltoid_spark_pkg_{digest.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(out):
        fd, tmp = tempfile.mkstemp(dir=tempfile.gettempdir(), suffix=".zip")
        with os.fdopen(fd, "wb") as fh, zipfile.ZipFile(fh, "w", zipfile.ZIP_DEFLATED) as zf:
            for rel, data in entries:
                zf.writestr(rel, data)
        os.replace(tmp, out)
    return out


def get_spark(
    cores: int | None = None,
    app: str = "deltoid-spark",
    shuffle_partitions: int | None = None,
    aqe: bool = True,
) -> SparkSession:
    """local[N] session tuned for the codec engine.

    On a real cluster the same settings ship via spark-submit --conf;
    nothing here is local-mode-specific except the master URL.

    ``aqe=False`` is for the encode job's throughput path: its one
    shuffle has a known, deliberately chosen partition count
    (deterministic part_ids), so AQE's runtime coalescing only removes
    reduce-side parallelism there.  Keep AQE on (default) for joins,
    verify, and ad-hoc queries where it earns its keep.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or None
    master = f"local[{cores}]" if cores else "local[*]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.adaptive.enabled", str(bool(aqe)).lower())
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or (cores or 32)))
        # Arrow is the only JVM<->Python boundary we allow (no per-row Python)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # Input split size (guide §6): the sandbox's parquet inputs are
        # single files whose ~16-22 MB row groups pack into 1-2 splits
        # at the 128m default, capping scan/map parallelism at 1-2 of
        # 32 cores.  16m here means one task per row group locally.
        # SCALE-DEPENDENT: on a real cluster scanning TB-range tables
        # set DS_MAX_PARTITION_BYTES=512m..1g — large sequential splits
        # cut task-scheduling overhead and shuffle block count
        # (guide §2.2/§6); the env knob keeps one code path for both.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("DS_MAX_PARTITION_BYTES", "16m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.addPyFile(package_zip())
    return spark
