"""SparkSession factory tuned for this engine.

Local-mode defaults follow the sandbox (local[N], single JVM); on a
real cluster the same builder is driven by spark-submit --conf, and
the settings below remain the right defaults (AQE on, Arrow on,
shuffle partitions sized by the submitter).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "parquet_converter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = master.split("[")[-1].rstrip("]") if "[" in master else "32"
    try:
        n_cores = int(cores) if cores != "*" else (os.cpu_count() or 8)
    except ValueError:
        n_cores = 8
    # 4×cores (floor 64): grouped-map stages place ~one group per reduce
    # partition, so a straggler group never serializes a whole partition
    # of groups; the floor keeps the setting identical across the
    # N-vs-4N scaling comparison.
    shuffle_partitions = shuffle_partitions or max(64, 4 * n_cores)
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches into python workers: bound by BYTES (the direct
        # memory knob, guide §4.2) so fat block rows (up to 65k encoded
        # turns per row) stay bounded while narrow rows (embeddings,
        # transcript turns) still arrive in large vectorization-friendly
        # batches instead of 64-row slivers. Both env-overridable for
        # cluster tuning.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_ROWS", "8192"),
        )
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BYTES", str(32 * 1024 * 1024)),
        )
        # allow shuffled-hash join where the planner's size conditions
        # say a side fits per-partition (guide §3.1/§9): skips the two
        # sorts a sort-merge pays. Tradeoff: SHJ builds an in-memory
        # hash relation from plan-time ESTIMATES — on a cluster where
        # estimates are unreliable (post-UDF sizes, heavy skew) flip
        # SPARK_GRAFT_PREFER_SMJ=true to restore sort-merge's spill
        # safety; the bench workloads' build sides are manifest-sized.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 (Spark's legacy default) carries NO parquet min/max
        # statistics: it silently disabled both the footer-stats span
        # fast path in time-bucketed planning AND row-group pruning on
        # the blocks table's ts_min/ts_max predicate (guide §6: verify
        # pushdown actually reaches the scan). TIMESTAMP_MICROS has
        # stats, round-trips Spark's µs semantics exactly, and matches
        # what pandas/pyarrow (the reference implementation) writes.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # split scans finer than the 128 MB default so a medium input
        # still fans out across every core (one 350 MB table must not
        # become a 3-task map stage on a 32-core runner)
        .config("spark.sql.files.maxPartitionBytes", "16m")
    )
    # local mode: shuffle goes through spark.local.dir — put it on tmpfs
    # when available so 32 concurrent shuffle writers don't serialize on
    # one disk (a real cluster has per-executor NVMe for this)
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        # per-process subdir: concurrent sessions (tests + driver + bench
        # workers) must never race each other's shuffle-file cleanup
        builder = builder.config(
            "spark.local.dir", f"/dev/shm/spark-local/{os.getpid()}"
        )
    return builder.getOrCreate()
