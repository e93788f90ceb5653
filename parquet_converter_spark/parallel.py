"""Scan-parallelism guard for CPU-heavy per-row projections.

A small table usually arrives as ONE parquet file, and a single file
with one row group is one scan split no matter what
``spark.sql.files.maxPartitionBytes`` says — so an expensive projection
chain (shingling + 16 hash functions per shingle, cast batteries,
64-bit vote aggregates) runs on ONE core while 31 idle (guide §2.5
input skew: "one huge unsplittable file").

``fan_out`` repartitions the frame by a deterministic key ONLY when the
scan's split count is materially below the cluster parallelism. At
corpus scale inputs have many files/row groups, the guard sees enough
splits, and this is the identity — no extra shuffle is ever paid where
real parallelism already exists. Hash-partitioning on a real key (not
round-robin) keeps row placement deterministic under task retries
(SPARK-38388 class of bugs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fan_out(df: DataFrame, key_col: str, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` by ``key_col`` to cluster parallelism when its
    current scan would use materially fewer tasks; identity otherwise."""
    sc = df.sparkSession.sparkContext
    target = int(min_parts or sc.defaultParallelism)
    if df.rdd.getNumPartitions() >= max(2, target // 4):
        return df
    return df.repartition(target, F.col(key_col))
