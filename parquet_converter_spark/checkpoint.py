"""Checkpoint / lineage: manifest table + resume anti-join.

The manifest is the distributed analog of the reference's per-file
ConversionStats + JSON report (/root/reference/parquet_converter/
stats.py:8-50, logging.py:172-224): one row per completed (bucket,
salt) group, appended AFTER that run's block files land. A killed job
re-plans its group list and drops completed groups with a LEFT ANTI
join (SURVEY.md §2.6 — the one join the engine requires), so only
unfinished work re-executes; orphaned block files from an uncommitted
run are invisible to readers because the decode path semi-joins blocks
against the manifest on (bucket, salt, run_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .schema import MANIFEST_SCHEMA

MANIFEST = "manifest"
BLOCKS = "blocks"
METRICS = "metrics"


def read_manifest(io) -> DataFrame:
    if io.exists(MANIFEST):
        return io.read(MANIFEST, MANIFEST_SCHEMA)
    return io.spark.createDataFrame([], MANIFEST_SCHEMA)


def completed_groups(io) -> DataFrame:
    return (
        read_manifest(io)
        .where(F.col("status") == "done")
        .select("bucket", "salt")
        .distinct()
    )


def pending_groups(io, planned: DataFrame) -> DataFrame:
    """planned(bucket, salt) minus committed — broadcast the done side
    when small; Catalyst/AQE picks the strategy at scale."""
    done = completed_groups(io)
    return planned.join(done, ["bucket", "salt"], "left_anti")


def committed_blocks(io) -> DataFrame:
    """Blocks visible to readers: semi-join on committed (bucket, salt, run_id)."""
    from .schema import BLOCKS_STORED_SCHEMA  # local import to avoid cycle

    blocks = io.read(BLOCKS, BLOCKS_STORED_SCHEMA)
    # exactly one committed run per group (max run_id wins) so a rerun
    # that re-encoded a group can never be double-read
    done = (
        read_manifest(io)
        .where(F.col("status") == "done")
        .groupBy("bucket", "salt")
        .agg(F.max("run_id").alias("run_id"))
    )
    return blocks.join(done, ["bucket", "salt", "run_id"], "left_semi")
