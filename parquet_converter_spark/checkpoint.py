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
TABLE_META = "table_meta"


def read_manifest(io) -> DataFrame:
    if io.exists(MANIFEST):
        return io.read(MANIFEST, MANIFEST_SCHEMA)
    from .localframe import empty_df

    return empty_df(io.spark, MANIFEST_SCHEMA)


def completed_groups(io, run_id: str | None = None) -> DataFrame:
    """Committed groups; with run_id, only THAT logical run's commits
    (used by streaming epochs, where each epoch is a disjoint data
    increment and must not be suppressed by earlier epochs' groups).
    Stored run_ids carry a per-attempt suffix ``~<attempt>``
    (encode_job stamps it for replay safety), so the scope filter
    matches the logical id by prefix — every attempt of this run."""
    m = read_manifest(io).where(F.col("status") == "done")
    if run_id is not None:
        m = m.where(
            (F.col("run_id") == run_id)
            | F.col("run_id").startswith(run_id + "~")
        )
    return m.select("bucket", "salt").distinct()


def pending_groups(io, planned: DataFrame, run_id: str | None = None) -> DataFrame:
    """planned(bucket, salt) minus committed — broadcast the done side
    when small; Catalyst/AQE picks the strategy at scale."""
    done = completed_groups(io, run_id)
    return planned.join(done, ["bucket", "salt"], "left_anti")


def visible_triples(io) -> DataFrame:
    """(bucket, salt, run_id) triples readers may see: committed
    ('done') and not later RETIRED. Retirement is how maintenance
    (compaction, retention) supersedes old physical blocks without
    rewriting history: a 'retired' manifest row for the same triple
    hides it from every reader while the lineage of both the original
    commit and the retirement stays in the manifest. Old tables have
    no retired rows, so this degrades to the plain done-set."""
    m = read_manifest(io)
    done = m.where(F.col("status") == "done").select("bucket", "salt", "run_id").distinct()
    retired = (
        m.where(F.col("status") == "retired").select("bucket", "salt", "run_id").distinct()
    )
    return done.join(retired, ["bucket", "salt", "run_id"], "left_anti")


def committed_blocks(io) -> DataFrame:
    """Blocks visible to readers: semi-join on visible (bucket, salt, run_id)."""
    from .schema import BLOCKS_STORED_SCHEMA  # local import to avoid cycle

    if not io.exists(BLOCKS):
        # a mid-vacuum crash leaves `blocks` momentarily absent with
        # recovery remnants beside it — reading that as an EMPTY table
        # would silently return 0 rows; fail loudly instead (any
        # maintenance entry point repairs it, see recover_vacuum)
        if hasattr(io, "path"):
            import os

            p = io.path(BLOCKS)
            if os.path.isdir(p + "__vacuum") or os.path.isdir(p + "__old"):
                raise RuntimeError(
                    "blocks table missing but vacuum remnants exist — a "
                    "vacuum crashed mid-swap; run "
                    "maintenance.recover_vacuum(io) (or any maintenance "
                    "command) to repair before reading"
                )
        from .localframe import empty_df

        return empty_df(io.spark, BLOCKS_STORED_SCHEMA)
    blocks = io.read(BLOCKS, BLOCKS_STORED_SCHEMA)
    # every visible (bucket, salt, run_id) triple is readable: distinct
    # runs over the same group key are DISJOINT data increments
    # (streaming epochs). Batch-mode double-encoding of a group is
    # prevented upstream by the resume anti-join under the
    # single-writer assumption (Iceberg OCC would enforce it with
    # concurrent writers); orphaned blocks from an uncommitted run
    # remain invisible because their run_id has no manifest row;
    # maintenance-superseded triples are hidden by their 'retired' row.
    return blocks.join(visible_triples(io), ["bucket", "salt", "run_id"], "left_semi")


def prior_geometry(
    io, run_id: str, salt_rows: int, chunk_rows: int, tb_secs: int | None
) -> int | None:
    """num_buckets recorded by a prior attempt of this LOGICAL run with
    identical grouping parameters, or None.

    A resumed run must key groups exactly as the committed manifest
    does, so when a prior attempt's table_meta row matches
    (salt_rows, chunk_rows, time_bucket_secs), its num_buckets is both
    the CORRECT choice (re-planning from a changed row estimate would
    silently misalign the resume anti-join) and the cheap one: reusing
    it skips every planning scan — the row estimate and, for
    time-bucketed runs, the min/max(ts) span scan. Returns None when no
    attempt matches or attempts disagree (caller re-plans)."""
    from .schema import TABLE_META_SCHEMA

    if not io.exists(TABLE_META):
        return None
    m = io.read(TABLE_META, TABLE_META_SCHEMA)
    rows = (
        m.where(
            (F.col("run_id") == run_id) | F.col("run_id").startswith(run_id + "~")
        )
        .where(F.col("salt_rows") == int(salt_rows))
        .where(F.col("chunk_rows") == int(chunk_rows))
        .where(
            F.col("time_bucket_secs").eqNullSafe(
                F.lit(tb_secs).cast("long")
            )
        )
        .select("num_buckets")
        .distinct()
        .limit(2)
        .collect()
    )
    if len(rows) == 1:
        return int(rows[0]["num_buckets"])
    return None


def retire_rows(triples: DataFrame) -> DataFrame:
    """Manifest rows that RETIRE the given (bucket, salt, run_id)
    triples — the single shape used by every maintenance path (keep it
    here so a manifest schema change has one site to update)."""
    return triples.select(
        F.col("run_id").cast("string"),
        F.col("bucket").cast("int"),
        F.col("salt").cast("long"),
        F.lit(0).cast("int").alias("n_chunks"),
        F.lit(0).cast("long").alias("n_rows"),
        F.lit(0).cast("long").alias("encoded_bytes"),
        F.lit("retired").alias("status"),
    )
