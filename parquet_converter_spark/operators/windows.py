"""Window/analytic operators (SURVEY.md §2.8).

The reference has no window functions; the engine ADDS them as
encoding prerequisites (run detection for RLE, delta chains for FOR).
Exposed here as first-class queryable operators:

* run detection: lag() over (partition, order) → run starts/counts —
  the same computation the RLE codec performs vectorized inside the
  UDF, expressed as a Catalyst window for SQL surface parity;
* top-k per group via row_number (the classic analytic shape).

Scale note: a window over (PARTITION BY k ORDER BY o) is one shuffle
on k plus a per-partition sort — the same cost envelope as the
engine's grouped encode; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def run_counts(
    df: DataFrame, part_col: str, order_cols: list[str], value_col: str
) -> DataFrame:
    """Count value-runs per value: a run starts where lag(value) over
    the (partition, order) window differs (null-safely) from value."""
    w = W.partitionBy(part_col).orderBy(*[F.asc(c) for c in order_cols])
    prev = F.lag(value_col).over(w)
    brk = (~prev.eqNullSafe(F.col(value_col))).cast("long")
    return (
        df.select(F.col(value_col).alias("v"), brk.alias("brk"))
        .groupBy("v")
        .agg(F.sum("brk").alias("n_runs"), F.count("*").alias("n_rows"))
        .orderBy("v")
    )


def topk_per_group(
    df: DataFrame, part_col: str, order_col: str, k: int, tiebreak: str
) -> DataFrame:
    """Top-k rows per group (row_number over desc order, deterministic
    tiebreak)."""
    w = W.partitionBy(part_col).orderBy(F.desc(order_col), F.asc(tiebreak))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def running_totals(
    df: DataFrame, part_col: str, order_cols: list[str], value_col: str
) -> DataFrame:
    """Cumulative sum per partition — the delta-chain shape the ts codec
    exploits, surfaced as an analytic."""
    w = (
        W.partitionBy(part_col)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return df.withColumn("running", F.sum(value_col).over(w))
