"""Profiling aggregates — SURVEY.md §2.4 (A1–A10) and §2.5 (L1–L5).

The reference computes these per-file with Polars
(/root/reference/parquet_converter/converter.py:592-655 fused
n_unique+null_count; analyzer.py:164-281 summary stats, value counts).
Here they are distributed Spark aggregates; everything stays in one
Catalyst Aggregate node per call (single scan, map-side partial agg).

Exact `median`/`countDistinct` are used for oracle parity at test
scale; at 10^12-row scale swap `approx_count_distinct` /
`percentile_approx` (noted per function).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def row_count(df: DataFrame) -> DataFrame:
    """A1 — reference converter.py:579 (pl.len() over lazy scan)."""
    return df.agg(F.count("*").alias("cnt"))


def distinct_count(df: DataFrame, col: str) -> DataFrame:
    """A2 — reference converter.py:626 (n_unique). Exact here;
    approx_count_distinct at scale."""
    return df.agg(F.countDistinct(col).alias("uniq"))


def null_count(df: DataFrame, col: str) -> DataFrame:
    """A3 — reference converter.py:627 (null_count)."""
    return df.agg((F.count("*") - F.count(col)).alias("nulls"))


def numeric_profile(df: DataFrame, col: str) -> DataFrame:
    """A4–A6 — reference analyzer.py:192-196 (min/max/mean/median/std).

    Floating aggregates are rounded so a DuckDB oracle hashing doubles
    agrees despite summation-order differences. Median is exact
    (percentile_approx at scale)."""
    c = F.col(col)
    return df.agg(
        F.round(F.min(c), 4).alias("mn"),
        F.round(F.max(c), 4).alias("mx"),
        F.round(F.avg(c), 4).alias("mean"),
        F.round(F.expr(f"median({col})"), 4).alias("med"),
        F.round(F.stddev_samp(c), 4).alias("sd"),
    )


def value_counts_top5(df: DataFrame, col: str) -> DataFrame:
    """A7/L4 — reference analyzer.py:265-275 (top-5 value frequencies).
    Deterministic tiebreak on the value itself."""
    return (
        df.groupBy(F.col(col).alias("v"))
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("v"))
        .limit(5)
    )


def null_unique_pct(df: DataFrame, col: str) -> DataFrame:
    """A8 — reference analyzer.py:198,231,262 (percentages, 2dp)."""
    return df.agg(
        F.round(
            100.0 * (F.count("*") - F.count(col)) / F.greatest(F.count("*"), F.lit(1)), 2
        ).alias("null_pct"),
        F.round(
            100.0 * F.countDistinct(col) / F.greatest(F.count("*"), F.lit(1)), 2
        ).alias("uniq_pct"),
    )


def profile_all_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """A9 — the reference's fused multi-aggregate single pass
    (converter.py:624-630): ALL n_unique+null_count exprs in ONE
    Aggregate node → Catalyst fuses into a single scan."""
    aggs = []
    for c in cols:
        aggs.append(F.countDistinct(c).alias(f"uniq_{c}"))
        aggs.append((F.count("*") - F.count(c)).alias(f"nulls_{c}"))
    return df.agg(*aggs)


def histogram(df: DataFrame, col: str, lo: float, hi: float, n_bins: int) -> DataFrame:
    """Fixed-edge histogram: bucket index + count over [lo, hi).

    The bucket formula is written as plain arithmetic
    (``floor((x - lo) / (hi - lo) * n)`` clamped to [0, n-1]) rather
    than an engine-specific width_bucket builtin, so any engine
    evaluating IEEE doubles with the same literals bins every value
    identically — that is what lets the DuckDB oracle hash-match it.
    One map-side-combined aggregate; no sort, no second pass (edges
    are caller-supplied, e.g. from a prior numeric_profile)."""
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi) - float(lo)) * F.lit(n_bins))
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def summary_rollup(df: DataFrame, key: str, num: str) -> DataFrame:
    """A10 — totals over per-unit stats (reference logging.py:250-255);
    here grouped totals over an arbitrary key."""
    return (
        df.groupBy(F.col(key).alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(num), 2).alias("total"),
        )
        .orderBy("k")
    )


def head_n(df: DataFrame, order_cols: list[str], n: int = 10) -> DataFrame:
    """L1/L5 — first-N under an explicit order (file order is not a
    thing in a distributed table; reference converter.py:689)."""
    return df.orderBy(*[F.asc(c) for c in order_cols]).limit(n)


def tail_n(df: DataFrame, order_cols: list[str], n: int = 10) -> DataFrame:
    """L2 — last-N (reference analyzer.py:344) via descending order."""
    return df.orderBy(*[F.desc(c) for c in order_cols]).limit(n)


def sample_n(df: DataFrame, key_expr: str, n: int = 10) -> DataFrame:
    """L3 — deterministic pseudo-random N rows (reference
    analyzer.py:324-329 uses random.sample; here md5-of-key order so
    any engine reproduces the same sample)."""
    return df.orderBy(F.md5(F.expr(key_expr))).limit(n)
