"""Deterministic sampling, mixing, and split operators.

Training-data pipelines mix corpora by stratum (language, quality
band, source) at per-stratum rates, and carve reproducible
train/val/test splits. Everything here is a pure HASH PREDICATE on a
key column — md5(key)'s first 8 hex digits read as a uniform [0,1)
variate — so membership is:

* deterministic and replayable (a pure function of the key),
* partitioning- and cluster-size-independent,
* engine-independent (DuckDB computes the identical md5, so these are
  oracle-checkable, unlike seeded RNG sampling),
* shuffle-free — the predicate pushes into the scan like any filter.

Thresholds are compared as FIXED-WIDTH LOWERCASE HEX STRINGS, not
floats: both engines compare the same 8-char string against the same
literal, so there is no float-rounding seam between Spark and the
oracle.

Reference lineage: the reference has no sampling beyond head-N
(parser.py nrows); these are the corpus-scale primitives its users
would need next.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _hex_threshold(fraction: float) -> str:
    """fraction in [0,1] → 8-hex-digit string T such that
    P[md5_prefix < T] == fraction (up to 1/2^32 granularity)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g"  # every 8-hex-digit string sorts before "g"
    return format(int(fraction * 2**32), "08x")


def _md5_prefix(key_col: str) -> Column:
    return F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Uniform deterministic sample: keep rows whose md5(key) prefix
    falls below the fraction threshold."""
    return df.where(_md5_prefix(key_col) < F.lit(_hex_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
) -> DataFrame:
    """Per-stratum deterministic sampling — the dataset-mixing
    primitive: e.g. keep 100% of 'en', 25% of 'de', 0% of everything
    else. Strata absent from ``rates`` are dropped (rate 0)."""
    if not rates:
        raise ValueError("rates must name at least one stratum")
    prefix = _md5_prefix(key_col)
    cond = None
    for stratum, rate in rates.items():
        c = (F.col(stratum_col) == stratum) & (prefix < F.lit(_hex_threshold(rate)))
        cond = c if cond is None else cond | c
    return df.where(cond)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Reproducible disjoint splits (train/val/test): the [0,1) hash
    line is cut into consecutive intervals sized by ``fractions`` (in
    the given dict order); each row gets the label of its interval.
    Fractions must sum to ≤ 1; any remainder is labeled null (use it
    for held-out data). Same key ⇒ same split on any run, any engine,
    any cluster size — the property that keeps eval sets leak-free
    across pipeline re-runs."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    prefix = _md5_prefix(key_col)
    expr = None
    lo = 0.0
    for label, frac in fractions.items():
        # clamp: float accumulation can push the running total into
        # (1.0, 1+1e-9] past the tolerance check above, and
        # _hex_threshold rejects > 1.0
        hi = min(lo + frac, 1.0)
        c = (prefix >= F.lit(_hex_threshold(lo))) & (prefix < F.lit(_hex_threshold(hi)))
        expr = F.when(c, label) if expr is None else expr.when(c, label)
        lo = hi
    return df.withColumn(split_col, expr)
