"""Bit-identical decode verification (north_rule).

Distributed equality check: inner equi-join decoded vs reference rows
on (conv_id, turn_idx) (SURVEY.md §2.6), then a single aggregate
counting per-column mismatches — null-safe via the <=> operator
(eqNullSafe). Timestamps compare at microsecond precision (Spark's
native timestamp resolution). The whole check is one shuffle + one
agg; nothing is collected but the final counters.

Reference analog: _verify_conversion re-scans the written parquet and
checks shape (/root/reference/parquet_converter/converter.py:658-707);
here the invariant is strengthened to per-value bit-identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .schema import ENCODED_COLUMNS

VALUE_COLUMNS = [c for c in ENCODED_COLUMNS if c not in ("conv_id", "turn_idx")]


def verify_decode(decoded: DataFrame, reference: DataFrame) -> dict:
    """Return {column: mismatch_count} plus row-count deltas."""
    d = decoded.alias("d")
    r = reference.alias("r")
    joined = d.join(r, ["conv_id", "turn_idx"], "inner")
    aggs = [
        F.sum(
            (~F.col(f"d.{c}").eqNullSafe(F.col(f"r.{c}"))).cast("long")
        ).alias(c)
        for c in VALUE_COLUMNS
    ]
    aggs.append(F.count("*").alias("joined_rows"))
    row = joined.agg(*aggs).collect()[0]
    result = {c: int(row[c] or 0) for c in VALUE_COLUMNS}
    result["joined_rows"] = int(row["joined_rows"])
    result["decoded_rows"] = decoded.count()
    result["reference_rows"] = reference.count()
    result["ok"] = (
        all(result[c] == 0 for c in VALUE_COLUMNS)
        and result["joined_rows"] == result["reference_rows"] == result["decoded_rows"]
    )
    return result
