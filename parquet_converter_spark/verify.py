"""Bit-identical decode verification (north_rule).

Distributed equality check in ONE pass: full-outer equi-join decoded
vs reference on (conv_id, turn_idx) (SURVEY.md §2.6), then a single
aggregate that yields per-column mismatch counters (null-safe <=>),
both row counts, and the join coverage — so the decode pipeline (the
dominant cost) executes exactly once per verify, not once per counter.

Key contract: (conv_id, turn_idx) is unique per side — the engine's
own decode output is unique by construction (encode groups sort on the
key) and the transcript data model guarantees it for the reference.
The same single aggregate DETECTS violations (distinct-key counts) and
fails with explicit duplicate flags rather than mis-counting; inputs
with legitimate duplicate keys should use ``verify_decode_multiset``,
which compares (row → multiplicity) maps and is order/duplication
exact.

Reference analog: _verify_conversion re-scans the written parquet and
checks shape (/root/reference/parquet_converter/converter.py:658-707);
here the invariant is strengthened to per-value bit-identity.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from .schema import ENCODED_COLUMNS

VALUE_COLUMNS = [c for c in ENCODED_COLUMNS if c not in ("conv_id", "turn_idx")]
KEY_COLUMNS = ["conv_id", "turn_idx"]


def verify_decode(decoded: DataFrame, reference: DataFrame) -> dict:
    """Return {column: mismatch_count} plus row counts — one job total."""
    d = decoded.select(*KEY_COLUMNS, *VALUE_COLUMNS).withColumn("_d", F.lit(1))
    r = reference.select(*KEY_COLUMNS, *VALUE_COLUMNS).withColumn("_r", F.lit(1))
    joined = d.alias("d").join(r.alias("r"), KEY_COLUMNS, "full_outer")
    both = F.col("d._d").isNotNull() & F.col("r._r").isNotNull()
    key_struct = F.struct(*[F.col(k) for k in KEY_COLUMNS])
    aggs = [
        F.sum(
            F.when(both & ~F.col(f"d.{c}").eqNullSafe(F.col(f"r.{c}")), 1).otherwise(0)
        ).alias(c)
        for c in VALUE_COLUMNS
    ]
    aggs += [
        F.sum(both.cast("long")).alias("joined_rows"),
        F.sum(F.col("d._d").isNotNull().cast("long")).alias("decoded_rows"),
        F.sum(F.col("r._r").isNotNull().cast("long")).alias("reference_rows"),
        # duplicate-key detection in the same pass: the join output has
        # a repeated key iff EITHER input does (outer rows keep their
        # key; matched dup keys fan out), so ONE countDistinct over all
        # join keys suffices — expand factor 2, not 3
        F.count(F.lit(1)).alias("_rows"),
        F.countDistinct(key_struct).alias("_keys"),
    ]
    row = joined.agg(*aggs).collect()[0]
    result = {c: int(row[c] or 0) for c in VALUE_COLUMNS}
    result["joined_rows"] = int(row["joined_rows"] or 0)
    result["decoded_rows"] = int(row["decoded_rows"] or 0)
    result["reference_rows"] = int(row["reference_rows"] or 0)
    # with duplicate keys the join cross-product inflates BOTH sides'
    # row counters, so the violation is detectable but not attributable
    # to a side in one pass — one flag, and the verify fails loudly
    result["dup_keys"] = int(row["_rows"] or 0) != int(row["_keys"] or 0)
    result["ok"] = (
        all(result[c] == 0 for c in VALUE_COLUMNS)
        and result["joined_rows"] == result["reference_rows"] == result["decoded_rows"]
        and not result["dup_keys"]
    )
    return result


def verify_decode_multiset(decoded: DataFrame, reference: DataFrame) -> dict:
    """Exact multiset equality for inputs whose key may repeat: group
    each side by the FULL row (SQL GROUP BY treats nulls as equal, which
    is the multiset semantics we want), full-outer join on every column
    null-safely, and compare multiplicities. One shuffle per side + one
    join — still a single decode execution."""
    cols = KEY_COLUMNS + VALUE_COLUMNS
    dg = decoded.groupBy(*cols).agg(F.count("*").alias("_nd")).alias("d")
    rg = reference.groupBy(*cols).agg(F.count("*").alias("_nr")).alias("r")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"d.{c}").eqNullSafe(F.col(f"r.{c}")) for c in cols],
    )
    j = dg.join(rg, cond, "full_outer")
    row = j.agg(
        F.sum(
            F.when(
                F.coalesce(F.col("d._nd"), F.lit(0))
                != F.coalesce(F.col("r._nr"), F.lit(0)),
                1,
            ).otherwise(0)
        ).alias("mismatched_rows"),
        F.sum(F.coalesce(F.col("d._nd"), F.lit(0))).alias("decoded_rows"),
        F.sum(F.coalesce(F.col("r._nr"), F.lit(0))).alias("reference_rows"),
    ).collect()[0]
    return {
        "mismatched_rows": int(row["mismatched_rows"] or 0),
        "decoded_rows": int(row["decoded_rows"] or 0),
        "reference_rows": int(row["reference_rows"] or 0),
        "ok": int(row["mismatched_rows"] or 0) == 0
        and int(row["decoded_rows"] or 0) == int(row["reference_rows"] or 0),
    }
