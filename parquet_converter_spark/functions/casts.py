"""Type-cast battery — SURVEY.md §2.3 (C1–C5, C7).

The reference's "expression language" is its dtype-inference casts
(/root/reference/parquet_converter/parser.py:154-268, precedence
datetime → integer → float → boolean → string). Re-expressed as
Catalyst expressions (JVM-side, codegen'd — no Python in the path):

* C1 datetime auto-parse      → try_to_timestamp
* C2 datetime format fallback → coalesce(try_to_timestamp(c, f1), …)
* C3 int/float discrimination → try_cast long, else try_cast double
* C4 boolean token parse      → lower(c) mapped over {true,false,1,0}
* C5 string coercion          → cast("string")
* C7 lowercase                → lower()
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def parse_datetime_auto(c: Column) -> Column:
    """C1 — parser.py:199-208: pd.to_datetime(errors='coerce')."""
    return F.try_to_timestamp(c)


def parse_datetime_formats(c: Column, formats: list[str]) -> Column:
    """C2 — parser.py:211-221: try each configured format, first hit
    wins (reference formats from config.py:109-128)."""
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in formats])


def parse_int_or_double(c: Column) -> tuple[Column, Column]:
    """C3 — parser.py:227-241: numeric parse with int/float
    discrimination. Returns (as_long, as_double); a value is integral
    iff as_long is non-null and equals as_double."""
    return c.try_cast("long"), c.try_cast("double")


def parse_boolean(c: Column) -> Column:
    """C4 — parser.py:243-257: {true,false,1,0} (case-insensitive) →
    nullable boolean."""
    lc = F.lower(c)
    return (
        F.when(lc.isin("true", "1"), F.lit(True))
        .when(lc.isin("false", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def coerce_string(c: Column) -> Column:
    """C5 — parser.py:259-266: residual → string."""
    return c.cast("string")


DEFAULT_DT_FORMATS: list[str] = []  # auto-parse first; configured formats appended


def infer_and_cast(df, sample_rows: int = 100_000, dt_formats: list[str] | None = None):
    """The reference's per-column dtype inference (parser.py:154-268),
    distributed: ONE fused aggregate over a bounded sample counts, for
    every string column, how many non-null values survive each parser
    (timestamp, long, double, boolean); precedence
    datetime → integer → float → boolean → string picks the cast, and
    one final select applies all casts (Catalyst fuses it into the
    scan). Decisions come from the sample; casts apply to everything
    (sample-then-pin, converter.py:453-511 → :573-574).
    """
    from pyspark.sql import functions as F

    str_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    if not str_cols:
        return df
    sample = df.limit(sample_rows)
    aggs = []
    for c in str_cols:
        col = F.col(c)
        ts = parse_datetime_auto(col)
        if dt_formats:
            ts = F.coalesce(ts, parse_datetime_formats(col, dt_formats))
        aggs += [
            F.count(col).alias(f"n_{c}"),
            F.count(ts).alias(f"ts_{c}"),
            F.count(col.try_cast("long")).alias(f"lg_{c}"),
            F.count(col.try_cast("double")).alias(f"db_{c}"),
            F.count(F.when(F.lower(col).isin("true", "false", "1", "0"), 1)).alias(f"bl_{c}"),
        ]
    row = sample.agg(*aggs).collect()[0].asDict()
    exprs = []
    for f in df.schema.fields:
        c = f.name
        if c not in str_cols:
            exprs.append(F.col(c))
            continue
        n = row[f"n_{c}"]
        col = F.col(c)
        if n == 0:
            exprs.append(col)  # all-null stays string (reference keeps object)
        elif row[f"ts_{c}"] == n:
            ts = parse_datetime_auto(col)
            if dt_formats:
                ts = F.coalesce(ts, parse_datetime_formats(col, dt_formats))
            exprs.append(ts.alias(c))
        elif row[f"lg_{c}"] == n:
            exprs.append(col.try_cast("long").alias(c))
        elif row[f"db_{c}"] == n:
            exprs.append(col.try_cast("double").alias(c))
        elif row[f"bl_{c}"] == n:
            exprs.append(parse_boolean(col).alias(c))
        else:
            exprs.append(col)
    return df.select(*exprs)
