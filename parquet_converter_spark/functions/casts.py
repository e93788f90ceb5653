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
