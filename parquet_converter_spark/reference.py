"""Reference footprint: what the reference converter would produce.

The reference's entire output for a table is a single snappy parquet
file (/root/reference/parquet_converter/converter.py:324-328 eager,
:577 streaming; default codec snappy, config.py:175). We reproduce
that footprint with Spark's parquet writer and measure its bytes —
the size bar the engine's encoded blocks must beat (BASELINE.json:
"total compressed size ≤ the reference's Parquet footprint").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_reference_parquet(df: DataFrame, path: str, compression: str = "snappy") -> int:
    """Write the snappy-parquet footprint; return total data bytes."""
    df.write.mode("overwrite").option("compression", compression).parquet(path)
    return dir_parquet_bytes(path)


def dir_parquet_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total
