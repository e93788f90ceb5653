"""Checkpoint/resume: a partially-committed run completes via the
left-anti join on committed group ids (SURVEY.md §5 carry-over #4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_converter_spark import checkpoint as ckpt
from parquet_converter_spark.decode_job import decode_table
from parquet_converter_spark.encode_job import encode_table
from parquet_converter_spark.schema import TRANSCRIPT_SCHEMA
from parquet_converter_spark.synth import synth_pandas
from parquet_converter_spark.tableio import ParquetDirTableIO
from parquet_converter_spark.verify import verify_decode


@pytest.fixture(scope="module")
def transcripts(spark):
    pdf = synth_pandas(n_convs=30, seed=7)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).cache()


def test_resume_completes_remaining_groups(spark, transcripts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume"))
    io = ParquetDirTableIO(spark, out)

    # run 1: commit only 3 groups, then "die"
    s1 = encode_table(
        spark, transcripts, io, run_id="r1",
        salt_rows=512, num_buckets=6, max_groups=3,
    )
    assert s1["groups"] == 3
    done_after_1 = ckpt.completed_groups(io).count()
    assert done_after_1 == 3

    # run 2: resume — must encode ONLY the remaining groups
    s2 = encode_table(
        spark, transcripts, io, run_id="r2", salt_rows=512, num_buckets=6
    )
    manifest = ckpt.read_manifest(io)
    r2_groups = manifest.where(F.col("run_id") == "r2").count()
    total_groups = manifest.count()
    assert r2_groups == total_groups - 3
    assert s1["rows"] + s2["rows"] == transcripts.count()

    # full decode equals the source
    decoded = decode_table(spark, io)
    result = verify_decode(decoded, transcripts)
    assert result["ok"], result


def test_rerun_after_completion_is_a_noop(spark, transcripts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("noop"))
    io = ParquetDirTableIO(spark, out)
    encode_table(spark, transcripts, io, run_id="r1", salt_rows=512, num_buckets=6)
    s2 = encode_table(spark, transcripts, io, run_id="r2", salt_rows=512, num_buckets=6)
    assert s2["groups"] == 0
    assert s2["rows"] == 0


def test_orphaned_uncommitted_blocks_are_invisible(spark, transcripts, tmp_path_factory):
    """Blocks written by a run that never committed its manifest must
    not be double-read: visibility = manifest semi-join."""
    out = str(tmp_path_factory.mktemp("orphan"))
    io = ParquetDirTableIO(spark, out)
    encode_table(spark, transcripts, io, run_id="r1", salt_rows=512, num_buckets=6)

    # simulate a crashed second run: block files landed, manifest did not
    blocks = io.read(ckpt.BLOCKS)
    orphan = blocks.limit(2).withColumn("run_id", F.lit("r_crashed"))
    io.append(orphan, ckpt.BLOCKS, compression="uncompressed")

    decoded = decode_table(spark, io)
    result = verify_decode(decoded, transcripts)
    assert result["ok"], result
