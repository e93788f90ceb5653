"""Checkpoint/resume: a partially-committed run completes via the
left-anti join on committed group ids (SURVEY.md §5 carry-over #4)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # kill/rerun + replay lifecycles; fast lane: -m 'not slow'
from pyspark.sql import functions as F

from parquet_converter_spark import checkpoint as ckpt
from parquet_converter_spark.decode_job import decode_table
from parquet_converter_spark.encode_job import encode_table
from parquet_converter_spark.schema import TRANSCRIPT_SCHEMA
from parquet_converter_spark.synth import synth_pandas
from parquet_converter_spark.tableio import ParquetDirTableIO
from parquet_converter_spark.verify import verify_decode, verify_decode_digest


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
    # stored run_ids carry the per-attempt suffix (replay safety)
    r2_groups = manifest.where(F.col("run_id").startswith("r2~")).count()
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


def test_sigkill_mid_job_then_resume(spark, transcripts, tmp_path_factory):
    """Hard-kill a running encode process (SIGKILL, no cleanup) after it
    has committed some groups, then resume in a fresh session: only the
    uncommitted remainder re-executes and the decode is bit-identical.
    This is the north_rule resumability criterion end-to-end."""
    import os
    import signal
    import subprocess
    import sys
    import time

    out = str(tmp_path_factory.mktemp("sigkill"))
    child_src = f"""
import sys, time
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from parquet_converter_spark.session import get_spark
from parquet_converter_spark.schema import TRANSCRIPT_SCHEMA
from parquet_converter_spark.synth import synth_pandas
from parquet_converter_spark.encode_job import encode_table
from parquet_converter_spark.tableio import ParquetDirTableIO
spark = get_spark(master="local[2]")
spark.sparkContext.setLogLevel("ERROR")
df = spark.createDataFrame(synth_pandas(n_convs=30, seed=7), schema=TRANSCRIPT_SCHEMA)
io = ParquetDirTableIO(spark, {out!r})
for i in range(1000):
    s = encode_table(spark, df, io, run_id=f"batch{{i}}", salt_rows=512,
                     num_buckets=6, max_groups=1)
    if s["groups"] == 0:
        break
    print(f"COMMITTED {{i}}", flush=True)
    time.sleep(0.2)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    committed = 0
    deadline = time.time() + 240
    while committed < 2 and time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        if line.startswith("COMMITTED"):
            committed += 1
    assert committed >= 2, "child never committed two batches"
    os.kill(proc.pid, signal.SIGKILL)  # no atexit, no JVM shutdown hooks
    proc.wait(timeout=30)

    io = ParquetDirTableIO(spark, out)
    done_before = ckpt.completed_groups(io).count()
    assert done_before >= 2

    # resume with the outer (still-healthy) session
    s = encode_table(spark, transcripts_like(spark), io, run_id="resume", salt_rows=512, num_buckets=6)
    manifest = ckpt.read_manifest(io)
    # no group committed twice
    assert manifest.count() == manifest.select("bucket", "salt").distinct().count()
    decoded = decode_table(spark, io)
    result = verify_decode(decoded, transcripts_like(spark))
    assert result["ok"], result


def transcripts_like(spark):
    from parquet_converter_spark.schema import TRANSCRIPT_SCHEMA
    from parquet_converter_spark.synth import synth_pandas

    return spark.createDataFrame(synth_pandas(n_convs=30, seed=7), schema=TRANSCRIPT_SCHEMA)


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


def test_same_run_id_rerun_appends_nothing(spark, transcripts, tmp_path_factory):
    """Re-running a fully-committed run_id must be a true no-op: zero new
    manifest rows (the old bug re-derived the manifest from ALL blocks
    matching run_id, double-counting every group)."""
    out = str(tmp_path_factory.mktemp("samerun"))
    io = ParquetDirTableIO(spark, out)
    encode_table(spark, transcripts, io, run_id="r1", salt_rows=512, num_buckets=6)
    before = ckpt.read_manifest(io).count()
    s2 = encode_table(spark, transcripts, io, run_id="r1", salt_rows=512, num_buckets=6)
    assert s2["groups"] == 0 and s2["rows"] == 0
    assert ckpt.read_manifest(io).count() == before


def test_epoch_replay_after_crash_no_duplicates(spark, transcripts, tmp_path_factory):
    """Streaming-epoch replay: an attempt crashed AFTER its blocks landed
    but BEFORE the manifest commit. The replay (same logical run_id,
    resume_scope='run') must re-encode under a fresh attempt id and the
    crashed attempt's orphan blocks must never become visible."""
    out = str(tmp_path_factory.mktemp("epochreplay"))
    io = ParquetDirTableIO(spark, out)

    # build a donor encode in a scratch dir to obtain realistic block rows
    donor = ParquetDirTableIO(spark, str(tmp_path_factory.mktemp("donor")))
    encode_table(spark, transcripts, donor, run_id="seed", salt_rows=512, num_buckets=6)

    # crashed attempt: every block row landed under epoch_5~<attempt>, no manifest
    orphan = donor.read(ckpt.BLOCKS).withColumn("run_id", F.lit("stream_epoch_5~aaaaaaaa"))
    io.append(orphan, ckpt.BLOCKS, compression="uncompressed")

    # replay of the same logical epoch
    s = encode_table(
        spark, transcripts, io, run_id="stream_epoch_5",
        salt_rows=512, num_buckets=6, resume_scope="run",
    )
    assert s["rows"] == transcripts.count()
    assert s["physical_run_id"].startswith("stream_epoch_5~")
    assert s["physical_run_id"] != "stream_epoch_5~aaaaaaaa"

    # decode sees exactly one copy of every row
    decoded = decode_table(spark, io)
    result = verify_decode(decoded, transcripts)
    assert result["ok"], result


def test_partial_commit_replay_skips_committed_groups(spark, transcripts, tmp_path_factory):
    """Same logical run_id, second attempt after a partial commit: the
    prefix-scoped anti-join skips the committed groups even though the
    attempt suffix differs."""
    out = str(tmp_path_factory.mktemp("partial"))
    io = ParquetDirTableIO(spark, out)
    s1 = encode_table(
        spark, transcripts, io, run_id="ep1", salt_rows=512,
        num_buckets=6, max_groups=3, resume_scope="run",
    )
    s2 = encode_table(
        spark, transcripts, io, run_id="ep1", salt_rows=512,
        num_buckets=6, resume_scope="run",
    )
    assert s1["groups"] == 3
    manifest = ckpt.read_manifest(io)
    assert manifest.count() == manifest.select("bucket", "salt").distinct().count()
    assert s1["rows"] + s2["rows"] == transcripts.count()
    decoded = decode_table(spark, io)
    assert verify_decode_digest(decoded, transcripts)["ok"]  # equality-only: digest mode


def test_run_id_rejects_reserved_separator(spark, transcripts, tmp_path_factory):
    io = ParquetDirTableIO(spark, str(tmp_path_factory.mktemp("badid")))
    with pytest.raises(ValueError, match="~"):
        encode_table(spark, transcripts, io, run_id="bad~id", num_buckets=2)
