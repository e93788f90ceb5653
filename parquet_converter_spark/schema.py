"""Schemas: transcript input, encoded blocks, manifest, metrics.

The transcript schema is fixed by BASELINE.json input_hint (the new
engine needs no inference — contrast with the reference's sampled
schema inference, /root/reference/parquet_converter/converter.py:453-511).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: per-column logical type class used by the codec layer
COLUMN_DTYPES = {
    "conv_id": "str",
    "turn_idx": "int32",
    "role": "str",
    "text": "str",
    "tool": "str",
    "ts": "ts_us",
}

ENCODED_COLUMNS = list(COLUMN_DTYPES)

# one row per (bucket, salt, chunk): framed binary block per column +
# a JSON meta string with per-column codec + byte sizes + ZONE MAPS
# (per-block min/max statistics — nullable so tables written before
# they existed read as null = "unknown, keep"; decode prunes blocks
# on them BEFORE any payload column is read, and because they are
# plain parquet columns the blocks scan also gets parquet row-group
# pruning on the same predicate for free)
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("salt", T.LongType(), False),
        T.StructField("chunk", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        *[
            T.StructField(f"{c}_blk", T.BinaryType(), True)
            for c in ENCODED_COLUMNS
        ],
        T.StructField("meta", T.StringType(), True),
        T.StructField("blk_bytes", T.LongType(), True),
        T.StructField("ts_min", T.TimestampType(), True),
        T.StructField("ts_max", T.TimestampType(), True),
        # null COUNT completes the ts zone map: min/max skip nulls, so
        # "every row in this block is provably < cutoff" additionally
        # needs ts_nulls == 0 (retention_sweep); null on legacy tables
        # = unknown = never provable, the conservative read
        T.StructField("ts_nulls", T.LongType(), True),
        T.StructField("conv_min", T.StringType(), True),
        T.StructField("conv_max", T.StringType(), True),
    ]
)

# blocks as physically stored: BLOCKS_SCHEMA + the writing run's id
BLOCKS_STORED_SCHEMA = T.StructType(
    list(BLOCKS_SCHEMA.fields) + [T.StructField("run_id", T.StringType(), False)]
)

# per-group lineage manifest — the distributed analog of the
# reference's per-file ConversionStats (/root/reference/
# parquet_converter/stats.py:8-50, logging.py:208-217)
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("salt", T.LongType(), False),
        T.StructField("n_chunks", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("encoded_bytes", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

# one row per encode attempt: the partitioning geometry decoders and
# resumes need. Appended BEFORE the manifest commit (encode_job) so a
# crash between the two appends leaves at worst an orphan meta row for
# an invisible run — harmless (it only widens the candidate bucket
# set) — never a visible run without its geometry, which would make
# decode_conversation's bucket pruning silently miss rows.
# time_bucket_secs / ts_lo / ts_hi (nullable, absent on legacy tables)
# record the planned time-clustering geometry so resumes and epoch
# replays reuse it instead of re-scanning min/max(ts).
TABLE_META_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("num_buckets", T.IntegerType(), False),
        T.StructField("salt_rows", T.IntegerType(), False),
        T.StructField("chunk_rows", T.IntegerType(), False),
        T.StructField("format_version", T.IntegerType(), False),
        T.StructField("time_bucket_secs", T.LongType(), True),
        T.StructField("ts_lo", T.TimestampType(), True),
        T.StructField("ts_hi", T.TimestampType(), True),
    ]
)

# per (group, column) codec/size metrics
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("salt", T.LongType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("encoded_bytes", T.LongType(), False),
    ]
)
