"""Partitioning & skew handling: conv_id hash buckets + turn_idx salting.

Group key = (bucket, salt) where

    bucket = pmod(xxhash64(conv_id), num_buckets)
    salt   = floor(turn_idx / salt_rows)

Properties that make this hold at 10^12 turns:

* **No pre-pass needed** — unlike a groupBy(conv_id).count() sizing
  pass, the key is a pure column expression, so planning is O(0) and
  the single shuffle is the applyInPandas grouping itself.
* **Skew-proof by construction** — a pathological 10^8-turn
  conversation lands in ceil(len / salt_rows) DIFFERENT groups, so no
  single task serializes a stage (SURVEY.md §7.3 #3). AQE cannot
  rebalance grouped-map UDF groups (SURVEY.md §4), so the salt must —
  and does — bound every group to ≈ salt_rows rows.
* **Run structure preserved** — salting splits on contiguous turn_idx
  ranges, so within a group each conversation's turns stay contiguous
  and sorted → RLE runs and delta chains survive (after the in-UDF
  sort by (conv_id, turn_idx)).
* **Deterministic** — xxhash64 is a fixed Spark builtin; the same
  (table, num_buckets, salt_rows) always produces the same grouping →
  resume anti-joins line up across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALT_ROWS = 65_536


def with_group_keys(
    df: DataFrame, num_buckets: int, salt_rows: int = DEFAULT_SALT_ROWS
) -> DataFrame:
    """Add (bucket, salt) group-key columns. Pure projection, no shuffle."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(num_buckets)).cast("int")
    ).withColumn("salt", (F.col("turn_idx") / F.lit(salt_rows)).cast("long"))


def plan_num_buckets(n_rows: int, salt_rows: int = DEFAULT_SALT_ROWS, parallelism: int = 32) -> int:
    """Target ≈ salt_rows rows per (bucket, salt=0) group, with at least
    2×parallelism buckets so every core has work."""
    return max(2 * parallelism, (n_rows + salt_rows - 1) // salt_rows)


def estimate_input_rows(spark, df: DataFrame) -> int:
    """Planning-only row estimate for bucket sizing — must never pay a
    full scan of a non-parquet source (at 100 TB a CSV count() doubles
    the read). Strategy:

    * parquet scan → ``df.count()`` (footer-metadata count, cheap);
    * file-backed non-parquet scan → total input bytes (filesystem
      metadata) / average line length from a bounded 1k-line probe of
      the first file;
    * in-memory frame (no input files) → ``df.count()`` (already
      materialized, no extra read).

    Bucket counts only set parallel granularity, so ±2× precision is
    fine; exactness is not required and not paid for.
    """
    files = df.inputFiles()
    if not files or all(f.endswith(".parquet") for f in files):
        return df.count()
    jvm = spark._jvm  # noqa: SLF001 — public Hadoop FS API for file sizes
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    total_bytes = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        total_bytes += p.getFileSystem(hconf).getFileStatus(p).getLen()
    probe = (
        spark.read.text(files[0])
        .limit(1024)
        .agg(F.avg(F.length("value")).alias("b"))
        .collect()[0]["b"]
    )
    avg_line = (probe or 100.0) + 1.0  # +1 newline
    # on-disk bytes are COMPRESSED for .gz/.bz2/… while avg_line is
    # measured on decompressed lines — scale by a conservative text
    # ratio. Erring HIGH is safe (more buckets → smaller groups);
    # underestimating is what breaks the salting's memory bound, and
    # repetitive corpora routinely exceed the typical ~8x (zstd on
    # boilerplate web text can hit 15-20x), so the guess is 16x.
    compressed = (".gz", ".bz2", ".zst", ".zstd", ".snappy", ".deflate", ".lz4", ".xz")
    ratio = 16.0 if any(f.endswith(compressed) for f in files) else 1.0
    return max(1, int(total_bytes * ratio / avg_line))
