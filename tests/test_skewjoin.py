"""Skew-guarded bucket self-join (VERDICT r02 next-round #1).

The LSH candidate joins must not go quadratic inside one task when a
corpus concentrates duplicates into a single bucket. These tests prove
(a) the chunked decomposition emits exactly the all-pairs set a plain
self-join would, and (b) on a single-cluster corpus the work is split
across many join key groups, each bounded at chunk_size² pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_converter_spark.operators import dedup, similarity
from parquet_converter_spark.operators.skewjoin import (
    _chunked_pairs_frame,
    bounded_self_join,
    oversized_buckets,
)


def _naive_pairs(rows):
    """Reference all-pairs within buckets: set of (a, b), a < b."""
    by_bucket = {}
    for rid, bucket in rows:
        by_bucket.setdefault(bucket, []).append(rid)
    out = set()
    for members in by_bucket.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                out.add((ms[i], ms[j]))
    return out


def test_bounded_self_join_matches_naive_all_pairs(spark):
    """Mixed bucket sizes (1, 2, 7, 40) across chunk boundaries: the
    chunked join's pair set equals the naive quadratic join's."""
    rows = (
        [(i, 0) for i in range(40)]
        + [(100 + i, 1) for i in range(7)]
        + [(200, 2), (201, 2)]
        + [(300, 3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, bucket int")
    got = {
        (r["a_doc_id"], r["b_doc_id"])
        for r in bounded_self_join(df, ["bucket"], "doc_id", chunk_size=8).collect()
    }
    assert got == _naive_pairs(rows)


def test_hot_bucket_work_is_bounded_per_key_group(spark):
    """A 1,000-member single-bucket cluster (the mega-duplicate shape)
    must split into many independent join key groups, each holding at
    most chunk_size² pairs — no task's work depends on bucket size."""
    n, chunk = 1000, 100
    df = spark.createDataFrame([(i, 7) for i in range(n)], "doc_id long, bucket int")
    frame = _chunked_pairs_frame(df, ["bucket"], "doc_id", chunk_size=chunk)
    per_group = (
        frame.groupBy("bucket", "_ca", "_cb").agg(F.count("*").alias("pairs")).collect()
    )
    nck = (n + chunk - 1) // chunk
    assert len(per_group) == nck * (nck + 1) // 2  # 55 independent key groups
    assert max(r["pairs"] for r in per_group) <= chunk * chunk
    assert sum(r["pairs"] for r in per_group) == n * (n - 1) // 2  # nothing lost


def test_bounded_self_join_cap_and_report(spark):
    """max_bucket_size drops oversized buckets from pairing; the drop is
    inspectable (never silent) via oversized_buckets."""
    rows = [(i, 0) for i in range(50)] + [(100, 1), (101, 1)]
    df = spark.createDataFrame(rows, "doc_id long, bucket int")
    pairs = bounded_self_join(
        df, ["bucket"], "doc_id", chunk_size=8, max_bucket_size=10
    ).collect()
    assert {(r["a_doc_id"], r["b_doc_id"]) for r in pairs} == {(100, 101)}
    dropped = oversized_buckets(df, ["bucket"], 10).collect()
    assert [(r["bucket"], r["bucket_size"]) for r in dropped] == [(0, 50)]


def test_bounded_self_join_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 0)], "doc_id long, bucket int")
    with pytest.raises(ValueError, match="chunk_size"):
        bounded_self_join(df, ["bucket"], "doc_id", chunk_size=1)
    with pytest.raises(ValueError, match="id_col"):
        bounded_self_join(df, ["bucket"], "bucket")


def test_lsh_candidate_pairs_unchanged_by_chunking(spark):
    """The graded minhash path: pair set identical for any chunk size,
    including one small enough to split the duplicate cluster."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(30)]
        + [(100 + i, f"unique text number {i} with words {i * 7}") for i in range(10)],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs, num_hashes=16)
    big = {
        (r["a_id"], r["b_id"])
        for r in dedup.lsh_candidate_pairs(sigs, chunk_size=4096).collect()
    }
    small = {
        (r["a_id"], r["b_id"])
        for r in dedup.lsh_candidate_pairs(sigs, chunk_size=4).collect()
    }
    assert big == small
    # the 30 identical docs must all be candidates of each other
    dup_ids = list(range(30))
    expected_core = {(a, b) for a in dup_ids for b in dup_ids if a < b}
    assert expected_core <= big


def test_lsh_near_dup_pairs_unchanged_by_chunking(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    base = rng.standard_normal(16)
    rows = [
        (i, (base + 0.01 * rng.standard_normal(16)).astype("float32").tolist())
        for i in range(25)
    ] + [(100 + i, rng.standard_normal(16).astype("float32").tolist()) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(threshold=0.9, dim=16, planes_per_band=4, bands=2)
    big = {
        (r["a_id"], r["b_id"])
        for r in similarity.lsh_near_dup_pairs(df, chunk_size=4096, **kw).collect()
    }
    small = {
        (r["a_id"], r["b_id"])
        for r in similarity.lsh_near_dup_pairs(df, chunk_size=3, **kw).collect()
    }
    assert big == small
    clones = list(range(25))
    assert {(a, b) for a in clones for b in clones if a < b} <= big
