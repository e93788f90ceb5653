"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns next to typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The image/audio libraries are
NOT in this container, so the decode kernels are STUBBED — either a
clearly-marked NotImplementedError or a deterministic fake — while the
Spark-side plumbing (schema, partitioning, UDF signatures, batch
shapes) is real and tested.

Scale notes: payload columns dominate bytes, so every stage projects
only what it needs (metadata-only ops never touch the binary column —
parquet column pruning makes that free), and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of 10 MB
payloads cannot blow a worker.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


#: payload alphabet: printable ASCII minus the three characters
#: DuckDB's BLOB→VARCHAR cast escapes (" ' \) — this keeps the column
#: BINARY-typed end to end (the real multimodal contract) while making
#: sha256-over-payload expressible in the DuckDB oracle
#: (sha256(CAST(payload AS VARCHAR)) == hashlib.sha256(raw bytes))
_PAYLOAD_ALPHABET = np.array(
    [c for c in range(32, 127) if c not in (34, 39, 92)], dtype=np.uint8
)


def _media_row(mid: int, seed: int) -> dict:
    """One deterministic media row — shared by the in-Spark generator
    and the driver-side parquet fixture writer so both produce
    byte-identical tables."""
    rng = np.random.default_rng(seed * 7919 + int(mid))
    kind = ["image", "audio", "video"][int(mid) % 3]
    size = int(rng.integers(1_000, 50_000))
    return {
        "media_id": int(mid),
        "kind": kind,
        "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        "width": int(rng.integers(16, 4096)) if kind != "audio" else None,
        "height": int(rng.integers(16, 4096)) if kind != "audio" else None,
        "duration_ms": int(rng.integers(100, 600_000)) if kind != "image" else None,
        "payload": _PAYLOAD_ALPHABET[
            rng.integers(0, len(_PAYLOAD_ALPHABET), size)
        ].tobytes(),
    }


def synth_media(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads from a seeded RNG)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame([_media_row(int(mid), seed) for mid in pdf["id"]])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


#: bump when _media_row's recipe changes (see ensure_media_fixture)
_FIXTURE_VERSION = 1


def ensure_media_fixture(n: int = 120, seed: int = 42, path: str | None = None) -> str:
    """Materialize the synthetic media table ONCE as a parquet file
    both engines read — Spark for the driver queries, DuckDB for the
    oracle (making ``media_stats``/``media_features`` hash-checkable
    instead of rows-only). Pure pyarrow (no SparkSession needed, so
    ``oracle_sql`` can call it too); atomic rename so concurrent
    callers can't observe a half-written file. Returns the path."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    # _FIXTURE_VERSION is part of the cache filename: bump it on ANY
    # change to _media_row's generation recipe, or machines with a
    # pre-existing /tmp fixture would silently serve stale contents
    # (Spark and DuckDB would still agree with each other, hiding the
    # drift behind a green oracle while hashes diverge across machines)
    path = path or os.path.join(
        tempfile.gettempdir(),
        f"pcs_media_fixture_v{_FIXTURE_VERSION}_{n}_{seed}.parquet",
    )
    if os.path.isfile(path):
        return path
    rows = [_media_row(i, seed) for i in range(n)]
    table = pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
            "kind": pa.array([r["kind"] for r in rows], pa.string()),
            "mime": pa.array([r["mime"] for r in rows], pa.string()),
            "width": pa.array([r["width"] for r in rows], pa.int32()),
            "height": pa.array([r["height"] for r in rows], pa.int32()),
            "duration_ms": pa.array([r["duration_ms"] for r in rows], pa.int32()),
            "payload": pa.array([r["payload"] for r in rows], pa.binary()),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real impl: PIL.Image.open(io.BytesIO(payload)) → ndarray.
    The imaging libraries are not in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this container; "
        "plumbing is exercised via extract_features' deterministic fake"
    )


def extract_features(df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    The 'feature' is a deterministic fake (seeded from the payload's
    sha256) standing in for a real decode→embed kernel; the Arrow batch
    shape, projection, and output schema are the real contract."""

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                digest = hashlib.sha256(b).hexdigest()
                rng = np.random.default_rng(int(digest[:12], 16))
                out.append(
                    {
                        "media_id": int(mid),
                        "payload_bytes": len(b),
                        "sha256": digest,
                        "feature": rng.standard_normal(feat_dim).astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(feats, schema=FEATURE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never touches the payload column, so
    the parquet scan prunes it (cheap at any scale)."""
    return (
        df.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.avg("width").alias("avg_w"),
            F.avg("duration_ms").alias("avg_ms"),
        )
        .orderBy("kind")
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for videos: one output row per planned frame
    (metadata-only; the actual frame grab is the stubbed decode)."""
    vids = df.where(F.col("kind") == "video").select("media_id", "duration_ms")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
