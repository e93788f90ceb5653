"""The decode pipeline: committed blocks → reconstructed transcript rows.

``mapInPandas`` over block rows — each block row expands to up to
chunk_rows transcript rows, all decoded with the vectorized numpy
kernels (no per-row Python). Decode is embarrassingly parallel: no
shuffle at all; global order is re-established only where a consumer
asks for it (verification sorts by (conv_id, turn_idx)).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import checkpoint as ckpt
from .codecs.blocks import decode_block
from .schema import ENCODED_COLUMNS, TRANSCRIPT_SCHEMA


def _decode_batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in iterator:
        for _, row in pdf.iterrows():
            cols = {}
            for col in ENCODED_COLUMNS:
                series, _codec = decode_block(bytes(row[f"{col}_blk"]))
                cols[col] = series.reset_index(drop=True)
            yield pd.DataFrame(cols)


def _decode_batches_arrow(iterator):
    """Arrow-native decode: each block row expands to one RecordBatch
    built straight from buffers (pa.Array.from_buffers — no pandas)."""
    import pyarrow as pa

    from .codecs.arrow_blocks import ARROW_TYPES, decode_block_arrow
    from .schema import COLUMN_DTYPES

    for batch in iterator:
        d = batch.to_pydict()
        n_rows = batch.num_rows
        for i in range(n_rows):
            arrays = []
            for col in ENCODED_COLUMNS:
                arr, _codec = decode_block_arrow(bytes(d[f"{col}_blk"][i]))
                if COLUMN_DTYPES[col] == "str":
                    arr = arr.cast(pa.string())
                arrays.append(arr)
            yield pa.RecordBatch.from_arrays(arrays, names=list(ENCODED_COLUMNS))


def decode_table(
    spark: SparkSession,
    io,
    buckets: list[int] | None = None,
    arrow_native: bool = True,
) -> DataFrame:
    """Read committed blocks and reconstruct the transcript DataFrame.

    ``buckets`` selects a subset of hash buckets — the predicate lands
    on the blocks parquet scan (partition-level pushdown), so a
    selective decode of one bucket reads ~1/num_buckets of the data.
    """
    blocks = ckpt.committed_blocks(io)
    if buckets is not None:
        blocks = blocks.where(blocks.bucket.isin([int(b) for b in buckets]))
    blocks = blocks.select(*[f"{c}_blk" for c in ENCODED_COLUMNS])
    if arrow_native:
        return blocks.mapInArrow(_decode_batches_arrow, schema=TRANSCRIPT_SCHEMA)
    return blocks.mapInPandas(_decode_batches, schema=TRANSCRIPT_SCHEMA)
