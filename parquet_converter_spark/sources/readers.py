"""Sources — SURVEY.md §2.1 (S1–S9): CSV/TXT/parquet scans with the
reference's option surface, re-expressed as Spark readers.

Reference option mapping (/root/reference/parquet_converter):

| reference option (config.py / parser.py)    | Spark reader option |
|---|---|
| csv.delimiter (config.py:53)                | sep |
| csv.header True/None (config.py:54)         | header |
| csv.na_values ["", "NA", "NULL"] (config.py:55) | nullValue + emptyValue |
| csv.skip_rows / skip_footer (parser.py:97-98) | skipRows (header trim) / tail trim via window |
| csv.column_names (parser.py:94)             | explicit schema field names |
| csv.dtypes override (parser.py:190-192)     | .schema(...) (skips inference) |
| txt.delimiter "\\t" (config.py:97)          | sep="\\t" |
| ignore_errors (converter.py:419)            | mode=DROPMALFORMED |
| encoding (converter.py:426-450)             | encoding |
| sample_rows schema inference (converter.py:453-511) | bounded inferSchema via limit-sample, then pinned schema |

The sampled-inference scan (S4) keeps the reference's sample-then-pin
discipline: infer on a bounded prefix, then re-read the full data with
the pinned schema so the big scan never pays inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_NA_VALUES = ["", "NA", "NULL"]  # reference config.py:55


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    column_names: list[str] | None = None,
    schema=None,
    na_values: list[str] | None = None,
    skip_rows: int = 0,
    skip_footer: int = 0,
    encoding: str = "utf-8",
    ignore_errors: bool = False,
    sample_rows: int = 100_000,
    dt_formats: list[str] | None = None,
) -> DataFrame:
    """S1/S3 — CSV scan with the reference's options.

    With an explicit ``schema`` nothing is inferred (reference dtypes
    override, parser.py:190-192); otherwise S4 sampled inference runs
    first and pins the result.
    """
    na = na_values if na_values is not None else DEFAULT_NA_VALUES
    reader = (
        spark.read.option("sep", delimiter)
        .option("header", str(header).lower())
        .option("encoding", encoding)
        .option("nullValue", na[1] if len(na) > 1 else "NA")
    )
    if skip_rows or skip_footer:
        # Spark CSV has no skipRows/skipFooter; emulate via text
        # pre-pass (P3 — header/footer trims are per-FILE semantics,
        # so this path is single-file by construction, like the
        # reference's skiprows/skipfooter, parser.py:97-98)
        return _read_delimited_with_skip(
            spark, path, delimiter, header, column_names, schema, na,
            skip_rows, encoding, skip_footer,
        )
    if ignore_errors:
        reader = reader.option("mode", "DROPMALFORMED")
    if schema is not None:
        # dtypes override: skip inference entirely (parser.py:190-192)
        df = reader.schema(schema).csv(path)
        if column_names:
            df = df.toDF(*column_names)
        return df
    # reference-faithful two-phase read: everything as strings, map the
    # FULL na_values token list to null (Spark's reader takes only one
    # nullValue), then run the C1–C5 inference battery on a bounded
    # sample and pin the casts (parser.py:154-268 distributed).
    df = reader.csv(path)
    for f in df.schema.fields:
        if f.dataType.simpleString() != "string":
            # header-only read may still infer; force strings
            df = df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])
            break
    if column_names:
        df = df.toDF(*column_names)
    tokens = [t for t in na if t != ""]
    df = df.select(
        *[
            F.when((F.col(c) == "") | F.col(c).isin(tokens), None)
            .otherwise(F.col(c))
            .alias(c)
            for c in df.columns
        ]
    )
    from ..functions.casts import infer_and_cast

    return infer_and_cast(df, sample_rows, dt_formats=dt_formats)


def read_txt(
    spark: SparkSession,
    path: str,
    delimiter: str = "\t",
    header: bool = True,
    **kwargs,
) -> DataFrame:
    """S2 — delimited TXT scan (reference default "\\t", config.py:97)."""
    return read_csv(spark, path, delimiter=delimiter, header=header, **kwargs)


def read_txt_regex(
    spark: SparkSession,
    path: str,
    pattern: str = r"\s+",
    column_names: list[str] | None = None,
    header: bool = True,
) -> DataFrame:
    """S2 fallback — regex-delimited lines (reference pandas path uses
    sep="\\s+", parser.py:108-151): line scan + split. All values come
    out as strings; feed through functions.casts for typing.

    Header removal is POSITIONAL and per-file: the lines are read
    through Spark's CSV reader (quote handling off, a non-occurring
    separator) whose header=true drops the first line of EVERY file by
    file offset — so a body row whose text equals the header survives,
    and multi-file globs lose each file's own header, not just one.
    (Blank lines are skipped by the CSV line reader, and any literal
    \\x01 byte in a line truncates it at that byte under the pinned
    1-column schema — both acceptable for a whitespace-delimited text
    format, and the schema pin means such a line degrades to a short
    row instead of crashing the whole read on column arity.)"""
    import re

    if header:
        first = spark.read.text(path).limit(1).collect()[0][0]
        names = column_names or re.split(pattern, first.strip())
        body = (
            spark.read.option("header", "true")
            .option("sep", "\x01")      # never occurs in normal text lines
            .option("quote", "")        # verbatim lines, no quote stripping
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .schema("value string")     # pinned 1-col: a stray \x01 must not
            .csv(path)                  # raise a toDF arity error
        )
    else:
        names = column_names or []
        body = spark.read.text(path)
        if not names:
            first = spark.read.text(path).limit(1).collect()[0][0]
            names = [f"col{i}" for i in range(len(re.split(pattern, first.strip())))]
    parts = F.split(F.col("value"), pattern)
    return body.select(
        *[F.trim(parts.getItem(i)).alias(n) for i, n in enumerate(names)]
    )


def _read_delimited_with_skip(
    spark, path, delimiter, header, column_names, schema, na,
    skip_rows, encoding, skip_footer: int = 0,
) -> DataFrame:
    """P3 head/tail row trimming: indexed text pre-pass, then the same
    two-phase typed parse as read_csv.

    Head/footer trims are per-FILE semantics (reference
    parser.py:97-98), so this path ENFORCES single-file input (a
    multi-file glob raises — trimming N heads/tails across files is
    undefined) and reads that file as one partition so the line index
    is read order by contract, not split-packing luck. A >16MB skip
    file serializes through one task — the price of per-file positional
    semantics, same as the reference's single-process read."""
    import re as _re

    from pyspark.sql.window import Window

    lines = spark.read.text(path)
    # multi-file guard from PLAN-TIME file resolution (inputFiles reads
    # the listing, not the data) — no counting pre-pass over the file
    files = lines.inputFiles()
    if len(files) > 1:
        raise ValueError(
            f"skip_rows/skip_footer are per-file semantics; {path!r} matched "
            f"{len(files)} files — point at a single file"
        )
    w = Window.orderBy("_idx")
    # footer bound via a full-frame window count in the SAME pass as
    # the indexed read (the frame is already one partition by contract,
    # so the global window adds no shuffle) — the old separate count
    # job scanned the file twice
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    idxed = (
        lines
        .coalesce(1)  # single partition → monotonic id == line order
        .withColumn("_idx", F.monotonically_increasing_id())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(w_all))
    )
    lo = skip_rows + (1 if header else 0)
    names = column_names
    if header and names is None:
        hdr = idxed.where(F.col("_rn") == skip_rows + 1).collect()
        names = [h.strip() for h in hdr[0]["value"].split(delimiter)] if hdr else []
    parts = F.split(F.col("value"), _re.escape(delimiter))
    body = idxed.where(
        (F.col("_rn") > lo) & (F.col("_rn") <= F.col("_n") - skip_footer)
    )
    out = body.select(
        *[parts.getItem(i).alias(n) for i, n in enumerate(names or [])]
    )
    tokens = [t for t in na if t != ""]
    out = out.select(
        *[
            F.when((F.col(c) == "") | F.col(c).isin(tokens), None)
            .otherwise(F.col(c))
            .alias(c)
            for c in out.columns
        ]
    )
    if schema is not None:
        out = out.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        return out
    from ..functions.casts import infer_and_cast

    return infer_and_cast(out)


#: driver-memory cap for schema-inference samples: a 100k-ROW bound
#: alone is not a BYTE bound when each line is a multi-KB document
DEFAULT_SAMPLE_BYTES = 64 << 20


def _bounded_head_lines(
    spark: SparkSession, path: str, max_rows: int, max_bytes: int = DEFAULT_SAMPLE_BYTES
) -> list[str]:
    """First ``max_rows`` text lines, additionally capped at ``max_bytes``
    of driver memory. ``toLocalIterator`` streams partitions one at a
    time, so the driver never holds more than the cap plus one partition
    in flight — the row cap alone would be multi-GB on a corpus of
    tens-of-KB JSON documents."""
    lines: list[str] = []
    total = 0
    for r in spark.read.text(path).limit(max_rows).toLocalIterator():
        v = r[0]
        lines.append(v)
        total += len(v) + 1
        if total >= max_bytes:
            break
    return lines


def sampled_schema(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    encoding: str = "utf-8",
    sample_rows: int = 100_000,
    null_value: str = "NA",
):
    """S4 — sampled schema inference: infer on a bounded prefix, return
    the schema for pinning (reference converter.py:453-511 → :573-574).

    Spark's inferSchema reads the whole file; this keeps the
    reference's bounded-sample discipline: the first ``sample_rows``
    lines (an early-stopping limit over the text scan) are collected to
    the driver — bounded by construction — and redistributed via
    ``parallelize`` for CSV inference on the prefix only. No temp
    filesystem involved, so this works identically in local mode and on
    a cluster (a scratch-file variant would land on whichever node runs
    the write task). The collected dataset is a bounded SAMPLE, not a
    row-wise RDD compute detour.

    Known limit (documented): records with QUOTED EMBEDDED NEWLINES
    span text lines, so the prefix may cut one mid-record — pass an
    explicit schema (or use the multiLine full read) for such files,
    exactly as the reference requires pandas ``engine='python'`` there.
    """
    head = sample_rows + (1 if header else 0)
    lines = _bounded_head_lines(spark, path, head)
    probe = (
        spark.read.option("sep", delimiter)
        .option("header", str(header).lower())
        .option("nullValue", null_value)
        .option("inferSchema", "true")
        .csv(spark.sparkContext.parallelize(lines, 2))
    )
    return probe.schema


def read_auto(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Extension-dispatched read (reference: suffix → csv/txt options,
    converter.py:360-388; unsupported extension is an error, matching
    convert_file's error stats for unknown suffixes)."""
    lower = path.lower()
    if lower.endswith(".csv"):
        return read_csv(spark, path, **kwargs)
    if lower.endswith(".txt"):
        return read_txt(spark, path, **kwargs)
    if lower.endswith((".jsonl", ".json", ".ndjson")):
        return read_jsonl(
            spark, path,
            schema=kwargs.get("schema"),
            ignore_errors=kwargs.get("ignore_errors", False),
        )
    if lower.endswith(".parquet"):
        return read_parquet(spark, path, schema=kwargs.get("schema"))
    raise ValueError(f"unsupported file extension: {path}")


def read_parquet(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S5/S6 — parquet scan (lazy by construction in Spark)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def discover_tables(spark: SparkSession, root: str, extension: str = "parquet") -> list[str]:
    """S9 — file discovery (reference: glob per dir converter.py:154-161,
    recursive os.walk analyzer.py:72-106). Spark path globs subsume
    this; returned as paths for per-table iteration in analyzer mode."""
    import os

    found = []
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(f".{extension}"):
                found.append(os.path.join(dirpath, f))
    return found


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
    sample_rows: int = 100_000,
    ignore_errors: bool = False,
) -> DataFrame:
    """Engine-added JSONL scan (the reference is CSV/TXT-only, but LLM
    document corpora are predominantly JSON-lines). Same sample-then-pin
    discipline as the CSV path: with no explicit ``schema``, inference
    runs over a bounded prefix only — never the full source — and the
    full scan re-reads with the pinned schema (Spark's own inferSchema
    would read everything).

    ``ignore_errors`` maps to DROPMALFORMED (P4 parity); default is
    PERMISSIVE-with-pinned-schema, where malformed lines surface as
    all-null rows rather than killing the job.
    """
    if schema is None:
        head = _bounded_head_lines(spark, path, sample_rows)
        schema = spark.read.json(spark.sparkContext.parallelize(head, 2)).schema
    reader = spark.read.schema(schema)
    if ignore_errors:
        reader = reader.option("mode", "DROPMALFORMED")
    return reader.json(path)
