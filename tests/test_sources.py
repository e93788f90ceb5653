"""Source readers (SURVEY.md §2.1): CSV/TXT scans with the reference's
option surface. Fixtures mirror the reference's examples
(FIXTURES.md F2/F3/F4)."""

from __future__ import annotations

import pytest

from parquet_converter_spark.functions import casts
from parquet_converter_spark.sources import readers
from pyspark.sql import functions as F

CSV_F2 = """id,name,age,salary,joined_date,is_active,department
1,John Smith,35,75000.50,2020-01-15,true,Engineering
2,Jane Doe,28,65000.00,2021-03-10,false,Marketing
3,Bob Lee,NA,55000.25,2019-07-01,true,Finance
4,Ann Ray,41,NULL,2018-11-20,false,HR
5,Sam Wu,33,72000.10,2022-05-30,true,Engineering
"""

TXT_F3 = (
    "product_id\tproduct_name\tprice\tstock\n"
    "P001\tWidget\t9.99\t42\n"
    "P002\tGadget\t19.99\t7\n"
    "P003\tDoohickey\tNA\t0\n"
)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("src") / "employees.csv"
    p.write_text(CSV_F2)
    return str(p)


@pytest.fixture(scope="module")
def txt_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("src") / "products.txt"
    p.write_text(TXT_F3)
    return str(p)


def test_csv_roundtrip_shape(spark, csv_path, tmp_path):
    """The reference's core invariant (tests/test_converter.py:79-81):
    convert → parquet → read back, shape and names match."""
    df = readers.read_csv(spark, csv_path)
    out = str(tmp_path / "employees.parquet")
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == 5
    assert back.columns == ["id", "name", "age", "salary", "joined_date", "is_active", "department"]


def test_csv_inference_and_na_tokens(spark, csv_path):
    df = readers.read_csv(spark, csv_path)
    dt = dict(df.dtypes)
    assert dt["id"] in ("int", "bigint")
    assert dt["salary"] == "double"
    # NA → null (reference na_values, config.py:55)
    assert df.where(F.col("age").isNull()).count() == 1
    assert df.where(F.col("salary").isNull()).count() == 1


def test_csv_schema_override_skips_inference(spark, csv_path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.StringType()),
            T.StructField("salary", T.StringType()),
            T.StructField("joined_date", T.StringType()),
            T.StructField("is_active", T.StringType()),
            T.StructField("department", T.StringType()),
        ]
    )
    df = readers.read_csv(spark, csv_path, schema=schema)
    assert dict(df.dtypes)["id"] == "string"  # P3 dtypes override honored


def test_txt_tab_delimited_string_ids_stay_strings(spark, txt_path):
    """FIXTURES.md F3: 'P001' must NOT become an int."""
    df = readers.read_txt(spark, txt_path)
    dt = dict(df.dtypes)
    assert dt["product_id"] == "string"
    assert dt["price"] == "double"
    assert df.count() == 3
    assert df.where(F.col("price").isNull()).count() == 1


def test_cast_battery_on_strings(spark, txt_path):
    df = readers.read_txt(spark, txt_path)
    as_long, as_double = casts.parse_int_or_double(F.col("stock").cast("string"))
    out = df.select(as_long.alias("s_long")).collect()
    assert sorted(r["s_long"] for r in out) == [0, 7, 42]


def test_txt_regex_delimited(spark, tmp_path):
    """S2 pandas-path parity: whitespace-regex-delimited lines
    (reference parser.py:108-151 default sep='\\s+')."""
    p = tmp_path / "spaced.txt"
    p.write_text("id   name    qty\n1  alpha   10\n2    beta  20\n")
    df = readers.read_txt_regex(spark, str(p), pattern=r"\s+")
    rows = sorted((r["id"], r["name"], r["qty"]) for r in df.collect())
    assert rows == [("1", "alpha", "10"), ("2", "beta", "20")]


def test_skip_rows_and_footer(spark, tmp_path):
    """P3: head/tail trims (reference skiprows/skipfooter, parser.py:97-98)."""
    p = tmp_path / "trimmed.csv"
    p.write_text(
        "garbage preamble\n"
        "id,val\n"
        "1,10\n"
        "2,20\n"
        "3,30\n"
        "TOTAL,60\n"
    )
    df = readers.read_csv(spark, str(p), skip_rows=1, skip_footer=1)
    rows = sorted((r["id"], r["val"]) for r in df.collect())
    assert rows == [(1, 10), (2, 20), (3, 30)]
    assert dict(df.dtypes)["id"] in ("int", "bigint")


def test_ignore_errors_drops_malformed(spark, tmp_path):
    """P4: ignore_errors → DROPMALFORMED (reference converter.py:419)."""
    from pyspark.sql import types as T

    p = tmp_path / "bad.csv"
    p.write_text('id,val\n1,10\n"unclosed,20\n3,30\n')
    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("val", T.IntegerType())]
    )
    df = readers.read_csv(spark, str(p), schema=schema, ignore_errors=True)
    ids = sorted(r["id"] for r in df.collect() if r["id"] is not None)
    assert 1 in ids  # good rows survive
    assert df.where(df.val == 20).count() == 0  # malformed row dropped


def test_read_auto_dispatch(spark, csv_path, txt_path):
    assert readers.read_auto(spark, csv_path).count() == 5
    assert readers.read_auto(spark, txt_path).count() == 3
    with pytest.raises(ValueError, match="unsupported"):
        readers.read_auto(spark, "/tmp/file.xlsx")


def test_discover_tables(spark, tmp_path):
    (tmp_path / "a").mkdir()
    import shutil

    src = "/root/testdata/sf0.001/region.parquet"
    shutil.copy(src, tmp_path / "a" / "region.parquet")
    shutil.copy(src, tmp_path / "r2.parquet")
    found = readers.discover_tables(spark, str(tmp_path))
    assert len(found) == 2


def test_txt_regex_header_collision_survives(spark, tmp_path):
    """A body row textually equal to the header must NOT be dropped
    (the old filter removed every line == header)."""
    from parquet_converter_spark.sources.readers import read_txt_regex

    p = tmp_path / "h.txt"
    p.write_text("a b c\n1 2 3\na b c\n4 5 6\n")
    df = read_txt_regex(spark, str(p), pattern=r"\s+")
    rows = [tuple(r) for r in df.collect()]
    assert len(rows) == 3
    assert ("a", "b", "c") in rows  # the colliding body row survives


def test_txt_regex_multifile_drops_every_header(spark, tmp_path):
    from parquet_converter_spark.sources.readers import read_txt_regex

    (tmp_path / "f1.txt").write_text("a b\n1 2\n")
    (tmp_path / "f2.txt").write_text("a b\n3 4\n")
    df = read_txt_regex(spark, str(tmp_path / "*.txt"), pattern=r"\s+")
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [("1", "2"), ("3", "4")]  # both files' headers dropped


def test_skip_footer_rejects_multifile_glob(spark, tmp_path):
    from parquet_converter_spark.sources.readers import read_csv

    (tmp_path / "f1.csv").write_text("a,b\n1,2\nfooter\n")
    (tmp_path / "f2.csv").write_text("a,b\n3,4\nfooter\n")
    with pytest.raises(ValueError, match="per-file"):
        read_csv(spark, str(tmp_path / "*.csv"), skip_footer=1).collect()


def test_sampled_schema_bounded_and_rdd_free(spark, tmp_path):
    import inspect

    from parquet_converter_spark.sources import readers
    from parquet_converter_spark.sources.readers import sampled_schema

    # the probe is a DataFrame program, not an RDD detour
    assert ".rdd" not in inspect.getsource(readers.sampled_schema)

    p = tmp_path / "big.csv"
    lines = ["x,y,z"]
    lines += [f"{i},{i * 1.5},name{i}" for i in range(500)]
    lines += ["oops,not_a_number_only_past_sample,zzz"] * 3
    p.write_text("\n".join(lines) + "\n")
    schema = sampled_schema(spark, str(p), sample_rows=100)
    kinds = {f.name: f.dataType.simpleString() for f in schema.fields}
    # inference saw only the clean prefix: x stays integral, y double
    assert kinds["x"] == "int" and kinds["y"] == "double" and kinds["z"] == "string"


def test_read_jsonl_sampled_inference_and_dispatch(spark, tmp_path):
    """Engine-added JSONL source: bounded-prefix inference, pinned
    schema on the full scan, DROPMALFORMED parity, read_auto dispatch."""
    p = tmp_path / "docs.jsonl"
    lines = [f'{{"doc_id": {i}, "text": "doc number {i}", "score": {i * 0.5}}}' for i in range(50)]
    p.write_text("\n".join(lines) + "\n")

    df = readers.read_jsonl(spark, str(p))
    dt = dict(df.dtypes)
    assert dt["doc_id"] == "bigint" and dt["score"] == "double" and dt["text"] == "string"
    assert df.count() == 50
    assert readers.read_auto(spark, str(p)).count() == 50

    # malformed line: PERMISSIVE yields a null row; DROPMALFORMED drops it
    p2 = tmp_path / "bad.jsonl"
    p2.write_text('{"doc_id": 1, "text": "ok"}\n{broken json\n{"doc_id": 3, "text": "ok"}\n')
    perm = readers.read_jsonl(spark, str(p2), schema=df.schema)
    assert perm.count() == 3
    dropped = readers.read_jsonl(spark, str(p2), schema=df.schema, ignore_errors=True)
    assert dropped.count() == 2
    assert sorted(r["doc_id"] for r in dropped.collect()) == [1, 3]

    # inference saw only the prefix: a type-poisoning line past the
    # sample bound must not change the pinned schema
    p3 = tmp_path / "poison.jsonl"
    p3.write_text("\n".join(lines) + '\n{"doc_id": "not_a_number", "text": "x", "score": 1}\n')
    df3 = readers.read_jsonl(spark, str(p3), sample_rows=50)
    assert dict(df3.dtypes)["doc_id"] == "bigint"
