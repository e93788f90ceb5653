"""IcebergTableIO contract parity vs ParquetDirTableIO.

The iceberg-spark-runtime jar is absent in this sandbox, so the catalog
side is stubbed with an in-memory table map (DataFrame.writeTo patched
at the class level; appends materialize via localCheckpoint to mirror
real write-time semantics). The integration test at the bottom
activates automatically on a session where the jar + catalog conf are
really present.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest
from pyspark.sql import DataFrame, functions as F

from parquet_converter_spark import checkpoint as ckpt, tableio
from parquet_converter_spark.decode_job import decode_table
from parquet_converter_spark.encode_job import encode_table
from parquet_converter_spark.schema import TRANSCRIPT_SCHEMA
from parquet_converter_spark.synth import synth_pandas
from parquet_converter_spark.tableio import (
    IcebergTableIO,
    ParquetDirTableIO,
    namespace_for_root,
    open_tableio,
)
from parquet_converter_spark.verify import verify_decode


class MemCatalog:
    def __init__(self):
        self.tables: dict[str, DataFrame] = {}
        #: ident -> partition column strings recorded at create/replace
        self.partitions: dict[str, list[str]] = {}


class FakeSpark:
    """Proxy that answers catalog calls from the in-memory map and
    delegates everything else to the real session."""

    def __init__(self, real, cat: MemCatalog):
        self._real = real
        self._cat = cat

    def table(self, ident: str) -> DataFrame:
        return self._cat.tables[ident]

    def sql(self, q: str):
        if q.startswith("CREATE NAMESPACE"):
            return None
        if q.startswith("ALTER TABLE"):
            # mirror Iceberg ADD COLUMNS: existing rows read null
            import re

            m = re.match(r"ALTER TABLE (\S+) ADD COLUMNS \((.*)\)", q)
            ident, cols = m.group(1), m.group(2)
            df = self._cat.tables[ident]
            for spec in cols.split(", "):
                name, dtype = spec.split(" ", 1)
                df = df.withColumn(name.strip("`"), F.lit(None).cast(dtype))
            self._cat.tables[ident] = df
            return None
        return self._real.sql(q)

    @property
    def catalog(self):
        return SimpleNamespace(tableExists=lambda i: i in self._cat.tables)

    @property
    def conf(self):
        real_conf = self._real.conf
        return SimpleNamespace(
            get=lambda k, d=None: (
                "org.apache.iceberg.spark.SparkCatalog"
                if k == "spark.sql.catalog.engine_cat"
                else real_conf.get(k, d)
            )
        )

    def __getattr__(self, a):
        return getattr(self._real, a)


@pytest.fixture
def fake_iceberg(spark, monkeypatch):
    cat = MemCatalog()

    class FakeWriter:
        def __init__(self, df, ident):
            self.df, self.ident = df, ident
            self._partition_cols: list[str] = []

        def partitionedBy(self, *cols):
            # mirror the real builder: chainable, remembered until create
            self._partition_cols = [str(c) for c in cols]
            return self

        def append(self):
            new = self.df.localCheckpoint(eager=True)
            cur = cat.tables.get(self.ident)
            cat.tables[self.ident] = new if cur is None else cur.unionByName(new)

        def create(self):
            if self.ident in cat.tables:
                raise ValueError(f"table exists: {self.ident}")
            cat.tables[self.ident] = self.df.localCheckpoint(eager=True)
            cat.partitions[self.ident] = self._partition_cols

        def createOrReplace(self):
            cat.tables[self.ident] = self.df.localCheckpoint(eager=True)
            cat.partitions[self.ident] = self._partition_cols

    monkeypatch.setattr(tableio, "iceberg_available", lambda s: True)
    # PySpark 4 routes df.writeTo through the concrete classic class —
    # patch it there (the pyspark.sql.DataFrame base alone is not enough)
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    for klass in {DataFrame, ClassicDF}:
        monkeypatch.setattr(klass, "writeTo", lambda self, ident: FakeWriter(self, ident))
    return FakeSpark(spark, cat), cat


@pytest.fixture(scope="module")
def transcripts(spark):
    pdf = synth_pandas(n_convs=20, seed=11)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).cache()


def test_open_tableio_requires_catalog_conf(spark, monkeypatch):
    """Jar on the classpath alone must NOT select Iceberg — the session
    has to configure spark.sql.catalog.engine_cat (the old behavior
    picked Iceberg and failed at first read)."""
    monkeypatch.setattr(tableio, "iceberg_available", lambda s: True)
    io = open_tableio(spark, "/tmp/some_root")
    assert isinstance(io, ParquetDirTableIO)


def test_open_tableio_explicit_uri_is_strict(spark):
    with pytest.raises(ValueError):
        open_tableio(spark, "iceberg://only_catalog")
    with pytest.raises(RuntimeError):  # jar absent → explicit ask must fail loudly
        open_tableio(spark, "iceberg://cat/ns")


def test_namespace_for_root_distinct_roots():
    a = namespace_for_root("/data/out_a")
    b = namespace_for_root("/data/out_b")
    same_name = namespace_for_root("/elsewhere/out_a")
    assert a != b
    assert a != same_name  # same basename, different path → different namespace
    assert a == namespace_for_root("/data/out_a/")  # normalization is stable


def test_open_tableio_derives_namespace_from_root(fake_iceberg):
    fspark, _ = fake_iceberg
    io_a = open_tableio(fspark, "/data/out_a")
    io_b = open_tableio(fspark, "/data/out_b")
    assert isinstance(io_a, IcebergTableIO) and isinstance(io_b, IcebergTableIO)
    assert io_a.namespace != io_b.namespace
    assert io_a._ident("blocks") != io_b._ident("blocks")


def test_iceberg_basic_contract(fake_iceberg, transcripts):
    fspark, _ = fake_iceberg
    io = IcebergTableIO(fspark, "engine_cat", "db_test")
    assert not io.exists("t")
    io.append(transcripts.limit(5), "t")
    assert io.exists("t")
    assert io.read("t").count() == 5
    io.append(transcripts.limit(3), "t")
    assert io.read("t").count() == 8  # append accumulates
    io.overwrite(transcripts.limit(2), "t")
    assert io.read("t").count() == 2  # overwrite replaces


def test_iceberg_blocks_table_partitioned_by_bucket(fake_iceberg, transcripts):
    """VERDICT r02 #7: when Iceberg is active, the blocks table must be
    created partitionedBy(bucket) so bucket-selective decode prunes at
    the storage layer; manifest/metrics stay unpartitioned (tiny)."""
    fspark, cat = fake_iceberg
    io = IcebergTableIO(fspark, "engine_cat", "db_part")
    encode_table(
        transcripts.sparkSession, transcripts, io, run_id="r1",
        salt_rows=512, num_buckets=4,
    )
    blocks_ident = io._ident("blocks")
    assert blocks_ident in cat.partitions
    assert any("bucket" in c for c in cat.partitions[blocks_ident]), cat.partitions
    for name in ("manifest", "metrics"):
        ident = io._ident(name)
        if ident in cat.partitions:
            assert cat.partitions[ident] == [], cat.partitions


@pytest.mark.slow
def test_iceberg_encode_resume_decode_parity(fake_iceberg, transcripts, tmp_path):
    """The full engine flow (partial commit → resume → decode → verify)
    must behave identically over Iceberg and parquet-dir tables."""
    fspark, _ = fake_iceberg
    ice = IcebergTableIO(fspark, "engine_cat", "db_parity")
    pq = ParquetDirTableIO(transcripts.sparkSession, str(tmp_path / "pq"))

    results = {}
    for label, io in (("ice", ice), ("pq", pq)):
        s1 = encode_table(
            transcripts.sparkSession, transcripts, io, run_id="r1",
            salt_rows=512, num_buckets=4, max_groups=2,
        )
        s2 = encode_table(
            transcripts.sparkSession, transcripts, io, run_id="r2",
            salt_rows=512, num_buckets=4,
        )
        decoded = decode_table(transcripts.sparkSession, io)
        results[label] = (s1["groups"], s2["groups"], s1["rows"] + s2["rows"],
                          verify_decode(decoded, transcripts)["ok"])

    assert results["ice"] == results["pq"]
    assert results["ice"][3] is True
    # manifest lineage identical shape on both backends
    assert (
        ckpt.read_manifest(ice).select("bucket", "salt").distinct().count()
        == ckpt.read_manifest(pq).select("bucket", "salt").distinct().count()
    )


def _real_iceberg_ready(spark) -> bool:
    return tableio.iceberg_available(spark) and tableio.catalog_configured(
        spark, tableio.DEFAULT_CATALOG
    )


@pytest.mark.skipif(
    "not _real_iceberg_ready(__import__('parquet_converter_spark.session', fromlist=['get_spark']).get_spark(app='pcs-tests', master='local[4]'))",
    reason="iceberg-spark-runtime jar + catalog conf not present",
)
def test_iceberg_real_integration(spark, transcripts):  # pragma: no cover
    io = open_tableio(spark, "/tmp/iceberg_it")
    assert isinstance(io, IcebergTableIO)
    s = encode_table(spark, transcripts, io, run_id="it", salt_rows=512, num_buckets=4)
    decoded = decode_table(spark, io)
    assert verify_decode(decoded, transcripts)["ok"]
    assert s["rows"] == transcripts.count()


def test_iceberg_read_reconciles_missing_zone_map_columns(spark, fake_iceberg):
    """ADVICE r03 (medium): a blocks table written before the zone-map
    columns existed must read with those columns as typed nulls (the
    'legacy reads null = keep' contract), not raise unresolved-column
    on decode's conv_range/ts_range filters."""
    import pyspark.sql.types as T

    fs, cat = fake_iceberg
    io = IcebergTableIO(fs, "engine_cat", "db_legacy")
    legacy = spark.createDataFrame([(1, "x")], "bucket int, payload string")
    cat.tables["engine_cat.db_legacy.blocks"] = legacy

    want = T.StructType([
        T.StructField("bucket", T.IntegerType()),
        T.StructField("payload", T.StringType()),
        T.StructField("ts_min", T.TimestampType()),
        T.StructField("conv_min", T.StringType()),
    ])
    got = io.read("blocks", want)
    assert got.columns == ["bucket", "payload", "ts_min", "conv_min"]
    row = got.collect()[0]
    assert row["bucket"] == 1 and row["ts_min"] is None and row["conv_min"] is None
    assert dict(zip(got.columns, (f.dataType for f in got.schema.fields)))["ts_min"] == T.TimestampType()


def test_iceberg_append_evolves_legacy_schema(spark, fake_iceberg):
    """Appending new-engine rows (with zone-map stats) to a pre-zone-map
    table must ADD the missing columns first (Iceberg schema evolution;
    existing rows read null), not fail on schema mismatch."""
    fs, cat = fake_iceberg
    io = IcebergTableIO(fs, "engine_cat", "db_evo")
    legacy = spark.createDataFrame([(1, "old")], "bucket int, payload string")
    cat.tables["engine_cat.db_evo.blocks"] = legacy

    newrows = spark.createDataFrame(
        [(2, "new", "c0")], "bucket int, payload string, conv_min string"
    )
    io.append(newrows, "blocks")
    got = cat.tables["engine_cat.db_evo.blocks"]
    assert set(got.columns) == {"bucket", "payload", "conv_min"}
    by_bucket = {r["bucket"]: r["conv_min"] for r in got.collect()}
    assert by_bucket == {1: None, 2: "c0"}
