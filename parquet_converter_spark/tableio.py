"""TableIO seam: Iceberg when the runtime jar is present, plain
parquet-dir tables otherwise (SURVEY.md §7.0).

The resume/commit semantics do NOT depend on Iceberg features: the
manifest append is the commit point, and readers only see block files
whose (bucket, salt, run_id) is committed in the manifest — a
snapshot-isolation discipline that works identically on a parquet
directory and on an Iceberg table. On a real cluster with the
iceberg-spark-runtime jar, ``IcebergTableIO`` maps the same calls to
``writeTo(...).append()`` on a catalog table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    # NB: attribute access on spark._jvm returns a JavaPackage for missing
    # classes instead of raising — must resolve via Class.forName.
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class ParquetDirTableIO:
    """Filesystem-table fallback with append + overwrite + exists."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        )

    def read(self, name: str, schema=None) -> DataFrame:
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self.path(name))

    def append(self, df: DataFrame, name: str, compression: str = "uncompressed") -> None:
        # uncompressed by default for the blocks table: the engine's own
        # codecs + zstd wrap ARE the compression; re-snappy-ing binary
        # blocks would blur the measured footprint.
        df.write.mode("append").option("compression", compression).parquet(self.path(name))

    def overwrite(self, df: DataFrame, name: str, compression: str = "snappy") -> None:
        df.write.mode("overwrite").option("compression", compression).parquet(self.path(name))


class IcebergTableIO:
    """Iceberg catalog tables (requires iceberg-spark-runtime on the
    classpath — not present in this sandbox; exercised on a real
    cluster via --packages org.apache.iceberg:iceberg-spark-runtime)."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime jar not on classpath; use ParquetDirTableIO"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._ident(name))

    def read(self, name: str, schema=None) -> DataFrame:
        return self.spark.table(self._ident(name))

    def append(self, df: DataFrame, name: str, compression: str = "uncompressed") -> None:
        df.writeTo(self._ident(name)).append()

    def overwrite(self, df: DataFrame, name: str, compression: str = "snappy") -> None:
        df.writeTo(self._ident(name)).createOrReplace()


def open_tableio(spark: SparkSession, root: str):
    """Pick Iceberg if its runtime is on the classpath, else parquet-dir."""
    if iceberg_available(spark):  # pragma: no cover - jar absent in sandbox
        try:
            return IcebergTableIO(spark, "engine_cat", "db")
        except Exception:
            pass
    return ParquetDirTableIO(spark, root)
