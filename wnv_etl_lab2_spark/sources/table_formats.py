"""Lakehouse table-format bindings, gated behind import-try.

Delta/Iceberg jars are not on this image's classpath (and MERGE INTO
is emulated relationally in operators/scd.py), so these entry points
probe for the runtime and fail with actionable guidance instead of a
deep Py4J stack. When the jars are present, the same calls work
unchanged — the engine's operators are format-agnostic DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    try:
        import delta  # type: ignore  # noqa: F401

        return True
    except ImportError:
        return False


def iceberg_available(spark: SparkSession) -> bool:
    # py4j resolves missing classes lazily (attribute access returns a
    # JavaPackage without error), so probe with Class.forName
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not delta_available():
        raise NotImplementedError(
            "Delta Lake runtime not on the classpath. Install delta-spark and add "
            "io.delta:delta-spark to spark.jars.packages; then spark.read.format('delta') "
            "works as-is. Until then, Parquet tables + operators/scd.py cover the "
            "upsert/SCD semantics relationally."
        )
    return spark.read.format("delta").load(path)


def write_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not delta_available():
        raise NotImplementedError(
            "Delta Lake runtime not on the classpath (see read_delta for setup)."
        )
    df.write.format("delta").mode(mode).save(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime not on the classpath. Add org.apache.iceberg:iceberg-spark-"
            "runtime and a catalog config (spark.sql.catalog.<name>); then "
            "spark.table('<catalog>.<db>.<table>') works as-is."
        )
    return spark.table(table)
