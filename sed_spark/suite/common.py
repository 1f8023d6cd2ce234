"""Shared helpers for the query/oracle suite."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def fl(x: float) -> str:
    """Exact round-trip literal for a Python float (both Spark SQL and
    DuckDB parse the repr back to the identical double)."""
    return repr(float(x))


def configure(spark: SparkSession) -> None:
    """Make any session (including the driver's) read the testdata:
    TIMESTAMP(NANOS) -> int64, ms timestamps -> TIMESTAMP_NTZ."""
    for k, v in {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    configure(spark)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
