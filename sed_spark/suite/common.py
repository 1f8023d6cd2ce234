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


def ts_us(df: DataFrame, col: str = "ts"):
    """Epoch-microseconds Column for the events timestamp, whatever the
    parquet stored it as: int64 nanos (TIMESTAMP(NANOS) read back as long
    under ``nanosAsLong``) → integer ``DIV 1000``; TIMESTAMP_NTZ micros →
    timezone-independent ``timestampdiff`` from the epoch (matches DuckDB's
    ``epoch_us(ts)`` on a naive timestamp exactly, bit-for-bit integers)."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col, "")
    if dtype in ("bigint", "long", "int"):
        return F.expr(f"{col} DIV 1000")
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({col} AS TIMESTAMP_NTZ))",
    )
