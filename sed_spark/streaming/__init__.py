"""Structured Streaming ingestion for live single-event datastreams.

The reference is strictly batch over closed files (SURVEY §2.9) — its
"datastream" is the data's shape, not live ingestion; its timed table is a
pre-materialized 1 ms resample and forward-fill is a stateful propagation.
Both are natural Structured Streaming operators, so the live path is built
from the same expression library as batch:

* :func:`read_event_stream` — file-source stream over a growing directory
  of event parquet (what a DAQ writer produces), schema-declared like every
  other scan in this engine (no inference on the hot path).
* :func:`timed_table_stream` — the timed table as a tumbling-window
  aggregate of the live stream (+watermark for late events).
* :func:`streaming_histogram` — the N-D binning query on the stream: the
  SAME ``bin_index_expr`` columns as batch binning, grouped per time
  window, in update mode. A dashboard reads the sink and densifies with
  the batch code path.

Scale note: every aggregation here keys on (window × bin indices) — state
size is bounded by cube size per open window, not by event rate, and the
watermark closes windows so state is evicted. That is the property that
lets this run indefinitely on a cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from sed_spark.binning.core import _bin_columns
from sed_spark.binning.spec import normalize_bins

__all__ = [
    "read_event_stream",
    "timed_table_stream",
    "streaming_histogram",
    "run_available_now",
]


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    timestamp_column: str | None = None,
) -> DataFrame:
    """File-source stream over a directory a DAQ writer appends to.

    ``timestamp_column`` (float epoch seconds, as produced by the loaders)
    gains a companion ``__event_time`` TIMESTAMP column for windowing and
    watermarks.
    """
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(path)
    if timestamp_column is not None:
        df = df.withColumn(
            "__event_time", F.timestamp_seconds(F.col(timestamp_column)),
        )
    return df


def timed_table_stream(
    df: DataFrame,
    time_unit: float = 0.001,
    watermark: str = "10 seconds",
    event_time_column: str = "__event_time",
) -> DataFrame:
    """The timed table as a live tumbling-window aggregate.

    Batch engines pre-materialize one row per ``time_unit`` of acquisition
    (reference buffer_handler.py:164-186); on a stream that is exactly a
    tumbling window count with a watermark to close windows. Emits
    (window_start, events) in update mode.
    """
    window = F.window(
        F.col(event_time_column), f"{int(time_unit * 1e6)} microseconds",
    )
    return (
        df.withWatermark(event_time_column, watermark)
        .groupBy(window.alias("w"))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(F.col("w.start").alias("window_start"), "events")
    )


def streaming_histogram(
    df: DataFrame,
    bins,
    axes: Sequence[str] | None = None,
    ranges: Sequence[tuple[float, float]] | None = None,
    window_duration: str = "1 minute",
    watermark: str = "10 seconds",
    event_time_column: str = "__event_time",
) -> DataFrame:
    """N-D histogram per tumbling window on a live stream.

    Reuses the batch bin-index expressions verbatim (same edge semantics,
    same validity filter), so a window's sparse counts are bit-identical
    to running :func:`sed_spark.binning.sparse_histogram` over that
    window's events in batch — the streaming path is a grouping change,
    not a second binning implementation.
    """
    norm = normalize_bins(bins, axes, ranges)
    proj, bin_names = _bin_columns(df, norm)
    window = F.window(F.col(event_time_column), window_duration)
    return (
        proj.withWatermark(event_time_column, watermark)
        .groupBy(window.alias("w"), *[F.col(b) for b in bin_names])
        .agg(F.count(F.lit(1)).alias("count"))
        .select(F.col("w.start").alias("window_start"), *bin_names, "count")
    )


def run_available_now(
    stream: DataFrame, query_name: str, output_mode: str = "complete",
) -> None:
    """Drain everything currently in the source into an in-memory sink and
    stop — the batch-equivalence harness used by the tests (a production
    deployment would use a real sink + continuous trigger). ``complete``
    emits open windows too; use ``append`` to observe watermark eviction."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
