"""FEL (flash/sxp-style) loading: channel alignment as joins + staging.

The reference aligns channels of three granularities on a pandas MultiIndex
(trainId, pulseId, electronId) built per HDF5 file
(reference: src/sed/loader/flash/dataframe.py:22-310), caches the per-file
result as parquet "buffers" (src/sed/loader/flash/buffer_handler.py:109-336),
then concatenates lazily. Spark-first, the MultiIndex disappears: each
granularity is a plain table and the alignment is a multi-way left equi-join
— broadcast for the (tiny) per-train table, shuffle-free when the staged
parquet is bucketed by trainId. At 100 TB the electron table dominates; the
pulse/train tables stay broadcastable (~1e3 smaller), so alignment adds no
full-table shuffle.

HDF5 decoding itself is gated behind ``h5py`` (not present in this runtime):
the loader consumes the staged per-granularity parquet tables, which is the
natural cluster layout anyway (one-time conversion at the edge, columnar
after).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sed_spark import dfops

__all__ = [
    "assign_electron_id",
    "align_channels",
    "SchemaMismatchError",
    "schema_check",
    "BufferStage",
    "FlashLikeLoader",
    "timed_dataframe_from_pulses",
]


def assign_electron_id(
    df: DataFrame,
    train_col: str = "trainId",
    pulse_col: str = "pulseId",
    order_col: str | None = None,
    electron_col: str = "electronId",
) -> DataFrame:
    """Per-pulse electron counter 0..n-1
    (reference src/sed/loader/flash/dataframe.py:130-137: value_counts +
    arange per (train, pulse) group)."""
    order = F.col(order_col) if order_col else F.monotonically_increasing_id()
    w = Window.partitionBy(train_col, pulse_col).orderBy(order)
    return df.withColumn(electron_col, F.row_number().over(w) - 1)


def align_channels(
    electron: DataFrame,
    pulse: DataFrame | None = None,
    train: DataFrame | None = None,
    train_col: str = "trainId",
    pulse_col: str = "pulseId",
    drop_negative_pulses: bool = True,
    electron_channels: Sequence[str] | None = None,
) -> DataFrame:
    """Multi-way outer-left equi-join of the three channel granularities
    (reference src/sed/loader/flash/dataframe.py:291-310 — ``pd.concat
    (axis=1)`` on the MultiIndex is exactly this join).

    The per-train table is broadcast (thousands of rows per acquisition);
    the per-pulse join shuffles only the pulse table when the electron side
    is already partitioned by train. ``drop_negative_pulses`` replicates
    dataframe.py:307.
    """
    out = electron
    if drop_negative_pulses:
        out = out.filter(F.col(pulse_col) >= 0)
    if electron_channels:
        out = out.na.drop(subset=list(electron_channels))
    if pulse is not None:
        out = out.join(pulse, on=[train_col, pulse_col], how="left")
    if train is not None:
        out = out.join(F.broadcast(train), on=[train_col], how="left")
    return out


class SchemaMismatchError(ValueError):
    """Raised when staged parquet disagrees with the configured schema."""


def schema_check(
    df: DataFrame,
    expected_columns: Sequence[str],
    extra_ok: Sequence[str] = (),
) -> None:
    """Hard error on staged-parquet vs config schema drift
    (reference src/sed/loader/flash/buffer_handler.py:136-162)."""
    have = set(df.columns)
    want = set(expected_columns)
    missing = sorted(want - have)
    unexpected = sorted(have - want - set(extra_ok))
    if missing or unexpected:
        raise SchemaMismatchError(
            f"staged schema mismatch: missing={missing} unexpected={unexpected}. "
            "Delete the stale buffer files or update the channel config.",
        )


class BufferStage:
    """Write-once parquet staging layer (reference buffer_handler.py:90-106).

    ``materialize`` converts a source once and is a no-op afterwards;
    re-conversion happens only when ``force=True`` (schema invalidation).
    """

    def __init__(self, root: str):
        self.root = root

    def path(self, key: str) -> str:
        return os.path.join(self.root, f"{key}.parquet")

    def exists(self, key: str) -> bool:
        return os.path.exists(self.path(key))

    def materialize(self, df: DataFrame, key: str, force: bool = False) -> str:
        target = self.path(key)
        if force or not self.exists(key):
            df.write.mode("overwrite").parquet(target)
        return target

    def load(self, spark: SparkSession, keys: Sequence[str]) -> DataFrame:
        return spark.read.parquet(*[self.path(k) for k in keys])


def timed_dataframe_from_pulses(
    aligned: DataFrame,
    train_col: str = "trainId",
    pulse_col: str = "pulseId",
    pulse_channels: Sequence[str] = (),
) -> DataFrame:
    """One row per (train, pulse): the FEL timed table
    (reference src/sed/loader/flash/buffer_handler.py:164-186 builds it from
    the per-pulse channels; here a distinct projection of the aligned df)."""
    cols = [train_col, pulse_col, *pulse_channels]
    return aligned.select(*cols).dropDuplicates([train_col, pulse_col])


class FlashLikeLoader:
    """Loads staged per-granularity parquet and assembles the event table.

    Config keys (all optional):
      ``channels``: {name: {"format": "per_electron"|"per_pulse"|"per_train"}}
      ``fill_channels``: sparse columns to forward-fill after alignment
        (reference buffer_handler.py:258-272)
      ``split_sector``: {"tof_column": ..., "sector_id_column": ...} applies
        the 3-bit sector unpack (reference src/sed/loader/utils.py:148-206)
    """

    def __init__(self, spark: SparkSession | None = None, config: dict | None = None, **_):
        self.spark = spark
        self.config = config or {}

    def read_dataframe(
        self,
        files: Sequence[str] | None = None,
        folder: str | None = None,
        electron: DataFrame | None = None,
        pulse: DataFrame | None = None,
        train: DataFrame | None = None,
        **_,
    ) -> tuple[DataFrame, dict]:
        spark = self.spark or SparkSession.active()
        if electron is None:
            if folder is None:
                raise ValueError(
                    "provide granularity DataFrames or a staged folder with "
                    "electron/pulse/train parquet",
                )
            electron = spark.read.parquet(os.path.join(folder, "electron.parquet"))
            pulse_path = os.path.join(folder, "pulse.parquet")
            train_path = os.path.join(folder, "train.parquet")
            pulse = spark.read.parquet(pulse_path) if os.path.exists(pulse_path) else None
            train = spark.read.parquet(train_path) if os.path.exists(train_path) else None

        channels = self.config.get("channels", {})
        if channels:
            expected = [
                c for c, spec in channels.items()
                if spec.get("format") == "per_electron"
            ]
            # only the index/bookkeeping columns are legitimately extra —
            # anything else in the staged parquet is schema drift
            schema_check(
                electron,
                expected,
                extra_ok=("trainId", "pulseId", "electronId", "file_id"),
            )

        df = align_channels(
            electron,
            pulse,
            train,
            electron_channels=[
                c for c, spec in channels.items()
                if spec.get("format") == "per_electron" and spec.get("dropna")
            ] or None,
        )
        for col in self.config.get("fill_channels", []):
            if col in df.columns:
                df = dfops.forward_fill(
                    df, [col], group_col="trainId", order_col="pulseId",
                )
        split = self.config.get("split_sector")
        if split:
            df = dfops.split_dld_time_from_sector_id(df, **split)
        metadata = {"loader": "flash-like"}
        return df, metadata
