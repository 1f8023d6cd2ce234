"""SXP loading: ragged multi-train record segmentation as array expressions.

The SXP momentum microscope writes one HDF5 record per DAQ *readout block*:
a base ``trainId`` plus 2-D ragged hit arrays in which several consecutive
trains are concatenated; the microbunch-ID channel resets (``diff < -1``)
mark the train boundaries (reference src/sed/loader/sxp/loader.py:259-352).
The reference chops these on the driver with numpy loops per record and
builds a pandas MultiIndex (trainId, pulseId, electronId).

Spark-first, a record is a row holding the base train id and one
``array<double>`` column per electron channel, and the chopping is a pure
JVM Column-expression pipeline — no UDF, no driver loop:

1. boundary detection: ``filter(sequence(0, n-2), i -> m[i+1] < m[i]-1)``
2. segment structs ``(k, start, end)`` from the boundary list
3. ONE ``explode`` to per-train rows (``trainId = base + k``)
4. per-hit structs zipping the mib slice with the channel slices, a second
   ``explode`` to electron rows
5. ``pulseId = mib % num_pulses - ubid_offset`` (loader.py:306-321)
6. ``electronId`` = order-of-appearance counter per (trainId, pulseId)
   (loader.py:334-346) — one ``row_number`` window, partitioned on the same
   key the downstream channel-alignment join shuffles on, so at 100 TB the
   exchange is reused, not added.

Per-pulse channels explode positionally against the RAW record train id
(loader.py:356-380 ``MultiIndex.from_product``), per-train channels are
scalars, and the dldAux block is a fixed-index gather (loader.py:466-509).
Alignment, forward-fill, buffer staging and sector splitting are shared
with the flash machinery (``sed_spark.loader.flash``).

Semantics replicated exactly, including the reference's quirks: the hit at
each boundary index is excluded from every segment (``slice(index,
train_end)``), the tail after the last boundary is dropped, and with
``num_trains`` set the hits after the (num_trains-1)-th negative diff are
zeroed, which creates one artificial boundary at the cut
(loader.py:284-296).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sed_spark import dfops
from sed_spark.loader.flash import BufferStage, align_channels, schema_check

__all__ = [
    "segment_trains",
    "pulse_table",
    "train_aux_split",
    "SXPLoader",
]


_INT32_MIN = -2147483648


def _iv(x):
    """np.int32 cast semantics: truncate toward zero; NaN (or null — the
    Arrow path surfaces missing hits as null) -> INT32_MIN, numpy's x86
    behavior for the invalid cast (the reference diffs
    ``mib.astype(np.int32)``, loader.py:288,300)."""
    return F.when(x.isNull() | F.isnan(x), F.lit(_INT32_MIN)).otherwise(
        x.cast("int"),
    ).cast("long")


def _i32diff(m, i):
    """m[i+1] - m[i] with int32 wraparound, matching np.diff on int32."""
    d = _iv(F.get(m, i + 1)) - _iv(F.get(m, i))
    return F.pmod(d + F.lit(2**31), F.lit(2**32)) - F.lit(2**31)


def _boundaries(m, n):
    """Indices i where diff < -1 on int32-cast values
    (np.where(np.diff(mib.astype(int32)) < -1), loader.py:300)."""
    return F.when(
        n >= 2,
        F.filter(
            F.sequence(F.lit(0), n - F.lit(2)),
            lambda i: _i32diff(m, i) < -1,
        ),
    ).otherwise(F.array().cast("array<int>"))


def segment_trains(
    df: DataFrame,
    train_col: str = "trainId",
    mib_col: str = "pulseId",
    electron_channels: Sequence[str] = (),
    num_trains: int = 0,
    num_pulses: int = 0,
    ubid_offset: int = 0,
    rec_col: str | None = None,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Chop ragged records into per-electron rows (trainId, pulseId,
    electronId, channels...) — reference ``create_multi_index_per_electron``
    + ``create_dataframe_per_electron`` (sxp/loader.py:259-352,425-464).

    ``df`` holds one row per record: ``train_col`` (base id), ``mib_col``
    and each electron channel as equal-length ``array`` columns. ``rec_col``
    (default: record order via the train base) makes the electronId counter
    deterministic across records.
    """
    order_col = rec_col or train_col
    m = F.col(mib_col)

    # --- optional broken-trailing-hit-copy trim (loader.py:284-296) -------
    if num_trains:
        n0 = F.size(m)
        negs = F.when(
            n0 >= 2,
            F.filter(
                F.sequence(F.lit(0), n0 - F.lit(2)),
                lambda i: _i32diff(m, i) < 0,
            ),
        ).otherwise(F.array().cast("array<int>"))
        cut = F.get(negs, F.lit(num_trains - 1))  # null if fewer negatives
        trimmed = F.when(
            cut.isNotNull(),
            F.transform(m, lambda v, i: F.when(i >= cut, F.lit(0.0)).otherwise(v)),
        ).otherwise(m)
        df = df.withColumn("__mib", trimmed)
    else:
        df = df.withColumn("__mib", m)

    mib = F.col("__mib")
    n = F.size(mib)
    ends = _boundaries(mib, n)

    # --- segment structs: k-th train covers [prev_end+1 | 0, end_k) ------
    segs = F.transform(
        ends,
        lambda e, k: F.struct(
            k.alias("k"),
            F.when(k == 0, F.lit(0)).otherwise(F.get(ends, k - 1) + 1).alias("lo"),
            e.alias("hi"),
        ),
    )
    seg = df.select(
        *keep_cols,
        F.col(order_col).alias("__rec"),
        F.col(train_col).alias("__base"),
        "__mib",
        *electron_channels,
        F.explode(segs).alias("__seg"),
    )

    # --- per-hit structs: positions lo..hi-1, mib + channels gathered ----
    lo, hi = F.col("__seg.lo"), F.col("__seg.hi")
    pos = F.when(hi > lo, F.sequence(lo, hi - 1)).otherwise(
        F.array().cast("array<int>"),
    )
    hit = F.transform(
        pos,
        lambda p: F.struct(
            p.alias("p"),
            F.get(mib, p).alias("mib"),
            *[F.get(F.col(c), p).alias(c) for c in electron_channels],
        ),
    )
    ex = seg.select(
        *keep_cols,
        "__rec",
        (F.col("__base") + F.col("__seg.k")).alias("trainId"),
        F.col("__seg.k").alias("__k"),
        F.explode(hit).alias("__h"),
    ).filter(
        # microbunches.explode().dropna() (loader.py:321-327): both null
        # (Arrow missing) and NaN hits are dropped
        F.col("__h.mib").isNotNull() & ~F.isnan(F.col("__h.mib")),
    )

    # --- pulse id: mib % num_pulses - ubid_offset (loader.py:306-321) ----
    raw = F.col("__h.mib")
    if num_pulses:
        raw = raw % F.lit(num_pulses)
    pulse = (raw - F.lit(ubid_offset)).cast("long")
    ex = ex.withColumn("pulseId", pulse)
    if ubid_offset:
        # drop index values arange(-ubid_offset, 0) (loader.py:459-463)
        ex = ex.filter(~F.col("pulseId").between(-ubid_offset, -1))

    # --- electron counter, order of appearance (loader.py:334-346) -------
    w = (
        Window.partitionBy(*keep_cols, "trainId", "pulseId")
        .orderBy("__rec", "__k", "__h.p")
    )
    out = ex.withColumn("electronId", F.row_number().over(w) - 1)
    return out.select(
        *keep_cols,
        "trainId",
        "pulseId",
        "electronId",
        *[F.col(f"__h.{c}").alias(c) for c in electron_channels],
    )


def pulse_table(
    df: DataFrame,
    train_col: str = "trainId",
    pulse_channels: Sequence[str] = (),
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-pulse channels exploded positionally against the RAW record
    train id (reference ``create_dataframe_per_pulse`` +
    ``MultiIndex.from_product``, sxp/loader.py:356-380,466-523)."""
    z = F.arrays_zip(*[F.col(c).alias(c) for c in pulse_channels])
    ex = df.select(
        *keep_cols,
        F.col(train_col).alias("trainId"),
        F.posexplode(z).alias("pulseId", "__z"),
    )
    return ex.select(
        *keep_cols,
        "trainId",
        F.col("pulseId").cast("long").alias("pulseId"),
        *[F.col(f"__z.{c}").alias(c) for c in pulse_channels],
    )


def train_aux_split(
    df: DataFrame,
    aux_col: str,
    aux_channels: Mapping[str, int],
    drop_source: bool = True,
) -> DataFrame:
    """Split the per-train auxiliary block into named scalar columns by
    fixed index (reference dldAux handling, sxp/loader.py:495-509)."""
    out = df.select(
        "*",
        *[F.get(F.col(aux_col), idx).alias(name) for name, idx in aux_channels.items()],
    )
    return out.drop(aux_col) if drop_source else out


class SXPLoader:
    """Assembles the SXP event table from staged raw-record parquet.

    Raw HDF5 decoding is gated behind ``h5py`` exactly as in the flash
    loader (one-time edge conversion writes records as rows with array
    columns); from there everything is the Column pipeline above. Config
    keys mirror the reference YAML (sxp/loader.py:41-67 and the
    sxp_example_config):

      ``channels``: {name: {"format": "per_electron"|"per_pulse"|"per_train",
                            "aux_channels": {name: idx}  # dldAux only
                           }}
      ``num_trains`` / ``num_pulses`` / ``ubid_offset``: segmentation knobs
      ``fill_channels``: forward-filled after alignment
      ``split_sector``: 3-bit sector unpack kwargs
      ``tof_column``: dropna subset (loader.py:699-704)
    """

    def __init__(self, spark: SparkSession | None = None, config: dict | None = None, **_):
        self.spark = spark
        self.config = config or {}

    def _fmt(self, fmt: str) -> list[str]:
        return [
            c
            for c, spec in self.config.get("channels", {}).items()
            if spec.get("format") == fmt and c not in ("trainId", "pulseId")
        ]

    def read_dataframe(
        self,
        records: DataFrame | None = None,
        folder: str | None = None,
        stage: BufferStage | None = None,
        **_,
    ) -> tuple[DataFrame, dict]:
        spark = self.spark or SparkSession.active()
        if records is None:
            if folder is None:
                raise ValueError("provide a records DataFrame or a staged folder")
            import os

            records = spark.read.parquet(os.path.join(folder, "records.parquet"))

        cfg = self.config
        electron_ch = self._fmt("per_electron")
        pulse_ch = self._fmt("per_pulse")
        train_ch = self._fmt("per_train")

        electron = segment_trains(
            records,
            electron_channels=electron_ch,
            num_trains=cfg.get("num_trains", 0),
            num_pulses=cfg.get("num_pulses", 0),
            ubid_offset=cfg.get("ubid_offset", 0),
            rec_col=cfg.get("rec_column"),
            keep_cols=tuple(cfg.get("keep_columns", ())),
        )
        schema_check(
            electron,
            electron_ch,
            extra_ok=("trainId", "pulseId", "electronId", "file_id",
                      *cfg.get("keep_columns", ())),
        )
        pulse = (
            pulse_table(records, pulse_channels=pulse_ch) if pulse_ch else None
        )
        train = None
        if train_ch:
            train = records.select(F.col("trainId"), *train_ch)
            aux = cfg.get("channels", {}).get("dldAux", {})
            if "dldAux" in train_ch and aux.get("aux_channels"):
                train = train_aux_split(train, "dldAux", aux["aux_channels"])

        if stage is not None:
            electron = spark.read.parquet(stage.materialize(electron, "electron"))
            if pulse is not None:
                pulse = spark.read.parquet(stage.materialize(pulse, "pulse"))
            if train is not None:
                train = spark.read.parquet(stage.materialize(train, "train"))

        df = align_channels(electron, pulse, train, drop_negative_pulses=False)
        for col in cfg.get("fill_channels", []):
            if col in df.columns:
                df = dfops.forward_fill(
                    df, [col], group_col="trainId", order_col="pulseId",
                )
        split = cfg.get("split_sector")
        if split:
            df = dfops.split_dld_time_from_sector_id(df, **split)
        tof = cfg.get("tof_column")
        if tof and tof in df.columns:
            df = df.na.drop(subset=[tof])
        return df, {"loader": "sxp"}
