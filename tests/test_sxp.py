"""SXP loader: ragged multi-train segmentation vs a numpy oracle that
replicates the reference chop loop verbatim
(reference src/sed/loader/sxp/loader.py:259-352,425-464)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from sed_spark.loader.sxp import (
    SXPLoader,
    pulse_table,
    segment_trains,
    train_aux_split,
)

REC_SCHEMA = StructType(
    [
        StructField("trainId", LongType()),
        StructField("pulseId", ArrayType(DoubleType())),
        StructField("x", ArrayType(DoubleType())),
    ],
)


def chop_oracle(records, num_trains=0, num_pulses=0, ubid_offset=0):
    """The reference's create_multi_index_per_electron +
    create_dataframe_per_electron logic (sxp/loader.py:284-346,450-464),
    numpy-for-loop style."""
    rows = []
    per_pulse_counter: dict = {}
    for base, mib, x in records:
        mib = np.asarray(mib, dtype=float)
        x = np.asarray(x, dtype=float)
        # NaN -> int32 cast is an intentional reference quirk; silence the
        # numpy cast warning for the oracle replica
        with np.errstate(invalid="ignore"):
            if num_trains:
                negs = np.where(np.diff(mib.astype(np.int32)) < 0)[0]
                if len(negs) >= num_trains:
                    mib = mib.copy()
                    mib[negs[num_trains - 1]:] = 0
            train_ends = np.where(np.diff(mib.astype(np.int32)) < -1)[0]
        index = 0
        for k, end in enumerate(train_ends):
            tid = base + k
            for p in range(index, end):
                raw = mib[p]
                if np.isnan(raw):
                    continue
                pulse = (raw % num_pulses if num_pulses else raw) - ubid_offset
                pulse = int(pulse)
                if -ubid_offset <= pulse < 0:
                    continue
                eid = per_pulse_counter.get((tid, pulse), 0)
                per_pulse_counter[(tid, pulse)] = eid + 1
                rows.append((tid, pulse, eid, x[p]))
            index = end + 1
    return pd.DataFrame(rows, columns=["trainId", "pulseId", "electronId", "x"])


def _records_df(spark, records):
    pdf = pd.DataFrame(
        [
            {"trainId": b, "pulseId": list(map(float, m)), "x": list(map(float, x))}
            for b, m, x in records
        ],
    )
    return spark.createDataFrame(pdf, schema=REC_SCHEMA)


def _compare(got, want):
    got = got.sort_values(["trainId", "pulseId", "electronId"]).reset_index(drop=True)
    want = want.sort_values(["trainId", "pulseId", "electronId"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["trainId", "pulseId", "electronId", "x"]].astype(
            {"trainId": "int64", "pulseId": "int64", "electronId": "int64"},
        ),
        want.astype(
            {"trainId": "int64", "pulseId": "int64", "electronId": "int64"},
        ),
    )


def test_segment_trains_matches_reference_chop(spark):
    rng = np.random.default_rng(7)
    records = []
    base = 1000
    for _ in range(20):
        # 2-5 trains of 3-30 hits each, mib ramps up within a train
        parts = []
        for _t in range(rng.integers(2, 6)):
            nh = int(rng.integers(3, 30))
            parts.append(np.sort(rng.integers(0, 400, nh)))
        mib = np.concatenate(parts)
        x = rng.normal(size=len(mib))
        records.append((base, mib, x))
        base += 10
    got = segment_trains(
        _records_df(spark, records),
        electron_channels=["x"],
        num_pulses=300,
        ubid_offset=5,
    ).toPandas()
    want = chop_oracle(records, num_pulses=300, ubid_offset=5)
    _compare(got, want)


def test_segment_trains_no_modulo_no_offset(spark):
    records = [
        (50, [1, 2, 3, 0, 1, 2, 9, 0, 4], [1, 2, 3, 4, 5, 6, 7, 8, 9]),
        (70, [5.0], [1.0]),  # single hit: no boundary, fully dropped
        (90, [], []),  # empty record
    ]
    got = segment_trains(_records_df(spark, records), electron_channels=["x"]).toPandas()
    want = chop_oracle(records)
    _compare(got, want)
    # the boundary hits (index 3's left neighbor etc.) and the tail are gone
    assert len(got) == len(want) > 0


def test_segment_trains_num_trains_trim(spark):
    # trailing broken copies after the 2nd train: num_trains=2 zeroes them,
    # creating one artificial boundary at the cut
    records = [
        (10, [1, 2, 3, 0, 1, 2, 3, 1, 2, 1, 2], list(range(11))),
    ]
    got = segment_trains(
        _records_df(spark, records), electron_channels=["x"], num_trains=2,
    ).toPandas()
    want = chop_oracle(records, num_trains=2)
    _compare(got, want)


def test_segment_trains_nan_hits_dropped(spark):
    records = [
        (10, [1.0, np.nan, 3.0, 0.0, 1.0, 2.0, 0.0, 9.0], list(range(8))),
    ]
    got = segment_trains(_records_df(spark, records), electron_channels=["x"]).toPandas()
    want = chop_oracle(records)
    _compare(got, want)


def test_pulse_table_positional(spark):
    pdf = pd.DataFrame(
        {
            "trainId": [100, 101],
            "bam": [[1.0, 2.0, 3.0], [4.0, 5.0]],
        },
    )
    got = (
        pulse_table(spark.createDataFrame(pdf), pulse_channels=["bam"])
        .orderBy("trainId", "pulseId")
        .toPandas()
    )
    assert got["trainId"].tolist() == [100, 100, 100, 101, 101]
    assert got["pulseId"].tolist() == [0, 1, 2, 0, 1]
    assert got["bam"].tolist() == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_train_aux_split(spark):
    pdf = pd.DataFrame(
        {"trainId": [1, 2], "dldAux": [[9.0, 8.0, 7.0], [6.0, 5.0, 4.0]]},
    )
    got = (
        train_aux_split(
            spark.createDataFrame(pdf), "dldAux", {"sampleBias": 0, "tofVoltage": 2},
        )
        .orderBy("trainId")
        .toPandas()
    )
    assert "dldAux" not in got.columns
    assert got["sampleBias"].tolist() == [9.0, 6.0]
    assert got["tofVoltage"].tolist() == [4.0, 7.0][::-1]


def test_sxp_loader_end_to_end(spark):
    rng = np.random.default_rng(3)
    records = []
    base = 2000
    pdf_rows = []
    for _ in range(10):
        parts = [np.sort(rng.integers(0, 50, int(rng.integers(5, 15))))
                 for _t in range(3)]
        mib = np.concatenate(parts)
        tof = rng.uniform(1e4, 2e4, len(mib))
        pdf_rows.append(
            {
                "trainId": base,
                "pulseId": list(map(float, mib)),
                "dldTimeSteps": list(map(float, tof)),
                "bam": list(map(float, rng.normal(size=4))),
                "delayStage": float(rng.normal()),
            },
        )
        records.append((base, mib, tof))
        base += 10
    schema = StructType(
        [
            StructField("trainId", LongType()),
            StructField("pulseId", ArrayType(DoubleType())),
            StructField("dldTimeSteps", ArrayType(DoubleType())),
            StructField("bam", ArrayType(DoubleType())),
            StructField("delayStage", DoubleType()),
        ],
    )
    recs = spark.createDataFrame(pd.DataFrame(pdf_rows), schema=schema)
    loader = SXPLoader(
        spark=spark,
        config={
            "channels": {
                "dldTimeSteps": {"format": "per_electron"},
                "bam": {"format": "per_pulse"},
                "delayStage": {"format": "per_train"},
            },
            "num_pulses": 40,
            "tof_column": "dldTimeSteps",
        },
    )
    df, meta = loader.read_dataframe(records=recs)
    assert meta["loader"] == "sxp"
    out = df.toPandas()
    want = chop_oracle(records, num_pulses=40)
    assert len(out) == len(want)
    assert {"trainId", "pulseId", "electronId", "dldTimeSteps", "bam",
            "delayStage"} <= set(out.columns)
    # per-pulse channels index on the RAW record train id
    # (MultiIndex.from_product, reference sxp/loader.py:356-380): only k=0
    # trains match, and only pulse positions inside the array (< 4)
    assert out["dldTimeSteps"].notna().all()
    is_base = out.trainId % 10 == 0
    assert out[is_base & (out.pulseId < 4) & (out.pulseId >= 0)]["bam"].notna().all()
    assert out[~is_base | (out.pulseId >= 4)]["bam"].isna().all()
    # delayStage present where trainId is a record base (k=0 trains)
    assert out[out.trainId % 10 == 0]["delayStage"].notna().all()
    assert out[out.trainId % 10 != 0]["delayStage"].isna().all()


def test_sxp_loader_requires_input(spark):
    with pytest.raises(ValueError):
        SXPLoader(spark=spark, config={}).read_dataframe()
