import numpy as np
import pandas as pd
import pytest

from sed_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sed-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield s


@pytest.fixture(scope="session")
def events_pdf():
    """Synthetic mpes-style event frame (FIXTURES.md §1): 50k rows, 4 files."""
    rng = np.random.default_rng(42)
    n = 50_000
    pdf = pd.DataFrame(
        {
            "X": rng.uniform(0, 2048, n),
            "Y": rng.uniform(0, 2048, n),
            "t": rng.uniform(60_000, 120_000, n),
            "ADC": rng.uniform(2_000, 20_000, n),
        },
    )
    pdf["file_id"] = (np.arange(n) // (n // 4)).clip(max=3).astype("int32")
    pdf["row_index"] = np.arange(n, dtype="int64")
    ts = 1.6e9 + np.sort(rng.uniform(0, 600, n))
    pdf["timeStamp"] = ts
    return pdf


@pytest.fixture(scope="session")
def events_df(spark, events_pdf):
    return spark.createDataFrame(events_pdf).repartition(4, "file_id").cache()
