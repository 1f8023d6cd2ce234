#!/usr/bin/env python
"""Compare binning physical strategies on the bench synthetic workload.

Usage: PYTHONPATH=/root/repo python tools/bench_binning.py [n_rows] [method ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e8)
    methods = sys.argv[2:] or ["groupby", "chunked", "taskblob"]
    cpus = os.cpu_count()

    from sed_spark.binning import bin_dataframe
    from sed_spark.session import get_spark

    spark = get_spark(
        app_name="bench-binning",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.driver.maxResultSize": "8g",
            "spark.log.level": "ERROR",
        },
    )

    ranges = {"X": (0.0, 2048.0), "Y": (0.0, 2048.0),
              "t": (60000.0, 120000.0), "ADC": (2000.0, 20000.0)}
    base = spark.range(0, n, 1, cpus * 4)
    synth = base.select(
        *[
            (F.rand(seed=42 + i) * (hi - lo) + lo).alias(col)
            for i, (col, (lo, hi)) in enumerate(ranges.items())
        ],
    ).persist()
    synth.count()

    ref = None
    for m in methods:
        for rep in range(2):
            t0 = time.perf_counter()
            res = bin_dataframe(
                synth, [100, 100, 100, 100], ["X", "Y", "t", "ADC"],
                [(0.0, 2048.0), (0.0, 2048.0), (60000.0, 120000.0),
                 (2000.0, 20000.0)],
                method=m,
            )
            dt = time.perf_counter() - t0
            tot = res.sum()
            print(f"{m} rep{rep}: {dt:.2f}s sum={tot:.0f}", flush=True)
        if ref is None:
            ref = res.data
        else:
            same = bool(np.array_equal(ref, res.data))
            print(f"{m} matches groupby: {same}", flush=True)

    synth.unpersist()


if __name__ == "__main__":
    main()
