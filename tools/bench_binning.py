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

    def run4d(m):
        return bin_dataframe(
            synth, [100, 100, 100, 100], ["X", "Y", "t", "ADC"],
            [(0.0, 2048.0), (0.0, 2048.0), (60000.0, 120000.0),
             (2000.0, 20000.0)],
            method=m,
        )

    # warmup: 1-D like the driver bench, plus one tiny run per method so
    # Python workers / codegen are spawned before anything is timed
    bin_dataframe(synth, [1000], ["t"], [(60000.0, 120000.0)])
    small = synth.limit(100000)
    for m in methods:
        bin_dataframe(small, [10, 10, 10, 10], ["X", "Y", "t", "ADC"],
                      [(0.0, 2048.0), (0.0, 2048.0), (60000.0, 120000.0),
                       (2000.0, 20000.0)], method=m)

    results: dict[str, list[float]] = {m: [] for m in methods}
    data: dict[str, np.ndarray] = {}
    for rep in range(3):
        for m in methods:
            t0 = time.perf_counter()
            res = run4d(m)
            dt = time.perf_counter() - t0
            results[m].append(dt)
            data[m] = res.data
            print(f"{m} rep{rep}: {dt:.2f}s sum={res.sum():.0f}", flush=True)
    for m in methods:
        ts = sorted(results[m])
        print(f"{m}: min={ts[0]:.2f} med={ts[len(ts) // 2]:.2f}", flush=True)
        if m != methods[0]:
            same = bool(np.array_equal(data[methods[0]], data[m]))
            print(f"{m} matches {methods[0]}: {same}", flush=True)

    synth.unpersist()


if __name__ == "__main__":
    main()
