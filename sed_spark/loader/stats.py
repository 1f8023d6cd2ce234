"""Metadata-only parquet statistics — the reference's
``get_parquet_metadata`` / ``get_stats`` (src/sed/loader/utils.py:209-266)
and the footer fast path of ``get_elapsed_time``
(src/sed/loader/flash/loader.py:294-357).

Two tiers, chosen by what the caller has:

* :func:`parquet_file_stats` — driver-side pyarrow footer reads: per-file
  row counts and per-column min/max WITHOUT scanning data. O(files), no
  Spark job at all; this is what a 100 TB elapsed-time query should use.
* :func:`file_stats_df` — the same numbers as a Spark aggregation grouped
  by ``file_id`` (for when the table is already loaded/derived and footers
  no longer describe it). Parquet aggregate pushdown
  (``spark.sql.parquet.aggregatePushdown``) serves global min/max straight
  from footers when the query allows it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parquet_file_stats", "file_stats_df", "elapsed_time_from_stats"]


def parquet_file_stats(
    files: Sequence[str],
    columns: Sequence[str] | None = None,
) -> list[dict]:
    """Per-file row count and per-column (min, max) from parquet footers.

    Pure footer reads — no data pages are touched. Row-group stats are
    folded per file. Columns without statistics get ``None``.
    """
    import pyarrow.parquet as pq

    out = []
    for file_id, path in enumerate(files):
        meta = pq.ParquetFile(path).metadata
        names = list(meta.schema.names)
        wanted = [c for c in (columns or names) if c in names]
        mins: dict = {c: None for c in wanted}
        maxs: dict = {c: None for c in wanted}
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                name = col.path_in_schema
                if name not in mins or col.statistics is None:
                    continue
                st = col.statistics
                if not st.has_min_max:
                    continue
                if mins[name] is None or st.min < mins[name]:
                    mins[name] = st.min
                if maxs[name] is None or st.max > maxs[name]:
                    maxs[name] = st.max
        out.append(
            {
                "file_id": file_id,
                "path": path,
                "num_rows": meta.num_rows,
                "min": mins,
                "max": maxs,
            },
        )
    return out


def file_stats_df(
    df: DataFrame,
    columns: Sequence[str],
    file_id_column: str = "file_id",
) -> DataFrame:
    """Per-file row count and per-column min/max as a Spark aggregation.

    One shuffle on ``file_id`` (tiny: one row per file); column order is
    ``count, <col>_min, <col>_max, ...`` with stable aliases.
    """
    aggs = [F.count(F.lit(1)).alias("num_rows")]
    for c in columns:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy(file_id_column).agg(*aggs)


def elapsed_time_from_stats(
    stats: list[dict],
    timestamp_column: str = "timeStamp",
    aggregate: bool = True,
):
    """Elapsed acquisition time per file (max-min of the timestamp column)
    from footer stats — the reference's metadata-only path
    (flash/loader.py:294-357). Returns seconds (sum when ``aggregate``)."""
    per_file = []
    for s in stats:
        lo, hi = s["min"].get(timestamp_column), s["max"].get(timestamp_column)
        per_file.append(None if lo is None or hi is None else float(hi) - float(lo))
    if not aggregate:
        return per_file
    vals = [v for v in per_file if v is not None]
    return float(sum(vals)) if vals else None
