"""sed-spark: a PySpark-native single-event data processing & binning engine.

A from-scratch rebuild of the capabilities of OpenCOMPES/sed (reference:
/root/reference) on the Spark DataFrame/SQL stack. The data model is one row
per detected event; processing is a pipeline of pure Column-expression
transforms (calibrations, corrections, offsets) followed by an N-dimensional
histogram expressed as ``groupBy(bin indices).count()`` so that Catalyst /
Tungsten handle partial aggregation, shuffle, and whole-stage codegen.

Design stance (see SURVEY.md §7):
 - DataFrame-first: no RDDs, UDFs only where semantics require them
   (distortion-field lookup, as-of interpolation against driver arrays).
 - dask partition identity is replaced by an explicit ``file_id`` column.
 - The binned result is a small dense array collected to the driver.
"""

from sed_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
