from sed_spark.calibrator import delay, energy, momentum  # noqa: F401
