"""whitebox_tools_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing surface of
jblindsay/whitebox-tools (reference at /root/reference, read-only) as
idiomatic PySpark: DataFrame transforms + vectorized pandas/Arrow UDFs.
No RDDs, no per-row Python. Geometry kernels are numpy inside
mapInPandas; relational glue is Catalyst-optimized DataFrame ops.

Layout:
    functions/  pure column-expression + numpy kernel building blocks
    operators/  DataFrame -> DataFrame transforms (the "tools")
    sources/    synthetic corpus generators + driver-table loaders
    plans/      lineage / checkpoint / resume driver
    streaming/  incremental (foreachBatch) tile assignment
"""

__version__ = "0.1.0"
