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

# convenience namespace: `import whitebox_tools_spark as wbx;
# wbx.pip_join.points_in_polygons(...)`
from .functions import (cells, geometry, geometry_sql, poly_overlay,  # noqa: F401,E402
                        raster_math, text)
from .operators import (clump, contours, data_tools, dedup, distance,  # noqa: F401,E402
                        enhancement, focal, hydro, knn, lidar, multimodal,
                        overlay, overlay_vector, pip_join, raster, similarity,
                        tiling, tin, vector_ops, vectorize, visibility)
from .plans import iterate, lineage, rank  # noqa: F401,E402
from .session import get_spark  # noqa: F401,E402
