"""tilematrix_spark — a from-scratch PySpark-native tile-pyramid + spatial-join engine.

Reproduces the query semantics of the reference library ``ungarj/tilematrix``
(tile-index <-> map-coordinate translation over regular tile pyramids) as
idiomatic Spark: native Column expressions for all grid arithmetic
(whole-stage codegen), range-explode covers, Arrow-vectorized numpy kernels
for polygon predicates, and explicitly partitioned / salted joins for the
trillion-row image-table workload described in BASELINE.json.

Reference semantics citations use ``file:line`` into ``/root/reference/``.
"""

from .grid import GridConfig, PyramidConfig, GEODETIC, MERCATOR

__version__ = "0.1.0"

__all__ = ["GridConfig", "PyramidConfig", "GEODETIC", "MERCATOR"]
