"""Pure-numpy coordinate-operation kernels (no Spark imports).

Kept import-light: operator modules are imported (and thereby registered)
by proj_spark.crs, avoiding a circular import with proj_spark.ops.
"""
