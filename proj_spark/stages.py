"""Stage compiler: coordinate pipelines as fused vectorized pandas UDFs.

One :class:`~proj_spark.ops.Pipeline` (or single operator) compiles to ONE
Arrow-batched pandas UDF — the Spark analogue of the reference's
proj_trans_generic strided-array loop (src/4D_api.cpp:609-760), except the
batching is free via Arrow and the whole multi-step pipeline is fused into a
single Python roundtrip per batch (SURVEY.md §1.3: "one fused pandas UDF per
pipeline for Arrow-batch efficiency").

Plan shape: everything before/after the UDF stays JVM-side; the UDF consumes
exactly 4 double columns and emits a struct of 4 doubles, so Catalyst prunes
the scan to the needed columns and whole-stage codegen spans the surrounding
expressions. NaN is used in-kernel for poison and mapped to SQL NULL at the
boundary (reference HUGE_VAL semantics, src/fwd.cpp:41-44).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kernels.core import DEG_TO_RAD, RAD_TO_DEG
from .ops import Pipeline, U_DEGREES, U_RADIANS

_RESULT_TYPE = T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("z", T.DoubleType()),
    T.StructField("t", T.DoubleType()),
])


def _angular(units: str) -> bool:
    return units in (U_RADIANS, U_DEGREES)


def compile_transform_udf(op, direction: str = "forward",
                          degrees_in: bool = True, degrees_out: bool = True):
    """Compile an Operator/Pipeline into a pandas UDF
    (x, y, z, t) -> struct(x, y, z, t).

    degrees_in/degrees_out: treat angular-unit endpoints as degrees at the
    DataFrame boundary (GIS convention); kernels run in radians.
    """
    in_ang = _angular(op.input_units(direction))
    out_ang = _angular(op.output_units(direction))

    @F.pandas_udf(_RESULT_TYPE)
    def _udf(x: pd.Series, y: pd.Series, z: pd.Series, t: pd.Series) -> pd.DataFrame:
        xa = x.to_numpy(dtype=np.float64, na_value=np.nan)
        ya = y.to_numpy(dtype=np.float64, na_value=np.nan)
        za = z.to_numpy(dtype=np.float64, na_value=np.nan)
        ta = t.to_numpy(dtype=np.float64, na_value=np.nan)
        if in_ang and degrees_in:
            xa = xa * DEG_TO_RAD
            ya = ya * DEG_TO_RAD
        ox, oy, oz, ot = op.apply(direction, xa, ya, za, ta)
        if out_ang and degrees_out:
            ox = ox * RAD_TO_DEG
            oy = oy * RAD_TO_DEG
        return pd.DataFrame({"x": ox, "y": oy, "z": oz, "t": ot})

    return _udf


def apply_transform(df: DataFrame, op, x_col, y_col, z_col=None, t_col=None,
                    direction: str = "forward", out_prefix: str = "",
                    out_cols=("x", "y"), degrees_in: bool = True,
                    degrees_out: bool = True) -> DataFrame:
    """Attach transformed coordinate columns to ``df``.

    ``op`` may be an Operator, Pipeline, or a proj-string / EPSG code pair via
    :func:`proj_spark.create`. Output columns named ``out_prefix + out_cols``.
    """
    if isinstance(op, str):
        from .crs import create
        op = create(op)
    udf = compile_transform_udf(op, direction, degrees_in, degrees_out)
    zc = F.col(z_col).cast("double") if z_col else F.lit(0.0)
    tc = F.col(t_col).cast("double") if t_col else F.lit(float("nan"))
    res = udf(F.col(x_col).cast("double"), F.col(y_col).cast("double"), zc, tc)
    df = df.withColumn("_pj", res)
    names = ["x", "y", "z", "t"]
    for i, out in enumerate(out_cols):
        df = df.withColumn(out_prefix + out, F.col(f"_pj.{names[i]}"))
    return df.drop("_pj")


def transform(df: DataFrame, src_crs: str, dst_crs: str,
              lon_col: str = "lon", lat_col: str = "lat",
              x_out: str = "x", y_out: str = "y") -> DataFrame:
    """cs2cs-equivalent: df with (lon,lat) degrees in src_crs geodetic ->
    (x,y) in dst_crs (the engine's `echo ... | cs2cs` analogue,
    reference src/apps/cs2cs.cpp:101-200)."""
    from .crs import create_crs_to_crs
    pipe = create_crs_to_crs(src_crs, dst_crs)
    return apply_transform(df, pipe, lon_col, lat_col,
                           out_cols=(x_out, y_out))
