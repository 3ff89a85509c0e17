"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query (extract -> transform -> tile counts) on sf0.001.
queries(): one callable per implemented operator (proj_spark.querylib).
oracle_sql(): equivalent DuckDB SQL per query where SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages -> coordinate extraction -> webmerc tiling -> counts."""
    from proj_spark import querylib

    querylib.register_views(spark, "/root/testdata/sf0.001")
    return querylib.QUERIES["extract_tile_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from proj_spark import querylib

    out = {}
    for name, fn in querylib.QUERIES.items():
        def wrapper(spark, sf_dir, _fn=fn):
            querylib.register_views(spark, sf_dir)
            return _fn(spark, sf_dir)
        out[name] = wrapper
    return out


def oracle_sql() -> dict[str, str]:
    from proj_spark import querylib

    return dict(querylib.ORACLES)
