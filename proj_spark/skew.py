"""Explicit key-salting for skewed hot cells (north rule: "explicit
salting/AQE handling of skewed hot cells").

AQE's skew-join splitting and Spark's map-side partial aggregation cover
most skew automatically; EXPLICIT salting is the tool when they don't:

- aggregations whose per-group partial state is large (collect_set,
  exact distincts via sets, sketches merged per group): one hot cell's
  state concentrates on one reducer. Salting splits the hot group into
  ``salt_mod`` subgroups, each reduced independently, then merges the
  (small) per-salt results in a second, cheap aggregation.
- shuffled joins where BOTH sides are too big to broadcast: the big side
  gets a deterministic salt, the other side is replicated salt_mod ways.

``salted_agg`` is the aggregation form: a two-stage groupBy with a
deterministic salt derived from a row-unique column (never rand(): the
result must be reproducible and retry-stable — a task retry with rand()
double-counts rows into different salt buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_agg(df: DataFrame, keys: list, salt_col, salt_mod: int,
               partial_aggs: list, final_aggs: list) -> DataFrame:
    """Two-stage skew-safe aggregation.

    Stage 1 groups by keys + pmod(xxhash64(salt_col), salt_mod) and
    computes ``partial_aggs``; stage 2 groups by keys alone and merges
    with ``final_aggs`` (which see the stage-1 column names). The hot
    key's work spreads over ``salt_mod`` reducers; the second shuffle
    carries at most salt_mod rows per key."""
    salt = F.pmod(F.xxhash64(salt_col), F.lit(salt_mod)).alias("_salt")
    stage1 = df.groupBy(*keys, salt).agg(*partial_aggs)
    return stage1.groupBy(*keys).agg(*final_aggs)
