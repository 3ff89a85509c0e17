"""Physical-plan audits: assert the Catalyst plans the engine relies on at
100 TB actually materialize — pushdown/pruning into the parquet scan,
broadcast (not shuffle) joins for the small sides, JVM-side regex
extraction, Arrow (not row-at-a-time Python) evaluation for the kernels.

These are the properties SURVEY.md §4 claims Catalyst gives for free; a
regression here silently turns a map-side plan into a shuffle at scale.
"""

from __future__ import annotations

import pytest

from proj_spark.session import get_spark
from proj_spark import querylib

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("plan_audit", cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    querylib.register_views(s, SF)
    yield s
    s.stop()


def plan_of(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    mode_obj = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(mode_obj)


def test_scan_column_pruning(spark):
    """Selecting 2 columns of documents must prune the scan's ReadSchema
    (the text/html payloads are the bulk of a 100 TB pages table)."""
    df = spark.table("documents").select("doc_id", "lang")
    p = plan_of(df)
    assert "ReadSchema" in p
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema


def test_filter_pushdown_to_parquet(spark):
    """A lang filter must reach the parquet scan as a pushed filter."""
    from pyspark.sql import functions as F
    df = spark.table("documents").filter(F.col("lang") == "en") \
        .select("doc_id")
    p = plan_of(df)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed and "lang" in pushed[0]


def test_pip_join_is_broadcast(spark):
    """The PIP cell-prefix join must broadcast the polygon cover side —
    the points side (10^12 rows at scale) must NOT shuffle."""
    from pyspark.sql import functions as F
    from proj_spark import joins
    pts = spark.sql(
        "SELECT doc_id AS pid, (doc_id * 7 % 36000000) - 18000000 AS lon_i, "
        "(doc_id * 13 % 17000000) - 8500000 AS lat_i FROM documents")
    hits = joins.pip_join(spark, pts)
    p = plan_of(hits)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_knn_probe_side_broadcast(spark):
    """kNN candidate generation broadcasts the (small) query ring set."""
    from proj_spark import joins
    q = spark.sql("SELECT doc_id AS qid, (doc_id * 11 % 1000000) AS qx, "
                  "(doc_id * 17 % 1000000) AS qy FROM documents LIMIT 50")
    pts = spark.sql("SELECT doc_id AS pid, (doc_id * 7 % 1000000) AS px, "
                    "(doc_id * 13 % 1000000) AS py FROM documents")
    out = joins.knn_join(spark, q, pts, k=3)
    p = plan_of(out)
    assert "BroadcastHashJoin" in p


def test_extraction_is_jvm_side(spark):
    """The regex coordinate extraction must stay in whole-stage codegen —
    no Python evaluation node in the scan stage."""
    from proj_spark.pagesgen import SPARK_EXTRACT_CTE
    df = spark.sql(f"WITH {SPARK_EXTRACT_CTE} SELECT url, lat, lon FROM extracted "
                   "WHERE lat IS NOT NULL")
    p = plan_of(df)
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p
    # simple mode marks whole-stage-codegen stages with "*(n)"
    assert "*(1)" in plan_of(df, "simple")


def test_kernels_run_arrow_not_row_python(spark):
    """Projection kernels must evaluate via Arrow batches, never the
    row-at-a-time Python evaluator."""
    from proj_spark.stages import apply_transform
    from proj_spark.crs import create
    df = spark.sql("SELECT CAST(doc_id % 360 - 180 AS DOUBLE) AS lon, "
                   "CAST(doc_id % 160 / 2.0 - 40 AS DOUBLE) AS lat "
                   "FROM documents")
    out = apply_transform(df, create("+proj=utm +zone=32 +ellps=GRS80"),
                          "lon", "lat")
    p = plan_of(out)
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p


def test_dedup_is_partial_agg(spark):
    """Exact dedup must plan a partial (map-side) aggregate before the
    exchange, so the shuffle carries pre-combined rows."""
    from pyspark.sql import functions as F
    df = (spark.table("documents")
          .groupBy(F.xxhash64("text").alias("h"))
          .agg(F.min("doc_id").alias("keep")))
    p = plan_of(df, "simple")
    assert "partial" in p.lower()
    assert "Exchange" in p


def test_simhash_pairs_no_cartesian(spark):
    """SimHash pair generation is a pigeonhole-banded EQUI-join on
    (band, band_value) — 7 bands over 48 bits cover hamming <= 6
    losslessly — never a BroadcastNestedLoop/cartesian theta join
    (textops.simhash_pairs_sql)."""
    from proj_spark import textops
    df = spark.sql(textops.simhash_pairs_sql("spark"))
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_near_dup_no_cartesian(spark):
    """Embedding near-dup candidates come from one (band, key) bucket
    aggregation over the signature relation (signatures computed once —
    the former sig-self-join ran the LSH UDF on both sides) with
    in-bucket pair expansion; only verified candidates ever carry
    vectors, and nothing may plan a cartesian."""
    df = querylib.QUERIES["embedding_near_dup"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "collect_list" in plan


def test_embedding_near_dup_bucket_cap_equivalent(spark, monkeypatch):
    """Buckets above EMB_LSH_BUCKET_CAP route through the spillable
    self-join instead of the single-array expansion (a mega-cluster must
    not materialize K(K-1)/2 pairs in one array value). Forcing the cap
    to 2 sends every real bucket through the join path — the emitted
    pair set must be IDENTICAL to the default (array-expansion) path."""
    base = {tuple(r) for r in
            querylib.QUERIES["embedding_near_dup"](spark, SF).collect()}
    monkeypatch.setattr(querylib, "EMB_LSH_BUCKET_CAP", 2)
    capped = {tuple(r) for r in
              querylib.QUERIES["embedding_near_dup"](spark, SF).collect()}
    assert capped == base and len(base) > 0


def test_minhash_single_pass_agg(spark):
    """All 16 MinHash permutation minimums are one hash aggregation over
    the raw shingles (Functions [16], with map-side partial_min), band
    keys are projections, and candidate generation stays an equi-join —
    the cross-join-with-permutations shape (16x shuffle volume, two
    aggregations) must not come back."""
    df = querylib.QUERIES["minhash_lsh_pairs"](spark, SF)
    plan = plan_of(df)
    assert "Functions [16]" in plan
    assert "partial_min" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # BIGINT minhash values keep the agg a HashAggregate — min(string)
    # buffers would force SortAggregate (a full sort of every shingle row)
    assert "SortAggregate" not in plan
    # the four shingle consumers must read the one cached relation, not
    # re-derive shingles from parquet (CTE references defeat the cache)
    assert "InMemoryTableScan" in plan


def test_decontam_probe_is_broadcast(spark):
    """The decontamination probe joins the (tiny) eval n-gram set against
    the corpus's map-side n-grams as a BROADCAST hash join — the corpus
    side must never shuffle for candidate generation."""
    from proj_spark import textops
    df = spark.sql(textops.decontam_sql("spark"))
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_within_radius_join_is_broadcast(spark):
    """The range join's candidate generation is a broadcast equi-join on
    the cell key (small side = city cover cells); the points side must
    not shuffle and no theta/cartesian join may appear."""
    df = querylib.QUERIES["within_radius_join"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_within_radius_shuffled_no_broadcast(spark):
    """The both-sides-large variant must NOT broadcast: candidate
    generation is a shuffled hash equi-join on the cell key with a hash
    exchange on each side, and no theta/cartesian join."""
    df = querylib.QUERIES["within_radius_shuffled"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # formatted mode separates node names from Arguments: count the
    # hash-partitioned exchanges feeding the join (one per side)
    assert plan.count("Arguments: hashpartitioning(cell_x") >= 2 \
        or plan.count("hashpartitioning(cell_x") >= 2


def test_salted_agg_two_stage(spark):
    """Explicit salting must produce two aggregation exchanges — one on
    (keys, salt), one on keys — with deterministic (xxhash64) salt, never
    rand()."""
    df = querylib.QUERIES["salted_tile_stats"](spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange") >= 2
    assert "xxhash64" in plan
    assert "rand(" not in plan
