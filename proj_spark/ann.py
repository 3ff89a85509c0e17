"""ANN over embedding columns: trained IVF centroids + recall measurement.

The driver-checked `ann_ivf_top5` query (querylib.py) keeps its
deterministic `% 37` subsample centroids so the DuckDB oracle can mirror
the rule exactly. This module supplies the production path on top of the
same plan shape: spherical k-means centroids trained on a BOUNDED sample
(driver-side Lloyd iterations over at most `max_sample` vectors — at
100 TB the sample, not the table, bounds driver memory), then the usual
broadcast-centroids / one-shuffle-on-bucket / n-probe / exact-rerank IVF.

Everything is deterministic: sampling is `vec_id % m == 0`, init is the
first k sample vectors, ties in assignment break on lowest centroid id —
so results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _normalized(e: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, v, norm) with v cast to double."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    return (e.select("vec_id", v.alias("v"))
             .withColumn("norm", F.sqrt(F.aggregate(
                 "v", F.lit(0.0), lambda a, x: a + x * x))))


def _cos(v1, n1, v2, n2):
    dot = F.aggregate(F.zip_with(v1, v2, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    return dot / (n1 * n2)


def train_centroids(emb: DataFrame, k: int, iters: int = 8,
                    max_sample: int = 100_000,
                    vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means on a bounded deterministic sample.

    The sample is collected to the driver (<= max_sample vectors — the
    only driver-side data, independent of table size); Lloyd iterations
    run vectorized in numpy. Returns (k, dim) float64 centroids,
    L2-normalized (cosine k-means: assignment by dot product on unit
    vectors, centroid = normalized mean).
    """
    n = emb.count()
    mod = max(1, n // max_sample)
    rows = (emb.filter(F.col("vec_id") % mod == 0)
               .select("vec_id", vec_col).orderBy("vec_id").collect())
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    nx = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(nx == 0, 1.0, nx)
    k = min(k, len(x))
    c = x[:k].copy()  # deterministic init: first k sample vectors
    for _ in range(iters):
        sims = x @ c.T                       # (n, k)
        assign = np.argmax(sims, axis=1)     # ties -> lowest id (argmax)
        for j in range(k):
            m = assign == j
            if m.any():
                v = x[m].sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    c[j] = v / nv
    return c


def centroid_df(spark, cents: np.ndarray) -> DataFrame:
    """Centroids as a broadcast-able (cid, cv, cnorm) DataFrame."""
    rows = [(int(i), [float(v) for v in c]) for i, c in enumerate(cents)]
    df = spark.createDataFrame(rows, "cid long, cv array<double>")
    return df.withColumn("cnorm", F.sqrt(F.aggregate(
        "cv", F.lit(0.0), lambda a, x: a + x * x)))


def ivf_topk(spark, emb: DataFrame, cents: DataFrame, k: int = 5,
             nprobe: int = 2, query_mod: int = 50,
             vec_col: str = "embedding") -> DataFrame:
    """IVF top-k: broadcast centroids -> nearest-centroid bucket per
    vector (map-side) -> queries probe their `nprobe` nearest buckets
    (one shuffle on cid; AQE splits hot buckets) -> exact cosine rerank
    over candidates only. Returns (qid, nid, sim, rank)."""
    e = _normalized(emb, vec_col)
    asg = e.join(F.broadcast(cents)).select(
        "vec_id", "cid",
        _cos(F.col("v"), F.col("norm"), F.col("cv"), F.col("cnorm"))
        .alias("csim"))
    w_a = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.col("cid"))
    buckets = (asg.withColumn("rn", F.row_number().over(w_a))
                  .filter("rn = 1").select("vec_id", "cid"))

    qs = (e.filter(F.col("vec_id") % query_mod == 0)
           .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
                   F.col("norm").alias("qnorm")))
    qp = qs.join(F.broadcast(cents)).select(
        "qid", "qv", "qnorm", "cid",
        _cos(F.col("qv"), F.col("qnorm"), F.col("cv"), F.col("cnorm"))
        .alias("csim"))
    w_q = Window.partitionBy("qid").orderBy(F.desc("csim"), F.col("cid"))
    qprobe = (qp.withColumn("rn", F.row_number().over(w_q))
                .filter(F.col("rn") <= nprobe)
                .select("qid", "qv", "qnorm", "cid"))

    cand = (qprobe.join(buckets, on="cid")
                  .filter(F.col("vec_id") != F.col("qid"))
                  .join(e.select("vec_id", "v", "norm"), on="vec_id"))
    scored = cand.select(
        "qid", F.col("vec_id").alias("nid"),
        _cos(F.col("qv"), F.col("qnorm"), F.col("v"), F.col("norm"))
        .alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("qid", "nid", "sim", "rank"))


def brute_topk(spark, emb: DataFrame, k: int = 5, query_mod: int = 50,
               vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k (recall ground truth): broadcast the small query
    side over the full table."""
    e = _normalized(emb, vec_col)
    qs = (e.filter(F.col("vec_id") % query_mod == 0)
           .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
                   F.col("norm").alias("qnorm")))
    cand = (e.crossJoin(F.broadcast(qs))
             .filter(F.col("vec_id") != F.col("qid")))
    scored = cand.select(
        "qid", F.col("vec_id").alias("nid"),
        _cos(F.col("qv"), F.col("qnorm"), F.col("v"), F.col("norm"))
        .alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("qid", "nid", "sim", "rank"))


def recall_at_k(approx: DataFrame, exact: DataFrame) -> float:
    """|approx ∩ exact| / |exact| over (qid, nid) pairs."""
    hit = approx.select("qid", "nid").join(
        exact.select("qid", "nid"), on=["qid", "nid"]).count()
    total = exact.count()
    return hit / total if total else 1.0
