"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (count() would let Catalyst
prune the transform UDFs away). Extra keys report docs/sec for the flagship
extract->transform->tile pipeline — the north-rule metric; the two-parallelism
scaling-efficiency run lives in BENCH/run_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "extract_tile_counts",   # flagship E2E: regex extract -> webmerc tile agg
    "webmerc_fwd",
    "utm_fwd",
    "lcc_fwd",
    "cart_fwd",
    "helmert_xyz",
    "s2_cell_counts",
    "pip_pairs",
    "knn_top5",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ann_cosine_top5",
    "ann_ivf_top5",
    "geod_triangle_area",
    "factors_merc",
    "events_hourly",
]


def run(sf_dir: str | None = None, cpus: int | None = None, quiet: bool = False):
    from proj_spark.session import get_spark
    from proj_spark import querylib

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("proj_spark_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    querylib.register_views(spark, sf_dir)

    # input sizes for throughput
    n_pages = spark.table("documents").count()
    n_points = spark.table("lineitem").count()

    timings = {}
    for name in HEADLINE:
        fn = querylib.QUERIES[name]
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT, shuffles)
        t0 = time.perf_counter()
        df2 = querylib.QUERIES[name](spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    point_q = ["webmerc_fwd", "utm_fwd", "lcc_fwd", "cart_fwd"]
    pts_per_sec = round(sum(n_points / timings[q] for q in point_q) / len(point_q))
    out = {
        "metric": "headline query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec_extract_tile": round(n_pages / timings["extract_tile_counts"]),
        "points_per_sec_transform_avg": pts_per_sec,
        "cpus": spark.sparkContext.defaultParallelism,
        "n_points": n_points,
        "n_pages": n_pages,
    }
    spark.stop()
    if not quiet:
        print(json.dumps(out))
    return out


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else None)
