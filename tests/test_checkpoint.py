"""Kill-and-rerun checkpoint semantics: resumed run equals single run."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from proj_spark.checkpoint import CheckpointedJob


@pytest.fixture(scope="module")
def spark():
    from proj_spark.session import get_spark
    s = get_spark("test_checkpoint", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _transform(df):
    # a representative extract->transform stage: tile counts per url bucket
    return df.select(
        "url",
        F.xxhash64("url").alias("h"),
        (F.length("text") % 97).alias("feat"))


def _pages(spark):
    from proj_spark.querylib import register_views
    from proj_spark.pagesgen import build_pages
    register_views(spark, "/root/testdata/sf0.001")
    return build_pages(spark, "/root/testdata/sf0.001").select("url", "text")


def _fingerprint(df):
    return df.agg(F.bit_xor(F.xxhash64(*df.columns))).collect()[0][0], df.count()


def test_kill_and_rerun_equals_single_run(spark, tmp_path):
    pages = _pages(spark)

    # single-shot reference
    ref_dir = str(tmp_path / "single")
    job0 = CheckpointedJob("ref", ref_dir, n_buckets=6, key_col="url",
                           job_desc="extract-v1")
    assert job0.run(pages, _transform, input_path="sf0.001") == 6
    want = _fingerprint(job0.read_output(spark))

    # killed run: only 2 buckets complete, then "crash"
    res_dir = str(tmp_path / "resumed")
    job1 = CheckpointedJob("res", res_dir, n_buckets=6, key_col="url",
                           job_desc="extract-v1")
    assert job1.run(pages, _transform, input_path="sf0.001", max_buckets=2) == 2
    assert len(job1.completed_buckets()) == 2

    # resume with a fresh job object (new process analogue)
    job2 = CheckpointedJob("res", res_dir, n_buckets=6, key_col="url",
                           job_desc="extract-v1")
    assert job2.run(pages, _transform, input_path="sf0.001") == 4  # only the rest
    got = _fingerprint(job2.read_output(spark))
    assert got == want


def test_manifest_lineage_and_metrics(spark, tmp_path):
    pages = _pages(spark)
    job = CheckpointedJob("m", str(tmp_path / "m"), n_buckets=3, key_col="url",
                          job_desc="extract-v1")
    job.run(pages, _transform, input_path="/root/testdata/sf0.001")
    m = job.metrics()
    assert len(m["buckets"]) == 3
    total_in = sum(b["input_rows"] for b in m["buckets"].values())
    total_out = sum(b["output_rows"] for b in m["buckets"].values())
    assert total_in == pages.count()
    assert total_out == total_in  # row-preserving transform
    for b in m["buckets"].values():
        assert b["input_path"] == "/root/testdata/sf0.001"
        assert b["code_version"] == job.code_version
        assert b["wall_s"] >= 0


def test_rerun_is_noop_when_complete(spark, tmp_path):
    pages = _pages(spark)
    job = CheckpointedJob("n", str(tmp_path / "n"), n_buckets=2, key_col="url",
                          job_desc="v1")
    assert job.run(pages, _transform) == 2
    assert job.run(pages, _transform) == 0
