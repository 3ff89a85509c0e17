"""jobs/geolocate.py — the spark-submit entry point — must be resumable:
a killed run (simulated by --max-buckets) picks up where it left off and
converges to the single-run output, with per-bucket lineage in the manifest.
"""

from __future__ import annotations

import json
import sys

import pytest

from proj_spark.session import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("submit_job", cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_geolocate_job_resumes(spark, tmp_path):
    sys.path.insert(0, "/root/repo/jobs")
    import geolocate

    out = str(tmp_path / "geo_out")
    # partial run: 2 of 4 buckets, exit code 3 = resume needed
    rc = geolocate.main(["--sf-dir", SF, "--out", out,
                         "--buckets", "4", "--max-buckets", "2"])
    assert rc == 3
    # resume: remaining buckets, exit 0
    rc = geolocate.main(["--sf-dir", SF, "--out", out, "--buckets", "4"])
    assert rc == 0
    # idempotent: nothing left to do
    rc = geolocate.main(["--sf-dir", SF, "--out", out, "--buckets", "4"])
    assert rc == 0

    man = json.load(open(out + "/_manifest.json"))
    assert len(man["buckets"]) == 4
    for b in man["buckets"].values():  # lineage + metrics per bucket
        assert {"input_rows", "output_rows", "output_xor_hash",
                "wall_s"} <= set(b)

    got = spark.read.parquet(out + "/bucket=*")
    assert set(got.columns) >= {"url", "lat", "lon", "tx", "ty", "s2_cell"}
    n_direct = int(sum(b["output_rows"] for b in man["buckets"].values()))
    assert got.count() == n_direct > 0
