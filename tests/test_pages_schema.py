"""The pages fixture must match BASELINE.json's input_hint EXACTLY:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string) —
plus the byte-identity and epoch-drive invariants layered on top of it.
"""

from __future__ import annotations

import pytest

from proj_spark.session import get_spark
from proj_spark import pagesgen, querylib

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pages_schema", cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    querylib.register_views(s, SF)
    yield s
    s.stop()


def test_exact_input_hint_shape(spark):
    df = pagesgen.build_pages(spark, SF, flat=True)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
        ("text", "string"), ("lang", "string")]


def test_html_is_utf8_wrapper_of_text(spark):
    """html:binary round-trips byte-identically to the deterministic
    wrapper of text — the per-row invariant the reference keys on url."""
    df = pagesgen.build_pages(spark, SF, flat=True)
    rows = df.limit(50).collect()
    assert rows
    for r in rows:
        assert bytes(r.html).decode("utf-8") == (
            "<!DOCTYPE html><html><body>" + r.text + "</body></html>")


def test_warc_ts_spans_2024_weeks(spark):
    from proj_spark.querylib import QUERIES
    out = QUERIES["warc_kinematic_helmert"](spark, SF)
    rows = out.select("t_dec").distinct().collect()
    epochs = sorted(r.t_dec for r in rows)
    # weekly quantization: many distinct epochs, all inside [2024, 2025]
    assert len(epochs) > 20
    assert epochs[0] >= 2024.0 and epochs[-1] <= 2025.0


def test_html_roundtrip_counts(spark):
    from proj_spark.querylib import QUERIES
    out = QUERIES["html_byte_stats"](spark, SF).collect()
    assert out
    for r in out:
        assert r.n_roundtrip_ok == r.n_pages
