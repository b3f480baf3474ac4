"""Registry-level checks for the URL/domain web-curation family (r16):
protocol reachability (every verdict class fires at driver scales) and
plan shape (the family is UDF-free; the capstone's only Python stages
are the WARC write/read codec boundary)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

import hds_functions_spark.registry_ext  # noqa: F401  (chain)
from hds_functions_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
SF_DRIVER = "/root/testdata/sf0.01"


def test_web_url_canonicalize_collapses(spark):
    out = QUERIES["web_url_canonicalize"](spark, SF).toPandas()
    # every revisit pair must collapse (raw > canon wherever a revisit
    # landed) and nothing else may merge: canon keys = distinct docs
    assert (out.n_canon_urls <= out.n_raw_urls).all()
    assert (out.n_canon_urls < out.n_raw_urls).any()
    assert out.n_raw_urls.sum() == out.n_fetches.sum()  # raw all distinct
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert out.n_canon_urls.sum() == n_docs


def test_web_domain_blocklist_all_entries_fire(spark):
    from hds_functions_spark.registry_web import _U_BLOCKLIST

    out = QUERIES["web_domain_blocklist"](spark, SF).toPandas()
    statuses = set(out.status)
    assert statuses == set(_U_BLOCKLIST) | {"kept"}
    # subtree semantics: the registrable-domain entries catch >1 host
    # (bare + www-stripped + cdn variants), the full-host entry exactly 1
    by = out.set_index("status")
    assert by.loc["site3.com", "n_hosts"] > 1
    assert by.loc["cdn.site2.io", "n_hosts"] == 1


def test_web_domain_caps_bind_at_driver_scale(spark):
    out = QUERIES["web_domain_caps"](spark, SF_DRIVER).toPandas()
    assert (out.n_kept <= 10).all()
    assert (out.n_dropped > 0).any()
    assert (out.n_docs == out.n_kept + out.n_dropped).all()


def test_pipeline_url_curation_classes_reachable(spark):
    out = QUERIES["pipeline_url_curation"](spark, SF_DRIVER).toPandas()
    assert (out.n_url_dups > 0).all()  # revisit dedup fires per tld
    assert out.n_blocked.sum() > 0
    assert out.n_capped_out.sum() > 0
    assert (out.n_kept > 0).all()
    assert (
        out.n_pages == out.n_blocked + out.n_capped_out + out.n_kept
    ).all()


@pytest.mark.parametrize(
    "name",
    ["web_url_canonicalize", "web_domain_blocklist", "web_domain_caps"],
)
def test_web_family_plans_udf_free(spark, name):
    plan = (
        QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan  # pure JVM: codegen end to end
