"""URL/domain web-curation family (r16): canonical keys, registrable
domains, suffix blocklists, per-domain caps, host dedup stats."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.urls import (
    cap_per_domain,
    domain_suffix_chain,
    filter_domain_blocklist,
    host_dedup_stats,
    registered_domain,
    url_canonicalize,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    rows = url_canonicalize(df).orderBy("i").collect()
    return [(r["scheme"], r["host"], r["domain"], r["url_canon"])
            for r in rows]


def test_url_canonicalize_cases(spark):
    got = _canon(spark, [
        # case, default port, www, dup+trailing slash, utm + frag
        "http://WWW.Site1.Com:80/a//b/?utm_source=f&id=3#frag",
        # https default port; param order sorts; click-ids dropped
        "https://Sub.Site2.co.uk:443/p?id=3&b=2&fbclid=xyz&gclid=1",
        "https://sub.site2.co.uk/p?b=2&id=3",
        # non-default port kept; empty path -> '/'
        "http://site3.io:8080?x=1",
        # bare utm-only query -> no '?'
        "http://site4.org/q/?utm_medium=a&utm_campaign=b",
    ])
    assert got[0] == ("http", "site1.com", "site1.com",
                      "http://site1.com/a/b?id=3")
    assert got[1] == ("https", "sub.site2.co.uk", "site2.co.uk",
                      "https://sub.site2.co.uk/p?b=2&id=3")
    assert got[2] == got[1]  # param order never splits a key
    assert got[3] == ("http", "site3.io:8080", "site3.io",
                      "http://site3.io:8080/?x=1")
    assert got[4] == ("http", "site4.org", "site4.org",
                      "http://site4.org/q")


def test_registered_domain_and_chain(spark):
    df = spark.createDataFrame(
        [("a.b.co.uk",), ("cdn.x.com",), ("x.com",), ("localhost",),
         ("deep.a.b.gov.br",)],
        "h string",
    )
    out = df.select(
        registered_domain(F.col("h")).alias("d"),
        domain_suffix_chain(F.col("h")).alias("c"),
    ).collect()
    assert [r["d"] for r in out] == [
        "b.co.uk", "x.com", "x.com", "localhost", "b.gov.br"]
    assert out[0]["c"] == ["a.b.co.uk", "b.co.uk", "co.uk", "uk"]
    assert out[3]["c"] == ["localhost"]


def test_filter_domain_blocklist_suffix_semantics(spark):
    df = spark.createDataFrame(
        [(0, "cdn.bad.com"), (1, "bad.com"), (2, "notbad.com"),
         (3, "cdn.ok.org"), (4, "deep.cdn.ok.org"), (5, "ok.org")],
        "i long, host string",
    )
    bl = ["bad.com", "cdn.ok.org"]
    kept = {r["i"] for r in filter_domain_blocklist(df, bl).collect()}
    # bad.com blocks its whole subtree; cdn.ok.org blocks only that
    # subtree (ok.org itself survives); notbad.com is NOT a suffix match
    assert kept == {2, 5}
    tagged = {
        r["i"]: r["why"]
        for r in filter_domain_blocklist(df, bl, matched_col="why").collect()
    }
    assert tagged == {0: "bad.com", 1: "bad.com", 2: None,
                      3: "cdn.ok.org", 4: "cdn.ok.org", 5: None}
    with pytest.raises(ValueError, match="non-empty"):
        filter_domain_blocklist(df, [])


def test_cap_per_domain_matches_cap_per_group_and_nests(spark):
    from hds_functions_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, f"d{i % 3}.com") for i in range(60)], "id long, domain string"
    )
    got5 = {r["id"] for r in
            cap_per_domain(df, "id", "domain", 5, salt="s").collect()}
    ref5 = {r["id"] for r in
            cap_per_group(df, "id", "domain", 5, salt="s").collect()}
    assert got5 == ref5 and len(got5) == 15
    got9 = {r["id"] for r in
            cap_per_domain(df, "id", "domain", 9, salt="s").collect()}
    assert got5 < got9  # nested: raising the cap only adds rows


def test_host_dedup_stats(spark):
    df = spark.createDataFrame(
        [("h1", "same"), ("h1", "same"), ("h1", "other"),
         ("h2", "x")],
        "host string, text string",
    )
    out = {r["host"]: r for r in host_dedup_stats(df).collect()}
    assert out["h1"]["n_docs"] == 3
    assert out["h1"]["n_distinct_texts"] == 2
    assert out["h1"]["n_exact_dups"] == 1
    assert out["h1"]["total_chars"] == 13
    assert out["h2"]["n_exact_dups"] == 0


def test_url_family_is_pure_jvm_expressions(spark):
    """The whole family compiles to built-in expressions — no
    BatchEvalPython / ArrowEvalPython anywhere in the plan (the
    100 TB contract: stays inside whole-stage codegen)."""
    df = spark.createDataFrame(
        [(0, "http://www.a.com:80/x?utm_a=1&b=2#f", "t")],
        "id long, url string, text string",
    )
    out = host_dedup_stats(
        cap_per_domain(
            filter_domain_blocklist(
                url_canonicalize(df), ["bad.com"], matched_col="why"
            ),
            "id", "domain", 5,
        ),
        host_col="domain",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
