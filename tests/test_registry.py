"""Registry consistency guards: the driver contract stays complete and
the README capability table stays honest as queries are added."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_every_query_has_an_oracle():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(qs) == set(oracles), (
        f"missing oracles: {set(qs) - set(oracles)}; "
        f"orphan oracles: {set(oracles) - set(qs)}"
    )
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())


def test_driver_priority_queries_land_in_first_50():
    """The driver's correctness gate verifies exactly the first 50 entries of
    ``queries()`` in iteration order. Every name in DRIVER_PRIORITY (no prior
    driver-green row, or changed this round) must be registered and land
    inside that window."""
    import __spark_entry__ as e
    from hds_functions_spark.registry import DRIVER_PRIORITY

    names = list(e.queries())
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY)), "dup priority"
    unregistered = [n for n in DRIVER_PRIORITY if n not in names]
    assert not unregistered, f"priority names not registered: {unregistered}"
    window = set(names[:50])
    outside = [n for n in DRIVER_PRIORITY if n not in window]
    assert not outside, f"priority queries outside the first-50 gate: {outside}"
    # queries() and oracle_sql() iterate in the same order (oracle-less
    # streaming-style entries excepted).
    oracle_names = list(e.oracle_sql())
    assert oracle_names == [n for n in names if n in set(oracle_names)]


def test_readme_lists_every_query():
    import __spark_entry__ as e

    root = os.path.join(os.path.dirname(__file__), "..")
    readme = open(os.path.join(root, "README.md")).read()
    missing = [q for q in e.queries() if f"`{q}`" not in readme]
    assert not missing, f"queries absent from README table: {missing}"
    n = len(e.queries())
    assert f"({n} entries" in readme, (
        f"README registry count is stale (actual: {n})"
    )


def test_oracles_parse_in_duckdb():
    """Every oracle must at least BIND against empty same-schema views —
    catches SQL syntax/function drift without running data."""
    import duckdb
    import pyarrow.parquet as pq

    import __spark_entry__ as e

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        schema = pq.read_schema(f"{sf}/{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet') LIMIT 0"
        )
        del schema
    failures = []
    for name, sql in e.oracle_sql().items():
        try:
            con.execute(sql)
        except Exception as exc:
            failures.append((name, str(exc)[:120]))
    assert not failures, failures
