"""The web-curation pipeline's data-driven bloom sizing: the Python
ladder and the SQL CASE chain (generated from the same constants) must
agree on every boundary — a drifted pair would silently desynchronise
the Spark bitmap from the oracle's replay."""

import duckdb

import hds_functions_spark.registry_ext  # noqa: F401  (loads the chain)
from hds_functions_spark.registry_ext11 import (
    _WC_BLOOM_BITS_PER_KEY,
    _WC_BLOOM_MAX_LOG2,
    _WC_BLOOM_MIN_LOG2,
    _wc_bloom_bits,
    _wc_bloom_bits_sql,
)


def test_ladder_python_sql_parity():
    con = duckdb.connect()
    # every power-of-two boundary, one below/at/above, plus extremes
    probes = {0, 1, 100}
    for b in range(_WC_BLOOM_MIN_LOG2, _WC_BLOOM_MAX_LOG2 + 2):
        edge = (1 << b) // _WC_BLOOM_BITS_PER_KEY
        probes.update({edge - 1, edge, edge + 1})
    probes.add(10 ** 9)
    for n in sorted(p for p in probes if p >= 0):
        sql_bits = con.execute(
            f"SELECT {_wc_bloom_bits_sql(str(n))}"
        ).fetchone()[0]
        assert sql_bits == _wc_bloom_bits(n), n


def test_ladder_properties():
    assert _wc_bloom_bits(0) == 1 << _WC_BLOOM_MIN_LOG2
    assert _wc_bloom_bits(10 ** 12) == 1 << _WC_BLOOM_MAX_LOG2  # clamp
    for n in (100, 5000, 20000, 320000):
        bits = _wc_bloom_bits(n)
        assert bits >= _WC_BLOOM_BITS_PER_KEY * n or (
            bits == 1 << _WC_BLOOM_MAX_LOG2
        )
        assert bits & (bits - 1) == 0  # power of two
