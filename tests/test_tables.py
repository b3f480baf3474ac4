"""Table-management tests: path-based load/save, archive filtering,
standardisers with dirty-date guards."""

import datetime

import pytest
from pyspark.sql import functions as F

from hds_functions_spark import (
    get_archive_versions,
    load_table,
    save_table,
    standardise_table,
)


@pytest.fixture()
def archive_df(spark):
    return spark.createDataFrame(
        [
            ("p1", "20200101", datetime.date(2021, 1, 1)),
            ("p2", "20200102", datetime.date(2021, 1, 1)),
            ("p1", "20200101", datetime.date(2021, 6, 1)),
            ("p3", "garbage!", datetime.date(2021, 6, 1)),
        ],
        "PERSON_ID_DEID: string, REG_DATE: string, archived_on: date",
    )


def test_save_and_load_roundtrip(archive_df, tmp_path):
    directory = {"t": {"path": str(tmp_path / "t"), "format": "parquet"}}
    save_table(archive_df, "t", table_directory=directory)
    loaded = load_table("t", table_directory=directory)
    assert loaded.count() == 4


def test_load_latest_archive(archive_df, tmp_path):
    directory = {
        "t": {"path": str(tmp_path / "t"), "archive_date": "latest"}
    }
    save_table(archive_df, "t", table_directory=directory)
    loaded = load_table("t", table_directory=directory)
    assert loaded.count() == 2
    assert {r["archived_on"] for r in loaded.collect()} == {datetime.date(2021, 6, 1)}


def test_load_exact_and_max_archive(archive_df, tmp_path):
    base = {"path": str(tmp_path / "t")}
    save_table(archive_df, "t", table_directory={"t": base})
    exact = load_table(
        "t", table_directory={"t": {**base, "archive_date": "2021-01-01"}}
    )
    assert exact.count() == 2
    upto = load_table(
        "t", table_directory={"t": {**base, "max_archive_date": "2021-01-01"}}
    )
    assert upto.count() == 2


def test_archive_filters_mutually_exclusive(archive_df, tmp_path):
    directory = {
        "t": {
            "path": str(tmp_path / "t"),
            "archive_date": "latest",
            "max_archive_date": "2021-01-01",
        }
    }
    save_table(archive_df, "t", table_directory={"t": {"path": str(tmp_path / "t")}})
    with pytest.raises(AssertionError, match="Only one of"):
        load_table("t", table_directory=directory)


def test_missing_table_key(tmp_path):
    with pytest.raises(AssertionError, match="not found"):
        load_table("nope", table_directory={"t": {"path": str(tmp_path)}})


def test_save_partitioned(archive_df, tmp_path):
    directory = {"t": {"path": str(tmp_path / "part")}}
    save_table(archive_df, "t", table_directory=directory, partition_by="archived_on")
    spark = archive_df.sparkSession
    loaded = spark.read.parquet(str(tmp_path / "part"))
    assert loaded.count() == 4
    # partition layout is prunable
    assert any(p.name.startswith("archived_on=") for p in (tmp_path / "part").iterdir())


def test_get_archive_versions(archive_df):
    assert get_archive_versions(archive_df) == ["2021-01-01", "2021-06-01"]


def test_standardise_gdppr(spark):
    df = spark.createDataFrame([("p1", 5)], ["NHS_NUMBER_DEID", "Some Col"])
    out = standardise_table(df, "gdppr")
    assert out.columns == ["person_id", "some_col"]


def test_standardise_deaths_dirty_dates(spark):
    df = spark.createDataFrame(
        [("p1", "20200115", "20200120"), ("p2", "20200116", "not-a-date")],
        ["DEC_CONF_NHS_NUMBER_CLEAN_DEID", "REG_DATE", "REG_DATE_OF_DEATH"],
    )
    out = standardise_table(df, "deaths")
    assert set(["person_id", "reg_date", "date_of_death"]) <= set(out.columns)
    rows = {r["person_id"]: r for r in out.collect()}
    assert rows["p1"]["reg_date"] == datetime.date(2020, 1, 15)
    assert rows["p1"]["date_of_death"] == datetime.date(2020, 1, 20)
    assert rows["p2"]["date_of_death"] is None  # rlike guard -> null, no error


def test_standardise_vaccine_status(spark):
    df = spark.createDataFrame(
        [("p1", "20210301", "20221231", "20210301T12303011")],
        ["PERSON_ID_DEID", "RECORDED_DATE", "EXPIRY_DATE", "DATE_AND_TIME"],
    )
    out = standardise_table(df, "vaccine_status").collect()[0]
    assert out["recorded_date"] == datetime.date(2021, 3, 1)
    assert out["expiry_date"] == datetime.date(2022, 12, 31)
    assert out["date_and_time"] is not None


@pytest.mark.parametrize(
    "method,raw_id",
    [
        ("gdppr", "NHS_NUMBER_DEID"),
        ("hes_apc", "PERSON_ID_DEID"),
        ("hes_op", "PERSON_ID_DEID"),
        ("hes_ae", "PERSON_ID_DEID"),
        ("pillar_2", "Person_ID_DEID"),
        ("ssnap", "Person_ID_DEID"),
        ("sgss", "PERSON_ID_DEID"),
        ("primary_care_meds", "Person_ID_DEID"),
        ("chess", "PERSON_ID_DEID"),
    ],
)
def test_standardise_rename_only_golden(spark, method, raw_id):
    """Golden parity for the rename-only standardisers: exact person-id
    rename per dataset (case matters: pillar_2/ssnap/primary_care_meds use
    Person_ID_DEID, the rest PERSON_ID_DEID), remaining names cleaned,
    values and row count untouched (reference table_management.py:209-300)."""
    df = spark.createDataFrame(
        [("p1", "Episode 1", 7), ("p2", None, 9)],
        [raw_id, "Admission Method", "EPIKEY#"],
    )
    out = standardise_table(df, method)
    # '#' -> '_' per the reference's clean_column_names (each invalid
    # character becomes an underscore, no trailing strip)
    assert out.columns == ["person_id", "admission_method", "epikey_"]
    rows = sorted(out.collect(), key=lambda r: r["person_id"])
    assert [tuple(r) for r in rows] == [("p1", "Episode 1", 7), ("p2", None, 9)]
    # withColumnRenamed resolves case-insensitively under Spark's default
    # spark.sql.caseSensitive=false — a differently-cased source column
    # still renames, exactly as the reference's own Spark calls would
    df2 = spark.createDataFrame([("px", 1)], [raw_id.swapcase(), "v"])
    out2 = standardise_table(df2, method)
    assert out2.columns == ["person_id", "v"]


def test_standardise_unknown_method(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    with pytest.raises(ValueError, match="not a recognised"):
        standardise_table(df, "unknown_method")


def test_per_dataset_wrappers_match_reference_surface(spark):
    """The 11 named standardise_*_table functions exist at package root and
    equal the registry dispatch (reference table_management.py:209-300)."""
    import hds_functions_spark as hds
    from hds_functions_spark.sources.tables import STANDARDISERS

    expected = {
        "deaths", "gdppr", "hes_apc", "hes_op", "hes_ae", "pillar_2",
        "ssnap", "sgss", "vaccine_status", "primary_care_meds", "chess",
    }
    assert set(STANDARDISERS) == expected
    for method in expected:
        fn = getattr(hds, f"standardise_{method}_table")
        assert callable(fn)
    df = spark.createDataFrame([("p1", 5)], ["NHS_NUMBER_DEID", "Some Col"])
    assert hds.standardise_gdppr_table(df).columns == ["person_id", "some_col"]


def test_archive_snapshot_lifecycle(spark, tmp_path):
    """save_archive_snapshot -> get_archive_versions -> load_table(latest)
    round-trip on a path-configured archive table."""
    from hds_functions_spark.sources.tables import (
        load_table,
        save_archive_snapshot,
    )

    directory = {"arch": {"path": str(tmp_path / "arch"), "format": "parquet"}}
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id: long, v: string")
    df2 = spark.createDataFrame([(1, "a2"), (3, "c")], "id: long, v: string")
    save_archive_snapshot(df1, "arch", "2021-01-01", table_directory=directory)
    save_archive_snapshot(df2, "arch", "2021-06-01", table_directory=directory)

    allrows = load_table("arch", table_directory=directory)
    assert allrows.count() == 4
    assert get_archive_versions(allrows) == ["2021-01-01", "2021-06-01"]

    latest_dir = {"arch": {**directory["arch"], "archive_date": "latest"}}
    latest = load_table("arch", table_directory=latest_dir)
    assert sorted(r["id"] for r in latest.collect()) == [1, 3]

    exact_dir = {"arch": {**directory["arch"], "archive_date": "2021-01-01"}}
    exact = load_table("arch", table_directory=exact_dir)
    assert sorted(r["v"] for r in exact.collect()) == ["a", "b"]


def test_archive_snapshot_errors(spark, tmp_path):
    from hds_functions_spark.sources.tables import save_archive_snapshot

    directory = {"arch": {"path": str(tmp_path / "a"), "format": "parquet"}}
    df = spark.createDataFrame([(1,)], "id: long")
    with pytest.raises(ValueError, match="non-empty string"):
        save_archive_snapshot(df, "arch", "", table_directory=directory)
    stamped = df.withColumn("archived_on", F.lit("x"))
    with pytest.raises(ValueError, match="already has"):
        save_archive_snapshot(stamped, "arch", "2021-01-01", table_directory=directory)


def test_bucketed_save_elides_join_shuffle(spark, tmp_path):
    """save_table(bucket_by=...) into the session catalog produces tables
    whose equi-join on the bucket key plans ZERO shuffle exchanges — the
    co-located-join layout for fact tables joined repeatedly on one key."""
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    td = {
        "bl": {"database": "default", "table_name": "hds_bucket_l"},
        "br": {"database": "default", "table_name": "hds_bucket_r"},
    }
    save_table(left, "bl", td, bucket_by=(4, "k"))
    save_table(right, "br", td, bucket_by=(4, "k"))
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # tiny test tables would broadcast (which also disables bucketed scans);
    # force the shuffle-join path the layout exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = load_table("bl", td).join(load_table("br", td), on="k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        spark.sql("DROP TABLE IF EXISTS default.hds_bucket_l")
        spark.sql("DROP TABLE IF EXISTS default.hds_bucket_r")


def test_sorted_save_gives_skippable_ranges(spark, tmp_path):
    """save_table(sort_by=...) range-partitions + sorts so each parquet
    file covers a narrow value range — parquet min/max stats then skip
    files for range predicates."""
    import glob

    import pyarrow.parquet as pq

    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    td = {"srt": {"path": str(tmp_path / "sorted"), "format": "parquet"}}
    save_table(df, "srt", td, sort_by=(4, "k"))
    ranges = []
    for f in glob.glob(str(tmp_path / "sorted" / "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1
    ranges.sort()
    # files cover disjoint ranges (range partitioning): each file's max is
    # below the next file's min
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    with pytest.raises(AssertionError, match="exclusive"):
        save_table(df, "srt", td, sort_by="k", bucket_by=(4, "k"))


def test_min_archive_date_incremental(archive_df, tmp_path):
    """min_archive_date loads only snapshots AFTER the bound — the
    incremental-processing filter."""
    base = {"path": str(tmp_path / "inc")}
    save_table(archive_df, "t", table_directory={"t": base})
    newer = load_table(
        "t", table_directory={"t": {**base, "min_archive_date": "2021-01-01"}}
    )
    assert {str(r["archived_on"]) for r in newer.collect()} == {"2021-06-01"}


def test_upsert_table(spark, tmp_path):
    from hds_functions_spark.sources.tables import upsert_table

    td = {"u": {"path": str(tmp_path / "u"), "format": "parquet"}}
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id: long, v: string")
    upsert_table(v1, "u", "id", table_directory=td)  # first call = create
    v2 = spark.createDataFrame([(2, "B2"), (3, "c")], "id: long, v: string")
    upsert_table(v2, "u", "id", table_directory=td)
    rows = {r["id"]: r["v"] for r in load_table("u", table_directory=td).collect()}
    assert rows == {1: "a", 2: "B2", 3: "c"}
    with pytest.raises(ValueError, match="missing from DataFrame"):
        upsert_table(v2, "u", "nope", table_directory=td)
    with pytest.raises(ValueError, match="path-configured"):
        upsert_table(v2, "m", "id",
                     table_directory={"m": {"database": "d", "table_name": "t"}})


def test_upsert_table_rejects_remote_schemes(spark, tmp_path):
    """A remote path would make os.path.exists() False and silently
    overwrite instead of merging — must fail loudly (ADVICE r2)."""
    from hds_functions_spark.sources.tables import upsert_table

    v = spark.createDataFrame([(1, "a")], "id: long, v: string")
    for remote in ("hdfs://nn/warehouse/t", "s3a://bucket/t"):
        with pytest.raises(ValueError, match="local-filesystem only"):
            upsert_table(v, "r", "id",
                         table_directory={"r": {"path": remote}})
    # file:// is local: allowed, and the merge actually works through it
    td = {"f": {"path": "file://" + str(tmp_path / "f"), "format": "parquet"}}
    upsert_table(v, "f", "id", table_directory=td)
    v2 = spark.createDataFrame([(1, "A2"), (2, "b")], "id: long, v: string")
    upsert_table(v2, "f", "id", table_directory=td)
    rows = {r["id"]: r["v"] for r in load_table("f", table_directory=td).collect()}
    assert rows == {1: "A2", 2: "b"}


def test_swap_write_lock_single_writer_guard(spark, tmp_path):
    """r16 (VERDICT item 8): the directory-swap protocol is
    single-writer — a held lock file makes a second writer fail
    LOUDLY (ConcurrentWriterError naming the holder + remediation),
    the table is untouched, and releasing the lock lets writes
    proceed again. Covers upsert_table and tombstone_delete (same
    guard), and lock cleanup on success."""
    import os

    from hds_functions_spark.sources.tables import (
        ConcurrentWriterError,
        tombstone_delete,
        upsert_table,
    )

    path = str(tmp_path / "locked")
    td = {"u": {"path": path, "format": "parquet"}}
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id: long, v: string")
    upsert_table(v1, "u", "id", table_directory=td)
    lock = path + "._write_lock"
    assert not os.path.exists(lock)  # released after a clean write

    with open(lock, "w") as fh:  # simulate a concurrent/crashed writer
        fh.write("pid=99999 at=2026-08-17T00:00:00")
    v2 = spark.createDataFrame([(2, "B2")], "id: long, v: string")
    with pytest.raises(ConcurrentWriterError, match="pid=99999"):
        upsert_table(v2, "u", "id", table_directory=td)
    tomb = spark.createDataFrame([(1,)], "id: long")
    with pytest.raises(ConcurrentWriterError, match="delete"):
        tombstone_delete(tomb, "u", "id", table_directory=td)
    rows = {r["id"]: r["v"] for r in load_table("u", table_directory=td).collect()}
    assert rows == {1: "a", 2: "b"}  # blocked writers changed nothing

    os.remove(lock)  # the documented remediation
    upsert_table(v2, "u", "id", table_directory=td)
    audit = tombstone_delete(tomb, "u", "id", table_directory=td).collect()[0]
    assert audit["n_deleted"] == 1
    rows = {r["id"]: r["v"] for r in load_table("u", table_directory=td).collect()}
    assert rows == {2: "B2"}
    assert not os.path.exists(lock)


def test_table_diff_statuses(spark):
    from hds_functions_spark.sources.tables import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k: int, s: string, v: int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "x", 30), (4, None, 41), (5, "e", 50)],
        "k: int, s: string, v: int",
    )
    got = {
        r["k"]: (r["status"], list(r["changed_columns"]))
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: ("removed", []),
        2: ("unchanged", []),
        3: ("changed", ["s"]),
        4: ("changed", ["v"]),  # null-safe: None == None is not a change
        5: ("added", []),
    }
    # multi-change rows list every differing column, sorted
    new2 = spark.createDataFrame([(2, "z", 99)], "k: int, s: string, v: int")
    row = table_diff(old.filter("k = 2"), new2, ["k"]).first()
    assert row["status"] == "changed"
    assert list(row["changed_columns"]) == ["s", "v"]


def test_table_diff_errors(spark):
    import pytest
    from hds_functions_spark.sources.tables import table_diff

    df = spark.createDataFrame([(1, 2)], "k: int, v: int")
    dup = spark.createDataFrame([(1, 2), (1, 3)], "k: int, v: int")
    with pytest.raises(ValueError, match="duplicate keys"):
        table_diff(dup, df, ["k"])
    with pytest.raises(ValueError, match="missing key"):
        table_diff(df, df, ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        table_diff(df, df, [])


def test_referential_orphans(spark):
    from hds_functions_spark.operators.quality import referential_orphans

    child = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (None, "nullkey"), (9, "orphan")],
        "fk: int, payload: string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk: int")
    out = {
        r["relationship"]: r
        for r in referential_orphans(
            {"child->parent": (child, ["fk"], parent, ["pk"])}
        ).collect()
    }
    r = out["child->parent"]
    # the null FK and the unmatched key are both orphans
    assert r["n_child_rows"] == 5 and r["n_orphans"] == 2
    assert abs(r["orphan_rate"] - 0.4) < 1e-9

    import pytest

    with pytest.raises(ValueError, match="at least one"):
        referential_orphans({})
    with pytest.raises(ValueError, match="same length"):
        referential_orphans({"bad": (child, ["fk"], parent, [])})


def test_archive_lifecycle_format_pluggable(spark, tmp_path):
    """The archive lifecycle is storage-format-pluggable via the config
    'format' field: the full snapshot -> versions -> latest-load cycle
    runs identically on ORC (exercised here because it ships with Spark).
    A Delta config ({"format": "delta"}) takes the same path and works
    wherever delta-spark is on the classpath; only parquet/orc/json are
    exercisable in this environment."""
    import datetime as dt

    from hds_functions_spark.sources.tables import (
        get_archive_versions,
        load_table,
        save_archive_snapshot,
    )

    td = {"t": {"path": str(tmp_path / "orc_archive"), "format": "orc"}}
    df1 = spark.createDataFrame([("a", 1)], "k: string, v: int")
    df2 = spark.createDataFrame([("b", 2)], "k: string, v: int")
    save_archive_snapshot(df1, "t", "2024-01-01", table_directory=td)
    save_archive_snapshot(df2, "t", "2024-06-01", table_directory=td)
    full = load_table("t", table_directory=td)
    assert get_archive_versions(full) == ["2024-01-01", "2024-06-01"]
    latest = load_table(
        "t", table_directory={"t": {**td["t"], "archive_date": "latest"}}
    )
    assert [(r["k"], r["v"]) for r in latest.collect()] == [("b", 2)]
    # the on-disk layout really is ORC, partitioned by snapshot
    part = tmp_path / "orc_archive" / "archived_on=2024-01-01"
    assert any(p.name.endswith(".orc") for p in part.iterdir())


def test_rollup_build_and_merge(spark):
    from hds_functions_spark.sources.tables import build_rollup, merge_rollup

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("c", -1.0)],
        "k: string, v: double",
    )
    full = {r["k"]: r for r in build_rollup(df, "k", "v").collect()}
    assert full["a"]["n_rows"] == 2 and full["a"]["v_sum"] == 4.0
    assert full["a"]["v_min"] == 1.0 and full["a"]["v_max"] == 3.0

    # split arbitrarily, roll up separately, merge: identical to full
    h = build_rollup(df.filter("v >= 3"), "k", "v")
    d = build_rollup(df.filter("v < 3"), "k", "v")
    merged = {r["k"]: r for r in merge_rollup(h, d, "k").collect()}
    assert {k: tuple(r) for k, r in merged.items()} == {
        k: tuple(r) for k, r in full.items()
    }

    import pytest

    with pytest.raises(ValueError, match="schemas differ"):
        merge_rollup(h, d.drop("v_min"), "k")
    with pytest.raises(ValueError, match="non-empty"):
        build_rollup(df, [], "v")
    bad = h.withColumnRenamed("v_sum", "v_avg")
    with pytest.raises(ValueError, match="mergeable"):
        merge_rollup(bad, bad, "k")


def test_rollup_merge_bit_exact_on_long_cents(spark):
    """Property: for integer (cents) value columns, any split of the rows
    into history/delta merges to EXACTLY the one-pass rollup — long sums
    are associative, which is why the registry's table_rollup_merge view
    carries money as cents (double sums are only ~1-ulp-per-fold close,
    and the driver hashes exact values)."""
    import random

    from hds_functions_spark.sources.tables import build_rollup, merge_rollup

    rng = random.Random(7)
    rows = [
        (f"k{rng.randrange(5)}", rng.randrange(-10**12, 10**12))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "k: string, cents: long").cache()
    full = {
        r["k"]: tuple(r) for r in build_rollup(df, "k", "cents").collect()
    }
    for mod in (2, 3, 7):
        h = build_rollup(
            df.filter(F.abs(F.hash("cents")) % mod != 0), "k", "cents"
        )
        d = build_rollup(
            df.filter(F.abs(F.hash("cents")) % mod == 0), "k", "cents"
        )
        merged = {
            r["k"]: tuple(r) for r in merge_rollup(h, d, "k").collect()
        }
        assert merged == full
    df.unpersist()


# --- tombstone_delete ----------------------------------------------------------


def test_tombstone_delete_removes_keys_and_audits(spark, tmp_path):
    from pyspark.sql import functions as F

    from hds_functions_spark.sources.tables import save_table, tombstone_delete

    td = {"t": {"path": str(tmp_path / "t"), "format": "parquet"}}
    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    save_table(df, "t", table_directory=td)
    tombs = spark.range(0, 100).filter("id % 10 = 0").select("id")
    audit = tombstone_delete(tombs, "t", "id", td).collect()[0]
    assert (audit["n_before"], audit["n_tombstones"],
            audit["n_deleted"], audit["n_after"]) == (100, 10, 10, 90)
    back = spark.read.parquet(str(tmp_path / "t"))
    assert back.count() == 90
    assert back.filter("id % 10 = 0").count() == 0
    # idempotent re-run: keys already gone, nothing deleted
    audit2 = tombstone_delete(tombs, "t", "id", td).collect()[0]
    assert (audit2["n_before"], audit2["n_deleted"], audit2["n_after"]) == (
        90, 0, 90,
    )


def test_tombstone_delete_validations(spark, tmp_path):
    import pytest as _pt

    from hds_functions_spark.sources.tables import tombstone_delete

    tombs = spark.range(3).select("id")
    with _pt.raises(ValueError, match="does not exist"):
        tombstone_delete(
            tombs, "t",
            "id", {"t": {"path": str(tmp_path / "missing")}},
        )
    with _pt.raises(ValueError, match="missing from tombstones"):
        tombstone_delete(
            tombs, "t", "other_key", {"t": {"path": str(tmp_path)}},
        )
