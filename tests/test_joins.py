"""As-of and range join semantics on crafted rows (the sf-table
oracles in __spark_entry__ check engine-vs-DuckDB equality; these pin
the corner cases: inclusivity, ties, key isolation, bucket spanning)."""

from pyspark.sql import functions as F

from yacy_grid_crawler_spark.operators.joins import asof_join, range_join


def _asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k long, t long, lval string")
    right = spark.createDataFrame(right_rows, "k long, t long, rval string")
    out = asof_join(left, right, keys=["k"], time_col="t",
                    payload_cols=["rval"])
    return {
        (r["k"], r["t"]): (r["matched_t"], r["matched_rval"])
        for r in out.collect()
    }


def test_asof_backward_inclusive_and_left_semantics(spark):
    got = _asof(
        spark,
        [(1, 10, "a"), (1, 3, "b"), (2, 7, "c")],
        [(1, 4, "r4"), (1, 10, "r10"), (2, 99, "late")],
    )
    assert got == {
        (1, 10): (10, "r10"),  # equal time matches (inclusive)
        (1, 3): (None, None),  # nothing at or before t=3 -> left join
        (2, 7): (None, None),  # key isolation: k=1 rows never leak
    }


def test_asof_equal_time_right_duplicates_resolve_to_greatest(spark):
    got = _asof(
        spark,
        [(1, 5, "x")],
        [(1, 5, "aa"), (1, 5, "zz"), (1, 2, "old")],
    )
    assert got == {(1, 5): (5, "zz")}


def test_asof_carries_forward_across_many_left_rows(spark):
    got = _asof(
        spark,
        [(1, 2, "l1"), (1, 6, "l2"), (1, 9, "l3")],
        [(1, 1, "r1"), (1, 7, "r7")],
    )
    assert got == {(1, 2): (1, "r1"), (1, 6): (1, "r1"), (1, 9): (7, "r7")}


def test_range_join_inclusive_bounds_and_single_emission(spark):
    points = spark.createDataFrame(
        [(1, 100, "p100"), (1, 150, "p150"), (1, 200, "p200"),
         (1, 201, "p201"), (2, 150, "other")],
        "k long, t long, pname string",
    )
    intervals = spark.createDataFrame(
        [(1, 100, 200, "iv1"), (1, 140, 160, "iv2")],
        "k long, s long, e long, iname string",
    )
    # bucket much smaller than the interval: iv1 spans 11 buckets; each
    # qualifying pair must still appear exactly once
    out = range_join(points, intervals, keys=["k"], time_col="t",
                     start_col="s", end_col="e", bucket=10)
    pairs = sorted((r["pname"], r["iname"]) for r in out.collect())
    assert pairs == [
        ("p100", "iv1"),   # start boundary inclusive
        ("p150", "iv1"),
        ("p150", "iv2"),
        ("p200", "iv1"),   # end boundary inclusive
    ]
    # p201 just past end (excluded), k=2 point isolated


def test_asof_null_keys_and_null_times_follow_sql_join_semantics(spark):
    """NULL = NULL is false in SQL joins and t >= NULL never holds, so
    NULL-key/NULL-time RIGHT rows must never match anything, while
    NULL-key/NULL-time LEFT rows survive unmatched (left join)."""
    left = spark.createDataFrame(
        [(None, 10, "lnullk"), (1, None, "lnullt"), (1, 10, "lok")],
        "k long, t long, lval string",
    )
    right = spark.createDataFrame(
        [(None, 5, "rnullk"), (1, None, "rnullt"), (1, 4, "r4")],
        "k long, t long, rval string",
    )
    out = {
        (r["k"], r["lval"]): (r["matched_t"], r["matched_rval"])
        for r in asof_join(left, right, keys=["k"], time_col="t",
                           payload_cols=["rval"]).collect()
    }
    assert out == {
        (None, "lnullk"): (None, None),
        (1, "lnullt"): (None, None),
        (1, "lok"): (4, "r4"),  # NULL-time right row never carried
    }


def test_range_join_rejects_nonpositive_bucket(spark):
    import pytest

    df = spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("t"),
        F.col("id").alias("s"), F.col("id").alias("e"),
    )
    for bad in (0, -5):
        with pytest.raises(ValueError):
            range_join(df, df, ["k"], "t", "s", "e", bucket=bad)
