"""HLL / Count-Min sketch operators: register-level equality vs a
pure-Python reference, estimator accuracy, CMS one-sided error, and
physical-plan shape (single shuffle, no Python eval nodes)."""

import hashlib
from collections import defaultdict

import pytest

from yacy_grid_crawler_spark.operators.sketches import (
    CMS_SALTS,
    CMS_BUCKET_HEX,
    dd_bins,
    dd_quantiles,
    HLL_M,
    HLL_NUMERATOR_CONST,
    HLL_PREFIX_HEX,
    RHO_CAP,
    RHO_HEX,
    cms_heavy_hitters,
    cms_sketch,
    hll_cardinality,
    hll_registers,
)


def _py_rho(h: str) -> int:
    window = h[HLL_PREFIX_HEX : HLL_PREFIX_HEX + RHO_HEX]
    stripped = window.lstrip("0")
    if not stripped:
        return RHO_CAP
    nib_lz = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}.get(
        stripped[0], 0
    )
    return 4 * (RHO_HEX - len(stripped)) + nib_lz + 1


def _py_registers(values):
    regs = defaultdict(int)
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        b = h[:HLL_PREFIX_HEX]
        regs[b] = max(regs[b], _py_rho(h))
    return dict(regs)


def test_hll_registers_match_python_reference(spark):
    vals = [f"url-{i}" for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        (r["bucket"], r["register"])
        for r in hll_registers(df, "v").collect()
    }
    want = set(_py_registers(vals).items())
    assert got == want


def test_hll_estimate_within_stderr(spark):
    # HLL stderr for m=256 is 1.04/sqrt(256) = 6.5%; allow 3 sigma.
    n = 5000
    df = spark.range(n).selectExpr("cast(id as string) AS v")
    row = hll_cardinality(df, "v").collect()[0]
    assert row["nonzero_registers"] <= HLL_M
    assert abs(row["hll_estimate"] - n) / n < 0.20
    # numerator is the exact integer the estimate divides into
    assert row["hll_estimate"] == pytest.approx(
        round(HLL_NUMERATOR_CONST / row["hll_numerator"], 4)
    )


def test_hll_registers_merge_across_partitions(spark):
    # sketch of the union == max-merge of per-half sketches
    a = spark.range(0, 3000).selectExpr("cast(id as string) AS v")
    b = spark.range(1500, 4500).selectExpr("cast(id as string) AS v")
    both = hll_registers(a.union(b), "v").collect()
    ra = {r["bucket"]: r["register"] for r in hll_registers(a, "v").collect()}
    rb = {r["bucket"]: r["register"] for r in hll_registers(b, "v").collect()}
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert {r["bucket"]: r["register"] for r in both} == merged


def test_hll_grouped(spark):
    # raw HLL (linear-counting correction deliberately omitted for
    # cross-engine determinism) is only accurate for n >> 2.5 m; use
    # group cardinalities in that range
    df = spark.createDataFrame(
        [("a", i % 1000) for i in range(5000)]
        + [("b", i) for i in range(5000)],
        "g string, v int",
    )
    out = {
        r["g"]: r["hll_estimate"]
        for r in hll_cardinality(df, "v", ["g"]).collect()
    }
    assert abs(out["a"] - 1000) / 1000 < 0.20
    assert abs(out["b"] - 5000) / 5000 < 0.20


def test_cms_overcount_never_negative(spark):
    tokens = spark.createDataFrame(
        [(f"tok{i % 100}",) for i in range(5000)], "item string"
    )
    rows = cms_heavy_hitters(tokens, "item", k=15).collect()
    assert len(rows) == 15
    for r in rows:
        assert r["cms_cnt"] >= r["exact_cnt"]
        assert r["overcount"] == r["cms_cnt"] - r["exact_cnt"]
    # with 100 distinct items in 4096 buckets collisions are ~nil:
    # the heavy hitters should be exact
    assert all(r["overcount"] == 0 for r in rows)


def test_cms_sketch_bounded_size(spark):
    tokens = spark.range(20000).selectExpr("cast(id % 7000 as string) AS item")
    n = cms_sketch(tokens, "item").count()
    assert n <= len(CMS_SALTS) * 16 ** CMS_BUCKET_HEX


def _py_dd_bin(v: int):
    e = v.bit_length() - 1
    q = ((v * 4) >> e) - 4
    return 4 * e + q, ((9 + 2 * q) << e) / 8.0


def test_dd_bins_match_python_reference(spark):
    vals = [1, 2, 3, 4, 5, 7, 8, 100, 1000, 12345, 2 ** 40 + 17]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        (r["bin_id"], r["bin_est"], r["cnt"])
        for r in dd_bins(df, "v").collect()
    }
    want = {}
    for v in vals:
        b, est = _py_dd_bin(v)
        want[(b, est)] = want.get((b, est), 0) + 1
    assert got == {(b, est, c) for (b, est), c in want.items()}


def test_dd_bins_domain_excludes_nonpositive_and_huge(spark):
    df = spark.createDataFrame(
        [(0,), (-5,), (2 ** 60,), (2 ** 61,), (10,)], "v long"
    )
    rows = dd_bins(df, "v").collect()
    assert sum(r["cnt"] for r in rows) == 1  # only v=10 kept


def test_dd_quantiles_relative_error_bound(spark):
    # quarter-log2 (linear-within-octave) bins guarantee <= 12.5%
    # worst-case midpoint error; check within one bin
    import math

    n = 10000
    df = spark.range(1, n + 1).selectExpr("id AS v", "'g' AS g")
    out = dd_quantiles(df, "v", ["g"]).collect()[0]
    assert out["n"] == n
    for p in (50, 90, 99):
        true = math.ceil(n * p / 100)
        assert abs(out[f"dd_p{p}"] - true) / true < 0.15


def test_dd_bins_merge_by_sum(spark):
    a = spark.range(1, 2000).selectExpr("id AS v")
    b = spark.range(1000, 5000).selectExpr("id AS v")
    both = {
        (r["bin_id"]): r["cnt"] for r in dd_bins(a.union(b), "v").collect()
    }
    ra = {r["bin_id"]: r["cnt"] for r in dd_bins(a, "v").collect()}
    rb = {r["bin_id"]: r["cnt"] for r in dd_bins(b, "v").collect()}
    merged = {k: ra.get(k, 0) + rb.get(k, 0) for k in set(ra) | set(rb)}
    assert both == merged


def test_sketch_plans_stay_jvm_side(spark):
    df = spark.range(1000).selectExpr("cast(id as string) AS v")
    plan = hll_registers(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one aggregation shuffle only
    assert plan.count("Exchange") == 1
    tokens = df.selectExpr("v AS item")
    plan2 = cms_sketch(tokens, "item")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2
    assert plan2.count("Exchange") == 1


def test_hll_set_overlap_inclusion_exclusion(spark):
    from yacy_grid_crawler_spark.operators.sketches import hll_set_overlap

    # A = 0..3999, B = 2000..5999 → |A∩B| = 2000, |A∪B| = 6000
    rows = [("a", i) for i in range(4000)] + [
        ("b", i) for i in range(2000, 6000)
    ]
    df = spark.createDataFrame(rows, "s string, v int")
    out = hll_set_overlap(df, "v", "s", "a", "b").collect()[0]
    assert abs(out["est_a"] - 4000) / 4000 < 0.20
    assert abs(out["est_b"] - 4000) / 4000 < 0.20
    assert abs(out["est_union"] - 6000) / 6000 < 0.20
    assert abs(out["est_intersection"] - 2000) / 2000 < 0.60  # diff of ests
    assert out["est_intersection"] == pytest.approx(
        round(out["est_a"] + out["est_b"] - out["est_union"], 4)
    )
