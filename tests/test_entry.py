"""Local replica of the driver's correctness gate: run every
`queries()` entry at sf0.01 and compare against `oracle_sql()` in
DuckDB — row count, column names, and order-insensitive value
equality."""

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, int):
        return int(v)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


QUERY_NAMES = None


def _pairs(entrymod):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return q, o


def test_all_oracle_keys_have_queries(entrymod):
    q, o = _pairs(entrymod)
    assert set(o) <= set(q)


# parametrize over EVERY oracle-backed query so a new queries()/
# oracle_sql() pair is replica-gated the moment it is registered —
# a hardcoded name list silently exempted late additions (conftest
# has already put the repo root on sys.path at collection time)
def _oracle_names():
    import __spark_entry__ as m

    return sorted(m.oracle_sql())


def _assert_plan_shape(name, df):
    """Plan-shape pin riding the oracle gate (round-3 verdict ask #7):
    after execution, the AQE-final plan must have zero cartesians and
    Python surfaces only where a kernel is intended (the measured set
    in plan_audit.INTENDED_PYTHON; PLANS.md is the full audit table).
    Runs on the already-executed df — costs one explain string."""
    import plan_audit

    f = plan_audit._features(df)
    assert f["cartesian"] == 0, f"{name}: CartesianProduct in plan"
    assert (
        f["python_surfaces"] == 0 or name in plan_audit.INTENDED_PYTHON
    ), (
        f"{name}: {f['python_surfaces']} Python surface(s) in a "
        "JVM-only query (update plan_audit.INTENDED_PYTHON only if "
        "a new kernel is intentional)"
    )


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(entrymod, spark, duck, name):
    q, o = _pairs(entrymod)
    sdf = q[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    _assert_plan_shape(name, sdf)
    rel = duck.sql(o[name])
    dcols = list(rel.columns)
    drows = rel.fetchall()
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column mismatch {scols} vs {dcols}"
    )
    sc, snorm = _normalize([c.lower() for c in scols], srows)
    dc, dnorm = _normalize([c.lower() for c in dcols], drows)
    assert len(snorm) == len(dnorm), f"{name}: rows {len(snorm)} vs {len(dnorm)}"
    for i, (a, b) in enumerate(zip(snorm, dnorm)):
        assert a == b, f"{name}: first diff at sorted row {i}: spark={a} duck={b}"


def test_rows_only_queries_run(entrymod, spark):
    q, o = _pairs(entrymod)
    for name in set(q) - set(o):
        df = q[name](spark, SF_DIR)
        assert df.count() >= 0, name
        _assert_plan_shape(name, df)


def test_entry_smoke(entrymod, spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "node_id" in df.columns and "first_depth" in df.columns


def test_multimodal_resize_and_frames(spark):
    """Resize / frame-sample plumbing: schemas, counts, determinism
    (stubbed decode, real Spark shape)."""
    import __spark_entry__ as e
    from yacy_grid_crawler_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        synth_media_from_docs,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .selectExpr("row_number() over (order by doc_id) as doc_id", "text",
                    "length(text) as n_chars")
    )
    media = synth_media_from_docs(docs).persist()
    n_img = media.filter("kind = 'image'").count()
    n_vid = media.filter("kind = 'video'").count()
    resized = resize_images(media, 32, 32, n_partitions=8)
    rows = resized.collect()
    assert len(rows) == n_img
    assert all(len(r["content"]) == 32 * 32 for r in rows)
    assert all(r["width"] == 32 and not r["decoded"] for r in rows)
    frames = sample_frames(media, every_ms=500, max_frames=4, n_partitions=8)
    fr = frames.collect()
    assert len(fr) > 0
    per = {}
    for r in fr:
        per.setdefault(r["media_id"], []).append(r)
    durations = {r["media_id"]: r["duration_ms"] for r in media.collect()}
    for mid, fs in per.items():
        expect = min(max(durations[mid] // 500, 1), 4)
        assert len(fs) == expect
        assert sorted(f["frame_no"] for f in fs) == list(range(expect))
        assert all(f["ts_ms"] == f["frame_no"] * 500 for f in fs)
    # determinism
    again = {(r["media_id"], r["frame_no"]): r["frame"] for r in frames.collect()}
    for r in fr:
        assert again[(r["media_id"], r["frame_no"])] == r["frame"]
    media.unpersist()


def test_query_caches_swept_between_queries(spark):
    """Operator-internal persists (minhash banded table, jaccard
    shingles) must not accumulate across queries() invocations: each
    call sweeps the previous query's caches."""
    import __spark_entry__ as e

    qs = e.queries()
    sf = "/root/testdata/sf0.001"
    jsc = spark.sparkContext._jsc.sc()
    # other tests in the shared session may hold persists
    # (e.g. localCheckpoint lineage cuts) — pin NO GROWTH, not zero
    baseline = jsc.getPersistentRDDs().size()
    qs["dedup_minhash_lsh"](spark, sf).count()
    assert len(e._QUERY_CACHES) == 1
    qs["dedup_ngram_jaccard"](spark, sf).count()
    # the minhash cache was swept when jaccard started
    assert len(e._QUERY_CACHES) == 1
    qs["token_count"](spark, sf).count()
    assert len(e._QUERY_CACHES) == 0
    assert jsc.getPersistentRDDs().size() <= baseline
