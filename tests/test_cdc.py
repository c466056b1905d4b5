"""Content-defined chunking: python-reference equality, the
edit-locality property CDC exists for (an edit only disturbs chunks
that touch it; everything else re-syncs), coverage invariants, and
plan shape. Cross-engine value equality is pinned by the oracle gate
(test_entry: cdc_chunks / cdc_savings)."""

import hashlib

from pyspark.sql import functions as F

from yacy_grid_crawler_spark.operators.dedup_text import (
    CDC_MASK,
    CDC_WINDOW,
    _CDC_COEF,
    cdc_chunks,
    cdc_savings,
)

SF_DIR = "/root/testdata/sf0.001"


def _ref_chunks(text: str, mask: int = CDC_MASK):
    """Independent scalar reference of the boundary rule."""
    n = len(text)
    if n == 0:
        return []
    c3, c2, c1, c0 = _CDC_COEF
    ends = []
    for i in range(CDC_WINDOW, n + 1):  # 1-based end positions
        g = [ord(c) for c in text[i - 4 : i]]
        if (c3 * g[0] + c2 * g[1] + c1 * g[2] + c0 * g[3]) % mask == 0:
            ends.append(i)
    if not ends or ends[-1] != n:
        ends.append(n)
    out, start = [], 0
    for chunk_no, e in enumerate(ends):
        piece = text[start:e]
        out.append(
            (chunk_no, hashlib.md5(piece.encode()).hexdigest(), e - start)
        )
        start = e
    return out


def test_cdc_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    got = sorted(
        (r["doc_id"], r["chunk_no"], r["chunk_md5"], r["chunk_len"])
        for r in cdc_chunks(docs).collect()
    )
    want = sorted(
        (r["doc_id"], *c)
        for r in docs.select("doc_id", "text").collect()
        for c in _ref_chunks(r["text"])
    )
    assert got == want
    assert got, "sample must produce chunks"


def test_cdc_coverage_invariants(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_doc = (
        cdc_chunks(docs)
        .groupBy("doc_id")
        .agg(
            F.sum("chunk_len").alias("covered"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_no").alias("max_no"),
        )
        .join(docs.select("doc_id", F.length("text").alias("n")), "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r["covered"] == r["n"]  # chunks tile the text exactly
        assert r["max_no"] == r["n_chunks"] - 1  # dense 0-based numbering


def test_cdc_edit_locality_append_and_prepend(spark):
    """Append: every chunk except the final one keeps its hash.
    Prepend: boundaries ride with content, so after the first
    post-edit boundary the chunk stream re-syncs — at most the
    leading chunk differs."""
    base = "the quick brown fox jumps over the lazy dog. " * 40
    rows = [
        (1, base),
        (2, base + "EDIT-FOOTER"),
        (3, "EDIT-HEADER " + base),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    by_doc = {1: [], 2: [], 3: []}
    for r in cdc_chunks(df).collect():
        by_doc[r["doc_id"]].append((r["chunk_no"], r["chunk_md5"]))
    for k in by_doc:
        by_doc[k].sort()
    h1 = [h for _, h in by_doc[1]]
    h2 = [h for _, h in by_doc[2]]
    h3 = [h for _, h in by_doc[3]]
    assert len(h1) > 4, "base text must split into several chunks"
    # append: shared prefix of chunks is everything but the tail
    assert h2[: len(h1) - 1] == h1[: len(h1) - 1]
    # prepend: shared suffix after the first re-sync boundary
    assert h3[-(len(h1) - 1) :] == h1[-(len(h1) - 1) :]


def test_cdc_empty_and_short_texts(spark):
    rows = [(1, ""), (2, None), (3, "ab"), (4, "abcd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in cdc_chunks(df).collect()}
    assert 1 not in got and 2 not in got  # empty/null emit nothing
    assert got[3]["chunk_len"] == 2 and got[3]["chunk_no"] == 0
    assert got[4]["chunk_len"] == 4


def test_cdc_savings_math(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    both = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 10000000).alias("doc_id"), "text")
    )
    one = cdc_savings(cdc_chunks(docs.select("doc_id", "text"))).collect()[0]
    row = cdc_savings(cdc_chunks(both)).collect()[0]
    # doubling the corpus doubles totals but adds NO new unique chunks
    assert row["total_chunks"] == 2 * one["total_chunks"]
    assert row["total_chars"] == 2 * one["total_chars"]
    assert row["unique_chunks"] == one["unique_chunks"]
    assert row["unique_chars"] == one["unique_chars"]
    # at least half the doubled corpus is duplicate chars
    assert row["dup_char_ppm"] >= 500000
    expect = (
        (row["total_chars"] - row["unique_chars"])
        * 1000000
        // row["total_chars"]
    )
    assert row["dup_char_ppm"] == expect


def test_cdc_plan_shape(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sav = cdc_savings(cdc_chunks(docs))
    plan = sav._sc._jvm.PythonSQLUtils.explainString(
        sav._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    # the only Python surface is the Arrow-batched chunking kernel
    # (formatted explain names each node twice: tree + detail section)
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas (") <= 1


def test_cdc_change_rate_semantics(spark):
    """Unchanged -> 0 bp; disjoint rewrite -> 10000 bp; a small append
    scores low; deleted/new docs score 10000 against an empty side."""
    from yacy_grid_crawler_spark.operators.dedup_text import (
        cdc_change_rate,
    )

    base = "the quick brown fox jumps over the lazy dog. " * 30
    old = spark.createDataFrame(
        [(1, base), (2, base), (3, base), (4, base), (5, "")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),                      # unchanged
            (2, base + " EDIT-FOOTER"),     # small append
            (3, "Z" * len(base)),           # full rewrite, same size
            # 4 deleted (no new row), 5 empty both sides
            (5, ""),
            (6, base),                      # newly discovered doc
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in cdc_change_rate(cdc_chunks(old), cdc_chunks(new)).collect()
    }
    assert got[1]["changed_bp"] == 0
    assert 0 < got[2]["changed_bp"] < 2000
    assert got[3]["changed_bp"] == 10000
    assert got[4]["changed_bp"] == 10000 and got[4]["new_chars"] == 0
    assert got[6]["changed_bp"] == 10000 and got[6]["old_chars"] == 0
    assert 5 not in got  # empty in both versions -> no chunks, no row
    # integer law: bp = 10000 - 10000*shared // max(old, new)
    for r in got.values():
        assert r["changed_bp"] == 10000 - (10000 * r["shared_chars"]) // max(
            r["old_chars"], r["new_chars"]
        )


def test_cdc_string_doc_ids(spark):
    """cdc_chunks must propagate the input's doc_id type (advice
    item): string-id corpora chunk identically to long-id ones."""
    from yacy_grid_crawler_spark.operators.dedup_text import cdc_chunks

    text = "the quick brown fox jumps over the lazy dog " * 8
    longs = spark.createDataFrame(
        [(7, text)], "doc_id long, text string"
    )
    strings = spark.createDataFrame(
        [("doc-7", text)], "doc_id string, text string"
    )
    got_s = cdc_chunks(strings).collect()
    got_l = cdc_chunks(longs).collect()
    assert cdc_chunks(strings).schema["doc_id"].dataType.simpleString() == "string"
    assert {r["doc_id"] for r in got_s} == {"doc-7"}
    key = lambda r: (r["chunk_no"], r["chunk_md5"], r["chunk_len"])
    assert sorted(map(key, got_s)) == sorted(map(key, got_l))
