"""Training-data pipeline operators added in round 3: near-dup
connected-components clustering, benchmark decontamination, PII
scrub, and Gopher-style repetition stats. The sf-table oracles check
dialect equality; these tests pin the SEMANTICS on crafted rows."""

from pyspark.sql import functions as F


def test_duplicate_clusters_transitive_closure(spark):
    """A-B and B-C pairs must land A, B, C in ONE cluster labeled by
    the min doc_id, with untouched docs as singletons — including a
    longer chain that needs several propagation rounds."""
    from yacy_grid_crawler_spark.operators.dedup_text import duplicate_clusters

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 8), (8, 9), (6, 9)],
        "doc_a long, doc_b long",
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(docs, pairs=pairs).collect()
    }
    assert out == {
        0: 0, 4: 4,          # singletons
        1: 1, 2: 1, 3: 1,    # chain 1-2-3
        5: 5, 6: 5, 7: 5, 8: 5, 9: 5,  # 5-6, 7-8-9 bridged by 6-9
    }


def test_decontaminate_overlap_flags_shared_ngrams(spark):
    from yacy_grid_crawler_spark.operators.dedup_text import decontaminate_overlap

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox yesterday evening"),  # shares 4-gram
            (2, "completely different words in this one here"),
            (3, "quick brown fox jumps again and again today"),   # shares 4-gram
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate_overlap(train, benchmark=bench, n=4).collect()
    }
    assert out[1][1] and out[3][1] and not out[2][1]
    assert out[1][0] >= 1 and out[2][0] == 0


def test_pii_scrub_masks_and_counts(spark):
    from yacy_grid_crawler_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail alice@example.com and bob@sub.example.org end"),
            (2, "server at 192.168.1.100 and 10.0.0.1 up"),
            (3, "ssn 123-45-6789 leaked"),
            (4, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_ssns"]) == (2, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_ssns"]) == (0, 2, 0)
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_ssns"]) == (0, 0, 1)
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_ssns"]) == (0, 0, 0)
    # masking actually changed the hash for PII rows, not for clean
    import hashlib

    assert out[4]["masked_md5"] == hashlib.md5(
        b"clean text with no pii at all"
    ).hexdigest()
    assert out[3]["masked_md5"] == hashlib.md5(b"ssn <SSN> leaked").hexdigest()
    assert out[1]["masked_md5"] == hashlib.md5(
        b"mail <EMAIL> and <EMAIL> end"
    ).hexdigest()


def test_repetition_stats_thresholds(spark):
    from yacy_grid_crawler_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["flagged"] and out[1]["dup_word_frac"] > 0.8
    assert out[1]["top_bigram_frac"] == 1.0  # every bigram is "spam spam"
    assert not out[2]["flagged"] and out[2]["dup_word_frac"] == 0.0
    assert out[3]["n_words"] == 0 and not out[3]["flagged"]


def test_pagerank_scaled_exact_small_graph(spark):
    """Hand-computed s_t on a 3-cycle: every node has in-degree 1 from
    the cycle, so s_{t+1} = 3*6^t + s_t uniformly."""
    from yacy_grid_crawler_spark.operators.graph import pagerank_scaled

    docs = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    out = {r["doc_id"]: r["pr_scaled"] for r in
           pagerank_scaled(docs, edges=edges, iters=3).collect()}
    # s0=1, s1=3+1=4, s2=18+4=22, s3=108+22=130, same for all nodes
    assert out == {0: 130, 1: 130, 2: 130}
    # a sink-heavy graph concentrates rank: 0->2, 1->2
    edges2 = spark.createDataFrame([(0, 2), (1, 2)], "src long, dst long")
    out2 = {r["doc_id"]: r["pr_scaled"] for r in
            pagerank_scaled(docs, edges=edges2, iters=2).collect()}
    # s1: nodes 0,1 = 3; node 2 = 3+2=5. s2: 0,1 = 18; 2 = 18+3+3=24
    assert out2 == {0: 18, 1: 18, 2: 24}


def test_dataset_split_deterministic_and_partitioned(spark):
    from yacy_grid_crawler_spark.operators.sampling import (
        dataset_split, sample_hash,
    )

    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = dataset_split(docs).collect()
    frac = {s: 0 for s in ("train", "val", "test")}
    for r in out:
        frac[r["split"]] += 1
    assert 0.75 < frac["train"] / 2000 < 0.85
    assert 0.06 < frac["val"] / 2000 < 0.15
    assert 0.06 < frac["test"] / 2000 < 0.15
    # rerun → identical assignment (no RNG anywhere)
    again = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in out)
    # hash sampling is a subset relation as the rate grows
    s64 = {r["doc_id"] for r in sample_hash(docs, 64).collect()}
    s128 = {r["doc_id"] for r in sample_hash(docs, 128).collect()}
    assert s64 < s128 and 0.15 < len(s64) / 2000 < 0.35


def test_pack_shards_distributed_equals_window(spark):
    from yacy_grid_crawler_spark.operators.sampling import pack_shards

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 37) % 900 + 100).alias("n_tokens")
    )
    caches = []
    a = {r["doc_id"]: r["shard_id"] for r in
         pack_shards(docs, 2500, distributed=False).collect()}
    b = {r["doc_id"]: r["shard_id"] for r in
         pack_shards(docs, 2500, distributed=True, cache_registry=caches).collect()}
    assert a == b
    for c in caches:
        c.unpersist()
    # shards are contiguous in doc order and roughly budget-sized
    shards = sorted(set(a.values()))
    assert shards == list(range(len(shards))) and len(shards) > 50


def test_line_dedup_drops_corpus_frequent_lines(spark):
    """Lines above the corpus frequency threshold vanish; per-doc
    unique lines survive in original order (md5 checked against a
    hand-built cleaned text); all-boilerplate docs still emit a row
    with md5('')."""
    import hashlib

    from yacy_grid_crawler_spark.operators.textstats import line_dedup

    boiler = "subscribe now"
    docs = spark.createDataFrame(
        [
            (0, f"{boiler}\nalpha zero\n\n  {boiler}  \nomega zero"),
            (1, f"beta one\n{boiler}"),
            (2, f"{boiler}"),          # only boilerplate -> md5('')
            (3, "gamma three"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, max_freq=2).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # boiler appears 4x (> 2) -> dropped everywhere; empty line dropped
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (4, 2)
    assert out[0]["cleaned_md5"] == md5("alpha zero\nomega zero")
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (2, 1)
    assert out[1]["cleaned_md5"] == md5("beta one")
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (1, 0)
    assert out[2]["cleaned_md5"] == md5("")
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (1, 1)
    assert out[3]["cleaned_md5"] == md5("gamma three")


def test_tfidf_topk_ranks_rare_terms_first(spark):
    """A term unique to one doc outranks a corpus-wide term; scores
    are the exact integers tf * (1e6 * n_docs DIV df); rnk caps at k
    with deterministic term tie-break."""
    from yacy_grid_crawler_spark.operators.textstats import tfidf_topk

    docs = spark.createDataFrame(
        [
            (0, "common rare common"),
            (1, "common common"),
            (2, "common solo"),
            (3, "common"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in by_doc.values():
        d.sort(key=lambda r: r["rnk"])
    # doc 0: rare (tf=1, df=1 -> idf 4_000_000) beats common
    # (tf=2, df=4 -> idf 1_000_000 -> score 2_000_000)
    assert [r["term"] for r in by_doc[0]] == ["rare", "common"]
    assert by_doc[0][0]["score"] == 4_000_000
    assert by_doc[0][1]["score"] == 2_000_000
    assert [r["term"] for r in by_doc[2]] == ["solo", "common"]
    # every doc emits at most k rows, rnk is 1..k dense
    for d, rs in by_doc.items():
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 2


def test_canonical_docs_keeps_best_quality_per_cluster(spark):
    """Keeper = max quality within the cluster, ties to the smallest
    doc_id; singletons keep themselves; n_members counts the whole
    component."""
    from yacy_grid_crawler_spark.operators.dedup_text import canonical_docs

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    quality = spark.createDataFrame(
        [(0, 0.5), (1, 0.9), (2, 0.9), (3, 0.1), (4, 0.7), (5, 0.7)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a long, doc_b long"
    )
    out = {
        r["cluster_id"]: r
        for r in canonical_docs(docs, quality, pairs=pairs).collect()
    }
    # cluster 0 = {0,1,2}: quality tie 1 vs 2 at 0.9 -> smaller doc_id 1
    assert (out[0]["keep_doc_id"], out[0]["n_members"]) == (1, 3)
    assert out[0]["keep_quality"] == 0.9
    # cluster 4 = {4,5}: tie 0.7 -> doc 4
    assert (out[4]["keep_doc_id"], out[4]["n_members"]) == (4, 2)
    # singleton keeps itself
    assert (out[3]["keep_doc_id"], out[3]["n_members"]) == (3, 1)


def test_stratified_sample_rates_and_determinism(spark):
    """Rate 256 keeps every row, rate 0 keeps none, intermediate rates
    follow the md5-bucket threshold; re-running yields the identical
    keep-set (no RNG)."""
    from yacy_grid_crawler_spark.operators.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, ["keep_all", "drop_all", "half"][i % 3]) for i in range(300)],
        "doc_id long, source string",
    )
    rates = {"keep_all": 256, "drop_all": 0, "half": 128}
    out = stratified_sample(docs, rates).collect()
    kept = {r["doc_id"] for r in out if r["keep"]}
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert all(r["keep"] for r in by_src["keep_all"])
    assert not any(r["keep"] for r in by_src["drop_all"])
    half = by_src["half"]
    assert all(r["keep"] == (r["bucket"] < "80") for r in half)
    assert 0 < sum(r["keep"] for r in half) < len(half)
    again = {
        r["doc_id"]
        for r in stratified_sample(docs, rates).collect()
        if r["keep"]
    }
    assert again == kept


def test_lm_score_unigram_math(spark):
    """Hand-checked add-one-smoothed unigram scores on a 2-doc corpus:
    'a a b' + 'a c' -> N=5 tokens, V=3 vocab, denom=8;
    p(a)=4/8, p(b)=2/8, p(c)=2/8."""
    import math

    from yacy_grid_crawler_spark.operators.textstats import lm_score

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "123 !!")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert set(out) == {1, 2}  # doc 3 has no alphabetic tokens
    pa, pb = 4 / 8, 2 / 8
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_neg_logprob"] == round(
        -(math.log(pa) * 2 + math.log(pb)) / 3, 4
    )
    assert out[2]["n_tokens"] == 2
    assert out[2]["avg_neg_logprob"] == round(
        -(math.log(pa) + math.log(pb)) / 2, 4
    )
    # the common-word doc scores LOWER (better) than the rare-word mix
    assert out[1]["avg_neg_logprob"] < out[2]["avg_neg_logprob"]


def test_link_host_stats_distinct_vs_total(spark):
    """Link farm vs organic authority: b.com gets 3 inlinks from ONE
    host; c.com gets 2 inlinks from two distinct hosts."""
    from yacy_grid_crawler_spark.operators.graph import link_host_stats

    links = spark.createDataFrame(
        [
            ("http://a.com/1", "http://b.com/x"),
            ("http://a.com/2", "http://b.com/x"),
            ("http://a.com/3", "http://b.com/y"),
            ("http://a.com/1", "http://c.com/z"),
            ("http://d.com/1", "http://c.com/z"),
        ],
        "src_url string, dst_url string",
    )
    out = {r["dst_host"]: r for r in link_host_stats(links).collect()}
    assert out["b.com"]["n_inlinks"] == 3
    assert out["b.com"]["n_src_hosts"] == 1
    assert out["b.com"]["n_dst_urls"] == 2
    assert out["c.com"]["n_inlinks"] == 2
    assert out["c.com"]["n_src_hosts"] == 2
    assert out["c.com"]["n_dst_urls"] == 1


def test_anchor_stats_modal_pick_and_tiebreak(spark):
    """Modal anchor wins; equal-count ties break to the
    lexicographically smallest text (deterministic output)."""
    from yacy_grid_crawler_spark.operators.graph import anchor_stats

    links = spark.createDataFrame(
        [
            # t1: 'home' x2 beats 'start' x1
            ("http://a.com/1", "http://t.com/1", "home"),
            ("http://b.com/1", "http://t.com/1", "home"),
            ("http://c.com/1", "http://t.com/1", "start"),
            # t2: 2-2 tie -> 'alpha' < 'beta'
            ("http://a.com/2", "http://t.com/2", "beta"),
            ("http://b.com/2", "http://t.com/2", "beta"),
            ("http://c.com/2", "http://t.com/2", "alpha"),
            ("http://d.com/2", "http://t.com/2", "alpha"),
        ],
        "src_url string, dst_url string, anchor_text string",
    )
    out = {r["dst_url"]: r for r in anchor_stats(links).collect()}
    t1 = out["http://t.com/1"]
    assert (t1["n_anchors"], t1["n_unique_anchors"]) == (3, 2)
    assert (t1["top_anchor"], t1["top_anchor_n"]) == ("home", 2)
    t2 = out["http://t.com/2"]
    assert (t2["n_anchors"], t2["n_unique_anchors"]) == (4, 2)
    assert (t2["top_anchor"], t2["top_anchor_n"]) == ("alpha", 2)


def test_host_cap_sample_exact_cap_and_distributed_equality(spark):
    """The cap binds exactly (min(count, cap) rows per host), the
    selection is deterministic, and the distributed two-phase rank
    equals the window form row-for-row."""
    from yacy_grid_crawler_spark.operators.sampling import host_cap_sample

    docs = spark.createDataFrame(
        [(i, f"h{i % 3}") for i in range(100)] + [(1000, "lonely")],
        "doc_id long, host string",
    )
    caches: list = []
    win = host_cap_sample(docs, cap=10).collect()
    dist = host_cap_sample(
        docs, cap=10, distributed=True, cache_registry=caches
    ).collect()
    for c in caches:
        c.unpersist()
    key = lambda r: (r["host"], r["host_rank"], r["doc_id"])  # noqa: E731
    assert sorted(map(key, win)) == sorted(map(key, dist))
    by_host = {}
    for r in win:
        by_host.setdefault(r["host"], []).append(r)
    assert {h: len(v) for h, v in by_host.items()} == {
        "h0": 10, "h1": 10, "h2": 10, "lonely": 1,
    }
    assert sorted(r["host_rank"] for r in by_host["h0"]) == list(range(10))
    again = sorted(map(key, host_cap_sample(docs, cap=10).collect()))
    assert again == sorted(map(key, win))


def test_simhash_near_pairs_banded_equals_all_pairs(spark):
    """Pigeonhole band blocking must be EXACT for hamming <= k: the
    banded equi-join's pairs equal the quadratic all-pairs scan over
    the same signatures — recall 1.0, not an approximation — and the
    reported hamming is bit_count(sig_a ^ sig_b)."""
    from yacy_grid_crawler_spark.operators.dedup_text import (
        simhash_docs,
        simhash_near_pairs,
    )

    # near-identical doc pairs (one word swapped) + unrelated docs
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = []
    for i in range(20):
        rows.append((2 * i, base + f" token{i}"))
        rows.append((2 * i + 1, base + f" token{i} extra"))
    for i in range(40, 60):
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    banded = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(docs, max_hamming=3).collect()
    }
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_docs(docs).collect()}
    brute = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                brute[(a, b)] = h
    assert banded == brute
    assert brute, "fixture must actually produce near-dup pairs"


def test_chunk_documents_overlap_and_partial_tail(spark):
    """Sliding windows: chunk k starts step tokens after chunk k-1 and
    repeats the last `overlap` tokens of its predecessor; the final
    partial window is kept; tokenless docs emit nothing."""
    from yacy_grid_crawler_spark.operators.sampling import chunk_documents

    text = " ".join(f"t{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(1, text), (2, "one two"), (3, "   ")],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(docs, chunk_tokens=10, overlap=4).collect(),
        key=lambda r: (r["doc_id"], r["chunk_no"]),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc
    assert [r["n_tokens"] for r in by_doc[2]] == [2]
    c = by_doc[1]
    # starts 0, 6, 12, 18, 24 -> sizes 10, 10, 10, 7, 1
    assert [r["chunk_no"] for r in c] == [0, 1, 2, 3, 4]
    assert [r["n_tokens"] for r in c] == [10, 10, 10, 7, 1]
    assert c[0]["chunk_text"].split(" ") == [f"t{i}" for i in range(10)]
    # overlap: last 4 tokens of chunk 0 == first 4 of chunk 1
    assert c[0]["chunk_text"].split(" ")[6:] == c[1]["chunk_text"].split(" ")[:4]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_scrub_duplicate_blocks_first_occurrence_wins(spark):
    """Span-level dedup: a block's first corpus occurrence (min
    doc_id, then min chunk_no) survives; every later exact copy is
    cut out of its document, the remaining blocks reassemble in
    order, and a fully-duplicated doc keeps its row with ''."""
    from yacy_grid_crawler_spark.operators.dedup_text import (
        scrub_duplicate_blocks,
    )

    A = "a1 a2 a3 a4"
    B = "b1 b2 b3 b4"
    C = "c1 c2 c3 c4"
    docs = spark.createDataFrame(
        [
            (0, f"{A} {B}"),          # first occurrence of A and B
            (1, f"{B} {C}"),          # B is a dup, C novel
            (2, A),                   # fully duplicated -> ''
            (3, f"{A} {A}"),          # within-doc dup: both copies dropped
            (4, "   "),               # tokenless -> no row
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in scrub_duplicate_blocks(docs, block_tokens=4).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["scrubbed_text"] == f"{A} {B}"
    assert (out[0]["n_blocks_kept"], out[0]["n_blocks_dropped"]) == (2, 0)
    assert out[1]["scrubbed_text"] == C
    assert (out[1]["n_blocks_kept"], out[1]["n_blocks_dropped"]) == (1, 1)
    assert out[2]["scrubbed_text"] == ""
    assert (out[2]["n_blocks_kept"], out[2]["n_blocks_dropped"]) == (0, 1)
    assert out[3]["scrubbed_text"] == ""
    assert (out[3]["n_blocks_kept"], out[3]["n_blocks_dropped"]) == (0, 2)


def test_source_quality_rollup_cross_source_dups_and_verdict(spark):
    """Dup counting is corpus-wide (a text mirrored across two sources
    marks BOTH rows dup); dup_fraction and avg_quality are per source;
    low_quality tracks the threshold."""
    from yacy_grid_crawler_spark.operators.textstats import (
        quality_score,
        source_quality_rollup,
    )

    good = "the quick brown fox and the lazy dog is of to in a tale"
    docs = spark.createDataFrame(
        [
            (0, good, "s0"),
            (1, good, "s1"),            # cross-source mirror of doc 0
            (2, "zz zz zz !!!!", "s1"), # junk, unique
            (3, "unique prose of the day is here", "s0"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in source_quality_rollup(docs, 0.5).collect()}
    assert out["s0"]["n_docs"] == 2 and out["s1"]["n_docs"] == 2
    assert out["s0"]["dup_docs"] == 1 and out["s1"]["dup_docs"] == 1
    assert out["s0"]["dup_fraction"] == 0.5
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert out["s1"]["avg_quality"] == round((q[1] + q[2]) / 2, 4)
    assert not out["s0"]["low_quality"]
    ws = len(good.split()) + len("unique prose of the day is here".split())
    assert out["s0"]["total_ws_tokens"] == ws


def test_normalize_text_collapses_and_strips(spark):
    from yacy_grid_crawler_spark.operators.textstats import normalize_text

    docs = spark.createDataFrame(
        [
            (0, "  Hello\tWorldé  X  "),
            (1, "A\nB\r\nC"),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert out[0]["norm_text"] == "hello world x"
    assert out[1]["norm_text"] == "a b c"
    assert out[2]["norm_text"] == "" and out[2]["n_chars_norm"] == 0


def test_temperature_resample_rates_and_determinism(spark):
    """Smallest source is kept whole; a 4x-larger source is kept at
    (1/4)^0.5 = 1/2 via the exact 16-bit md5 threshold; alpha=1 is a
    no-op. Kept set matches the hashlib reference doc-by-doc."""
    import hashlib

    from yacy_grid_crawler_spark.operators.sampling import (
        temperature_resample,
    )

    rows = [(i, "big") for i in range(800)] + [
        (i, "small") for i in range(800, 1000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = {
        r["doc_id"]: r["source"]
        for r in temperature_resample(docs, alpha=0.5).collect()
    }
    assert sum(1 for s in kept.values() if s == "small") == 200
    thr = int((200 / 800) ** 0.5 * 65536)  # = 32768
    for i in range(800):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
        assert (i in kept) == (u < thr)
    assert temperature_resample(docs, alpha=1.0).count() == 1000
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_resample(docs, alpha=1.5)


def test_minhash_jaccard_estimate_bounds_and_identity(spark):
    """Identical docs estimate j=1.0; estimates live on the k/8 grid;
    every LSH candidate pair gets exactly one estimate row."""
    from yacy_grid_crawler_spark.operators.dedup_text import (
        minhash_jaccard_estimates,
        minhash_lsh_pairs,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, text),
            (2, text),
            (3, text + " extra words tacked on here now"),
            (4, "completely different content with no shared shingles at all"),
        ],
        "doc_id long, text string",
    )
    est = minhash_jaccard_estimates(docs).collect()
    got = {(r["doc_a"], r["doc_b"]): r["j_est"] for r in est}
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    assert set(got) == pairs
    assert got[(1, 2)] == 1.0
    for v in got.values():
        assert 0.0 <= v <= 1.0 and round(v * 8, 9) == int(round(v * 8))


def test_pack_sequences_full_coverage_and_splits(spark):
    """Every sequence except the last is exactly seq_len full, the
    virtual token stream is covered with no gaps or overlaps, and a
    doc wider than seq_len splits with consistent offsets; the
    distributed two-phase prefix sum equals the window form."""
    from yacy_grid_crawler_spark.operators.sampling import pack_sequences

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 53) % 700 + 1).alias("n_tokens"),
    )
    caches = []
    key = ["seq_id", "doc_id", "doc_tok_start", "seq_tok_start", "n_toks"]
    a = sorted(
        tuple(r[c] for c in key)
        for r in pack_sequences(docs, 256, distributed=False).collect()
    )
    b = sorted(
        tuple(r[c] for c in key)
        for r in pack_sequences(
            docs, 256, distributed=True, cache_registry=caches
        ).collect()
    )
    assert a == b
    for c in caches:
        c.unpersist()

    total = sum(r[4] for r in a)
    per_seq = {}
    for seq_id, doc_id, dstart, sstart, n in a:
        assert n > 0
        per_seq.setdefault(seq_id, []).append((sstart, n))
    last = max(per_seq)
    for seq_id, segs in per_seq.items():
        segs.sort()
        # contiguous within the sequence, starting at 0
        pos = 0
        for sstart, n in segs:
            assert sstart == pos
            pos += n
        if seq_id != last:
            assert pos == 256
    assert total == sum(((i * 53) % 700 + 1) for i in range(200))
    # at least one doc (n_tokens can be up to 700 > 256) split across seqs
    from collections import Counter
    doc_counts = Counter(doc_id for _, doc_id, *_ in a)
    assert max(doc_counts.values()) >= 2
    # split pieces tile the doc: doc_tok_starts are the running sums
    for doc_id, cnt in doc_counts.items():
        pieces = sorted(
            (r[2], r[4]) for r in a if r[1] == doc_id
        )
        pos = 0
        for dstart, n in pieces:
            assert dstart == pos
            pos += n


def test_verified_near_dup_pairs_confirms_and_rejects(spark):
    """LSH proposes candidates; exact edit distance keeps true near
    dups and rejects hash-collision false positives. Identical docs
    score 1.0; a one-word edit scores just under; unrelated docs that
    happen to band-collide are filtered out."""
    from yacy_grid_crawler_spark.operators.dedup_text import (
        verified_near_dup_pairs,
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                                   # exact dup of 1
            (3, base.replace("lazy", "busy", 1)),        # near dup
            (4, "completely different content here with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    caches = []
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in verified_near_dup_pairs(
            docs, min_sim=0.8, cache_registry=caches
        ).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, cache_registry=caches).collect()
    }
    for c in caches:
        c.unpersist()
    assert (1, 2) in out and out[(1, 2)]["edit_distance"] == 0
    assert out[(1, 2)]["edit_sim"] == 1.0
    assert (1, 3) in out and 0 < out[(1, 3)]["edit_distance"] <= 4
    # verified output is a subset of the LSH candidates
    assert set(out) <= cand
    assert all(p[0] != 4 and p[1] != 4 for p in out)


def test_incremental_novelty_flags_corpus_dups(spark):
    """A new batch deduped against an existing corpus: an exact dup of
    a corpus doc is non-novel with first_match = that doc; a fresh doc
    is novel; per-doc verdicts are independent of batch composition."""
    from yacy_grid_crawler_spark.operators.dedup_text import (
        incremental_novelty,
    )

    body = "alpha beta gamma delta epsilon zeta eta theta " * 3
    corpus = spark.createDataFrame(
        [(1, body), (2, "one two three four five six seven eight " * 3)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, body),  # dup of corpus doc 1
            (11, "nine ten eleven twelve thirteen fourteen fifteen sixteen " * 3),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in incremental_novelty(new, corpus).collect()}
    assert out[10]["novel"] is False and out[10]["first_match"] == 1
    assert out[10]["n_dup_candidates"] == 1
    assert out[11]["novel"] is True and out[11]["first_match"] is None


def test_corpus_stats_exact_quantiles(spark):
    """Exact percentile semantics: linear interpolation between order
    statistics, per group; approximate variant returns same schema."""
    from yacy_grid_crawler_spark.operators.textstats import corpus_stats

    docs = spark.createDataFrame(
        [(i, "en" if i < 5 else "de", f"s{i % 2}", v)
         for i, v in enumerate([1, 2, 3, 4, 10, 7, 7, 7])],
        "doc_id long, lang string, source string, n_chars long",
    )
    out = {r["lang"]: r for r in corpus_stats(docs).collect()}
    assert out["en"]["n_docs"] == 5 and out["en"]["n_sources"] == 2
    assert out["en"]["p50_chars"] == 3.0
    assert abs(out["en"]["p90_chars"] - 7.6) < 1e-9
    assert out["de"]["p50_chars"] == 7.0 and out["de"]["total_chars"] == 21
    approx = corpus_stats(docs, approximate=True)
    assert approx.columns == corpus_stats(docs).columns
    assert approx.count() == 2


def test_inverted_index_df_cap_and_sorted_postings(spark):
    """df-cap drops stopword-grade terms BEFORE any posting list is
    collected; postings are sorted and capped; df stays exact."""
    from yacy_grid_crawler_spark.operators.textstats import inverted_index

    docs = spark.createDataFrame(
        [
            ("d1", "the quick fox"),
            ("d2", "the lazy dog"),
            ("d3", "the fox fox jumps"),  # repeated term: one posting
            ("d4", "the dog naps"),
        ],
        "doc_id string, text string",
    )
    out = {r["term"]: r for r in
           inverted_index(docs, df_cap=2, postings_cap=2).collect()}
    assert "the" not in out  # df=4 > cap: stopword skip-listed
    assert out["fox"]["df"] == 2 and out["fox"]["postings"] == "d1|d3"
    assert out["dog"]["postings"] == "d2|d4"
    assert out["quick"]["df"] == 1 and out["quick"]["n_postings"] == 1
    # postings_cap slices the list but df stays exact
    out1 = {r["term"]: r for r in
            inverted_index(docs, df_cap=2, postings_cap=1).collect()}
    assert out1["fox"]["df"] == 2 and out1["fox"]["postings"] == "d1"
    assert out1["fox"]["n_postings"] == 1


def test_batch_search_ranks_by_tfidf_overlap(spark):
    """Docs sharing more (and rarer) query terms rank higher; df-cap
    drops corpus-wide terms from scoring; ties break on doc_id."""
    from yacy_grid_crawler_spark.operators.textstats import batch_search

    docs = spark.createDataFrame(
        [
            ("d1", "apple banana cherry"),
            ("d2", "apple banana"),
            ("d3", "apple"),
            ("d4", "durian elderberry"),
            ("d5", "common common common"),  # 'common' appears everywhere
            ("d6", "common apple"),
        ],
        "doc_id string, text string",
    )
    queries = spark.createDataFrame(
        [(1, "apple banana cherry"), (2, "durian")],
        "query_id long, qtext string",
    )
    # dfs: apple=4 (>cap 3, dropped), banana=2, cherry=1, durian=1,
    # common=2 (not a query term)
    out = batch_search(docs, queries, k=3, df_cap=3)
    rows = {(r["query_id"], r["rnk"]): r for r in out.collect()}
    # q1: d1 matches banana+cherry (2 scorable terms) > d2 (banana);
    # d3/d6 only contain the capped 'apple' and get NO rank at all
    assert rows[(1, 1)]["doc_id"] == "d1"
    assert rows[(1, 1)]["n_terms_matched"] == 2
    assert rows[(1, 2)]["doc_id"] == "d2"
    assert rows[(1, 2)]["n_terms_matched"] == 1
    assert (1, 3) not in rows
    # q2: only d4 contains 'durian'
    assert rows[(2, 1)]["doc_id"] == "d4" and (2, 2) not in rows
    # tighter cap=1 also drops banana (df=2): only cherry scores
    out1 = batch_search(docs, queries, k=3, df_cap=1)
    r1 = {(r["query_id"], r["rnk"]): r for r in out1.collect()}
    assert r1[(1, 1)]["doc_id"] == "d1" and r1[(1, 1)]["n_terms_matched"] == 1
    assert (1, 2) not in r1  # no other doc has a df<=1 query term


def test_gopher_rules_each_gate_trips_independently(spark):
    """One doc per Gopher rule violation; every other gate holds, so
    each row isolates exactly the rule it plants (Rae et al. 2021
    §A1.1 semantics as implemented in textstats.gopher_rules)."""
    from yacy_grid_crawler_spark.operators.textstats import gopher_rules

    base = ("the quick brown fox jumps over that lazy dog and then "
            "walks off to be with friends who have seen it all before "
            "while many other animals watch from nearby fields today "
            "because nothing else moves anywhere near this place now "
            "truly") * 2  # ~100 words, mean len ~4, 5+ stopwords
    docs = spark.createDataFrame(
        [
            ("ok", base),
            ("short", "the of and that have with be to"),  # < 50 words
            ("symbols", base + " " + "# " * 30),  # symbol ratio > 0.1
            ("bullets", "- a point here today.\n- b point here too.\n"
             + base),  # 2/3 bullet lines? no: bullet_frac < 0.9 needs >=90%
            ("ellipsis", base + "\nmore...\nmore...\nmore..."),
            ("stopless", "alpha beta gamma delta epsilon zeta " * 20),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert out["ok"]["keep"] is True
    assert out["short"]["keep"] is False and out["short"]["n_words"] < 50
    assert out["symbols"]["keep"] is False
    assert out["symbols"]["symbol_ratio"] >= 0.1
    # 3 trailing '...' lines over 1 base line + 3 = 3/4 >= 0.3
    assert out["ellipsis"]["keep"] is False
    assert out["ellipsis"]["ellipsis_frac"] >= 0.3
    assert out["stopless"]["keep"] is False and out["stopless"]["stop_hits"] < 2
    # bullets row: only 2 of 3 lines are bullets (0.667 < 0.9) -> kept
    assert out["bullets"]["bullet_frac"] > 0.6
    assert out["bullets"]["keep"] is True
    # tightened threshold flips it
    tight = {r["doc_id"]: r for r in
             gopher_rules(docs, max_bullet_frac=0.5).collect()}
    assert tight["bullets"]["keep"] is False


def test_c4_clean_line_and_doc_gates(spark):
    """C4 §2.2: line filter (terminal punctuation + >=3 words), doc
    gates (>=3 sentences, no '{', no 'lorem ipsum'); cleaned_md5
    hashes kept lines joined by newline in original order."""
    import hashlib

    from yacy_grid_crawler_spark.operators.textstats import c4_clean

    good = ("First sentence stands alone.\n"
            "menu\n"                      # < 3 words -> dropped
            "click here now\n"            # no terminal punct -> dropped
            "Second sentence arrives intact.\n"
            "And a third one lands too!")
    docs = spark.createDataFrame(
        [
            ("good", good),
            ("code", good + "\nif (x) { return; }"),
            ("lorem", good + "\nLorem Ipsum dolor sit amet."),
            ("thin", "Only one sentence here friends."),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert out["good"]["keep_doc"] is True
    assert out["good"]["n_lines"] == 5 and out["good"]["n_kept"] == 3
    kept = ("First sentence stands alone.\n"
            "Second sentence arrives intact.\n"
            "And a third one lands too!")
    assert out["good"]["cleaned_md5"] == hashlib.md5(kept.encode()).hexdigest()
    assert out["code"]["keep_doc"] is False      # '{' anywhere kills the doc
    assert out["lorem"]["keep_doc"] is False     # case-insensitive match
    assert out["thin"]["keep_doc"] is False      # 1 sentence < 3
    assert out["thin"]["n_kept"] == 1


def test_html_extract_strips_scripts_decodes_entities(spark):
    from yacy_grid_crawler_spark.operators.extract import html_extract

    pages = spark.createDataFrame(
        [
            ("full",
             "<html><head><title> My\n  Page </title>"
             "<script>var a = '<p>not text</p>';</script>"
             "<style>p { x: y }</style></head>"
             "<body><h1>Head</h1><p>fish &amp; chips &lt;b&gt;</p>"
             "<a href='/x'>one</a><a  href='/y'>two</a>"
             "<img src='i'><img src='j'><!-- <a href='z'>c</a> -->"
             "</body></html>"),
            ("bare", "no tags at   all"),
            ("notitle", "<body><p>text.</p></body>"),
        ],
        "doc_id string, html string",
    )
    out = {r["doc_id"]: r for r in html_extract(pages).collect()}
    f = out["full"]
    assert f["title"] == "My Page"
    # script/style/comment content gone, entities decoded, ws collapsed
    assert f["text"] == 'Head fish & chips <b> one two'
    assert f["n_links"] == 2  # the commented-out anchor doesn't count
    assert f["n_images"] == 2
    assert out["bare"]["text"] == "no tags at all"
    assert out["bare"]["title"] == "" and out["bare"]["n_links"] == 0
    assert out["notitle"]["title"] == ""


def test_url_features_components(spark):
    from yacy_grid_crawler_spark.operators.graph import url_features

    urls = spark.createDataFrame(
        [
            ("http://a.b.host123.example.org:8080/x/y/z/page.HTML?a=1&b=2",),
            ("http://example.org/",),
            ("http://127x.example.org/file.tar.gz",),
        ],
        "url string",
    )
    out = {r["url"]: r for r in url_features(urls).collect()}
    r = out["http://a.b.host123.example.org:8080/x/y/z/page.HTML?a=1&b=2"]
    assert r["host_len"] == len("a.b.host123.example.org")
    assert r["n_subdomains"] == 3
    assert r["path_depth"] == 4 and r["n_query_params"] == 2
    assert r["has_port"] is True and r["ext"] == "html"
    assert abs(r["host_digit_ratio"] - 3 / 23) < 1e-3
    root = out["http://example.org/"]
    assert root["path_depth"] == 0 and root["ext"] == ""
    assert root["has_port"] is False and root["n_query_params"] == 0
    gz = out["http://127x.example.org/file.tar.gz"]
    assert gz["ext"] == "gz"  # extension after the LAST dot
    assert gz["host_digit_ratio"] > 0.1


def test_corpus_shuffle_dense_permutation_and_distributed_equality(spark):
    from yacy_grid_crawler_spark.operators.sampling import corpus_shuffle

    docs = spark.createDataFrame(
        [(f"doc{i:03d}",) for i in range(97)], "doc_id string"
    )
    dist = corpus_shuffle(docs, seed="s1").collect()
    # dense 0..n-1 permutation, ordered by the md5 key
    assert sorted(r["shuffle_pos"] for r in dist) == list(range(97))
    by_key = sorted(dist, key=lambda r: r["shuffle_key"])
    assert [r["shuffle_pos"] for r in by_key] == list(range(97))
    # window formulation is bit-identical
    win = corpus_shuffle(docs, seed="s1", distributed=False).collect()
    assert {(r["doc_id"], r["shuffle_pos"]) for r in win} == {
        (r["doc_id"], r["shuffle_pos"]) for r in dist
    }
    # a different seed is a different permutation of the same set
    other = corpus_shuffle(docs, seed="s2").collect()
    assert {r["doc_id"] for r in other} == {r["doc_id"] for r in dist}
    assert {(r["doc_id"], r["shuffle_pos"]) for r in other} != {
        (r["doc_id"], r["shuffle_pos"]) for r in dist
    }


def test_top_ngrams_counts_and_tiebreak(spark):
    from yacy_grid_crawler_spark.operators.textstats import top_ngrams

    docs = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("a dog",), ("x",)],
        "text string",
    )
    rows = top_ngrams(docs, n=2, k=3).collect()
    assert [(r["ngram"], r["n_occurrences"]) for r in rows] == [
        ("the cat", 2),       # top by count
        ("a dog", 1),          # count-1 ties broken alphabetically
        ("cat ran", 1),
    ]
    # n longer than any doc -> empty, not an error
    assert top_ngrams(docs, n=5, k=3).count() == 0


def test_dup_spans_exact_substring_semantics(spark):
    """Lee-et-al exact-substring spans: a shared 5-gram marks the
    window in BOTH docs; a shared 7-token run's three overlapping
    shingles merge into ONE maximal span; far-apart duplicated
    shingles stay separate spans; self-repetition within one doc
    counts; short (<k tokens) and all-unique docs emit nothing."""
    from yacy_grid_crawler_spark.operators.dedup_text import dup_spans

    docs = spark.createDataFrame(
        [
            # one shared 5-gram "aa bb cc dd ee" at pos 0 / pos 2
            (1, "aa bb cc dd ee ff gg hh"),
            (2, "xx yy aa bb cc dd ee zz"),
            # shared 7-token run -> shingles at pos 0,1,2 merge to [0,6]
            (3, "pp qq rr ss tt uu vv one"),
            (4, "pp qq rr ss tt uu vv two"),
            # two far-apart duplicated shingles -> two spans
            (5, "mm nn oo ppp qqq u1 u2 u3 u4 u5 fff ggg hhh iii jjj"),
            (6, "mm nn oo ppp qqq k1 k2 k3 fff ggg hhh iii jjj"),
            # self-repetition: 5-gram repeats at pos 0 and 5, merges
            (7, "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5"),
            (8, "too short"),
            (9, "all unique tokens here nothing repeats anywhere ever"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in dup_spans(docs, k=5).collect()
    }
    assert rows == {
        (1, 0, 4, 5),
        (2, 2, 6, 5),
        (3, 0, 6, 7),
        (4, 0, 6, 7),
        (5, 0, 4, 5), (5, 10, 14, 5),
        (6, 0, 4, 5), (6, 8, 12, 5),
        # tokenizer is [a-z]+ so "w1".."w5" -> "w","w","w","w","w":
        # every 5-gram of doc 7 is "w w w w w" (6 occurrences) -> one
        # maximal span covering the whole 10-token doc
        (7, 0, 9, 10),
    }


def test_cut_dup_spans_removes_exactly_the_spans(spark):
    """The cut must remove precisely the dup_spans token ranges: md5
    of the surviving space-joined tokens, counts consistent, docs with
    nothing duplicated (or no word tokens) pass through whole."""
    import hashlib

    from yacy_grid_crawler_spark.operators.dedup_text import cut_dup_spans

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff gg hh"),   # span [0,4] -> "ff gg hh"
            (2, "xx yy aa bb cc dd ee zz"),   # span [2,6] -> "xx yy zz"
            (7, "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5"),  # whole doc duplicated
            (8, "too short"),                 # untouched
        ],
        "doc_id long, text string",
    )
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()
    rows = {
        r["doc_id"]: (r["n_tokens"], r["tokens_removed"], r["clean_md5"])
        for r in cut_dup_spans(docs, k=5).collect()
    }
    assert rows == {
        1: (8, 5, md5("ff gg hh")),
        2: (8, 5, md5("xx yy zz")),
        7: (10, 10, md5("")),
        8: (2, 0, md5("too short")),
    }


def test_hits_exact_small_graph(spark):
    """Hand-computed unnormalized HITS on 0->2, 1->2, 2->0 (2 is the
    authority, 0 and 1 are the hubs)."""
    from yacy_grid_crawler_spark.operators.graph import hits_scores

    docs = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 0)], "src long, dst long"
    )
    out = {r["doc_id"]: (r["auth"], r["hub"]) for r in
           hits_scores(docs, edges=edges, iters=2).collect()}
    # h0=1 all. a1 = in-sum(h0): {0:1, 1:0, 2:2}; h1 = out-sum(a1):
    # {0:2, 1:2, 2:1}. a2 = in-sum(h1): {0:1, 1:0, 2:4}; h2 =
    # out-sum(a2): {0:4, 1:4, 2:1}.
    assert out == {0: (1, 4), 1: (0, 4), 2: (4, 1)}


def test_trustrank_seeds_gate_teleport_and_unreachable_zero(spark):
    """Hand-computed TrustRank recurrence on 0->1, 1->2 with seed {0};
    node 3 is disconnected and must stay exactly 0."""
    from yacy_grid_crawler_spark.operators.graph import trustrank_scaled

    docs = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 0), (3, 0)], "doc_id long, is_seed int"
    )
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = {r["doc_id"]: r["trust_scaled"] for r in
           trustrank_scaled(docs, edges=edges, iters=2).collect()}
    # s0 = {0:1}. t=0 (teleport 3·6^0=3): s1(0)=3·1=3, s1(1)=s0(0)=1,
    # s1(2)=s0(1)=0. t=1 (teleport 3·6=18): s2(0)=18, s2(1)=s1(0)=3,
    # s2(2)=s1(1)=1. Node 3: no seed, no in-edges → 0 forever.
    assert out == {0: 18, 1: 3, 2: 1, 3: 0}


def test_host_link_graph_rollup(spark):
    from yacy_grid_crawler_spark.operators.graph import host_link_graph

    links = spark.createDataFrame(
        [
            ("http://a.com/1", "http://b.com/x"),
            ("http://a.com/2", "http://b.com/x"),
            ("http://a.com/3", "http://b.com/y"),
            ("http://a.com/1", "http://a.com/2"),  # internal nav edge
        ],
        "src_url string, dst_url string",
    )
    out = {(r["src_host"], r["dst_host"]): r
           for r in host_link_graph(links).collect()}
    ab = out[("a.com", "b.com")]
    assert ab["n_links"] == 3 and ab["n_dst_urls"] == 2
    assert not ab["is_internal"]
    aa = out[("a.com", "a.com")]
    assert aa["n_links"] == 1 and aa["is_internal"]


def test_length_quantiles_linear_interpolation(spark):
    from yacy_grid_crawler_spark.operators.textstats import length_quantiles

    docs = spark.createDataFrame(
        [("en", 1), ("en", 2), ("en", 3), ("en", 4), ("de", 10)],
        "lang string, n_chars int",
    )
    out = {r["lang"]: r for r in length_quantiles(docs).collect()}
    en = out["en"]
    # rank p*(n-1) linear interpolation over [1,2,3,4]
    assert (en["p25"], en["p50"], en["p75"], en["p90"]) == (
        1.75, 2.5, 3.25, 3.7)
    assert en["n_docs"] == 4 and en["min_chars"] == 1
    de = out["de"]
    assert de["p50"] == 10.0 and de["max_chars"] == 10


def test_dsir_weights_prefer_target_like_text(spark):
    """Docs sharing the target slice's vocabulary out-weigh docs of
    raw-only vocabulary; weights are deterministic."""
    from yacy_grid_crawler_spark.operators.textstats import dsir_weights

    rows = [
        ("t1", "wiki", "physics theorem proof lemma physics theorem"),
        ("t2", "wiki", "theorem lemma corollary proof physics"),
        ("r1", "web", "click here buy cheap pills now click here"),
        ("r2", "web", "physics theorem proof lemma corollary"),  # target-like
        ("r3", "web", "buy cheap pills click buy cheap"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = {r["doc_id"]: r["log_weight"]
           for r in dsir_weights(docs, "wiki").collect()}
    # target-like raw doc scores above spam-like raw docs
    assert out["r2"] > out["r1"] and out["r2"] > out["r3"]
    # repeat run is bit-identical (pure function of the corpus)
    out2 = {r["doc_id"]: r["log_weight"]
            for r in dsir_weights(docs, "wiki").collect()}
    assert out == out2


def test_apportion_budget_exact_sum_and_bounds(spark):
    """sum(quota) == budget exactly; every quota is floor or ceil of
    the proportional share; zero/negative weights get quota 0; the
    distributed rank path equals the window path."""
    from yacy_grid_crawler_spark.operators.sampling import apportion_budget

    dims = spark.createDataFrame(
        [("a", 10), ("b", 25), ("c", 7), ("d", 58), ("e", 0), ("f", -3)],
        "host string, weight long",
    )
    budget = 101
    out = {r["host"]: r["quota"]
           for r in apportion_budget(dims, budget).collect()}
    assert sum(out.values()) == budget
    assert out["e"] == 0 and out["f"] == 0
    total = 10 + 25 + 7 + 58
    for h, w in (("a", 10), ("b", 25), ("c", 7), ("d", 58)):
        lo = budget * w // total
        assert out[h] in (lo, lo + 1)
    # window path agrees
    out2 = {r["host"]: r["quota"]
            for r in apportion_budget(dims, budget, distributed=False)
            .collect()}
    assert out == out2


def test_mirror_pairs_flags_copied_hosts(spark):
    """Two hosts sharing a long copied passage pair up; unrelated
    hosts don't; boilerplate grams on every host are df-capped away."""
    from yacy_grid_crawler_spark.operators.dedup_text import mirror_pairs

    passage = ("the quick brown fox jumps over the lazy dog and then "
               "runs far away into the deep dark forest tonight")
    boiler = "all rights reserved contact us terms of service apply here now"
    rows = [
        ("m1", passage + " " + boiler),
        ("m2", passage + " extra tail words here " + boiler),
        ("x1", "completely different text about cooking pasta with "
               "tomato sauce and fresh basil leaves in summer " + boiler),
        ("x2", "yet another unrelated document describing mountain "
               "hiking trails and alpine weather patterns today " + boiler),
    ]
    docs = spark.createDataFrame(rows, "host string, text string")
    out = {(r["host_a"], r["host_b"]): r
           for r in mirror_pairs(docs, max_gram_hosts=2, min_shared=3)
           .collect()}
    assert ("m1", "m2") in out
    pair = out[("m1", "m2")]
    assert pair["shared"] >= 3 and pair["containment_bp"] > 0
    assert all({a, b} == {"m1", "m2"} for a, b in out)  # no other pairs


def test_ccnet_buckets_terciles_per_lang(spark):
    """Each language splits ~1/3 per bucket; head holds the lowest
    perplexity; distributed rank equals the window path."""
    from yacy_grid_crawler_spark.operators.textstats import ccnet_buckets

    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(9):
        # vary fluency: doc 0 is pure common words, doc 8 is rare mix
        # letter-only rare tokens ([a-z]+ tokenizer drops digits),
        # unique per (i, j) so each is a corpus singleton
        rare = " ".join("zq" + "x" * i + "w" + "y" * j for j in range(i))
        rows.append((f"d{i}", "en", (common + " " + rare).strip()))
    docs = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    out = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(docs).collect()}
    from collections import Counter
    assert Counter(out.values()) == {"head": 3, "middle": 3, "tail": 3}
    assert out["d0"] == "head" and out["d8"] == "tail"
    out2 = {r["doc_id"]: r["bucket"]
            for r in ccnet_buckets(docs, distributed=False).collect()}
    assert out == out2


def test_weighted_resample_gumbel_topk(spark):
    """Deterministic across runs; a new seed reshuffles; heavier
    weights win more slots on average; non-positive weights excluded."""
    from yacy_grid_crawler_spark.operators.sampling import weighted_resample

    rows = ([(f"h{i}", 1000) for i in range(50)]
            + [(f"l{i}", 1) for i in range(50)]
            + [("z", 0), ("n", -5)])
    docs = spark.createDataFrame(rows, "doc_id string, weight long")
    got = weighted_resample(docs, 20, seed="s1").collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == 20 and "z" not in ids and "n" not in ids
    # ln(1000) - ln(1) ≈ 6.9 dominates the Gumbel spread: heavy ids win
    assert sum(1 for i in ids if i.startswith("h")) >= 15
    again = [r["doc_id"] for r in weighted_resample(docs, 20, seed="s1").collect()]
    assert ids == again
    other = [r["doc_id"] for r in weighted_resample(docs, 20, seed="s2").collect()]
    assert ids != other


def test_quality_percentiles_rank_calibration(spark):
    """pct_bp spans [0, 10000] within each source regardless of raw
    score scale; singleton sources get 0; distributed == window."""
    from yacy_grid_crawler_spark.operators.textstats import (
        quality_percentiles,
    )

    good = "the story of a small town and the people in it is told here"
    rows = ([(f"a{i}", "srcA", good + " word" * i) for i in range(5)]
            + [(f"b{i}", "srcB", ("x" * 20 + " ") * (i + 1)) for i in range(3)]
            + [("solo", "srcC", good)])
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = {r["doc_id"]: r for r in quality_percentiles(docs).collect()}
    for src, n in (("srcA", 5), ("srcB", 3)):
        bps = sorted(r["pct_bp"] for r in out.values() if r["source"] == src)
        assert bps[0] == 0 and bps[-1] == 10000 and len(bps) == n
    assert out["solo"]["pct_bp"] == 0
    out2 = {r["doc_id"]: r["pct_bp"]
            for r in quality_percentiles(docs, distributed=False).collect()}
    assert out2 == {k: v["pct_bp"] for k, v in out.items()}


def test_bm25_length_normalization_beats_raw_tf(spark):
    """Equal tf: the SHORTER doc scores higher (batch_search's raw
    tf·idf can't make that distinction); higher tf still wins at
    equal length; rank output is deterministic."""
    from yacy_grid_crawler_spark.operators.textstats import bm25_search

    filler = " ".join(f"pad{'x' * (i % 7)}q" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, "zebra fact here"),                      # short, tf=1
            (2, "zebra fact here " + filler),            # long, tf=1
            (3, "zebra zebra zebra notes " + filler),    # long, tf=3
            (4, "nothing relevant at all " + filler),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, "zebra")], "query_id long, qtext string"
    )
    out = {r["doc_id"]: r for r in bm25_search(docs, queries, k=4).collect()}
    assert 4 not in out                       # no matching term
    assert out[1]["score"] > out[2]["score"]  # same tf, shorter wins
    assert out[3]["score"] > out[2]["score"]  # higher tf, same length
    assert out[1]["rnk"] == 1


def test_budget_select_prefix_cut(spark):
    """Docs are taken in order-key order until the NEXT doc would
    overflow the budget; zero-token docs never count; the distributed
    two-phase prefix sum equals the single-window form."""
    from yacy_grid_crawler_spark.operators.sampling import budget_select

    docs = spark.createDataFrame(
        [(1, 40, 10), (2, 40, 20), (3, 40, 30), (4, 0, 5), (5, 40, 40)],
        "doc_id long, n_tokens long, _ord long",
    )
    caches = []
    out = {
        r["doc_id"]: r["cum_tokens"]
        for r in budget_select(docs, 100, cache_registry=caches).collect()
    }
    # order by _ord: 4 (0 tok, dropped), 1, 2, 3 (would hit 120 > 100)
    assert out == {1: 40, 2: 80}
    out2 = {
        r["doc_id"]: r["cum_tokens"]
        for r in budget_select(docs, 100, distributed=False).collect()
    }
    assert out2 == out
    for c in caches:
        c.unpersist()


def test_budget_select_matches_python_spec(spark):
    """Seeded randomized equivalence vs a pure-Python greedy spec:
    both distributed and window forms, several corpus shapes
    (empty, all-zero-token, budget larger than corpus, tight)."""
    import random

    from yacy_grid_crawler_spark.operators.sampling import budget_select

    rng = random.Random(1234)
    for case in range(5):
        n = rng.choice([0, 3, 17, 40])
        ords = rng.sample(range(10**6), n)  # unique: ties in _ord
        # would make cumulative attribution order-nondeterministic
        rows = [
            (i, rng.choice([0, 1, 5, 13, 50]), ords[i]) for i in range(n)
        ]
        budget = rng.choice([0, 10, 100, 10**6])
        # pure-Python spec: order ascending, skip zero-token, prefix cut
        cum, spec = 0, {}
        for doc_id, tok, _o in sorted(rows, key=lambda t: (t[2], t[0])):
            if tok <= 0:
                continue
            if cum + tok > budget:
                break
            cum += tok
            spec[doc_id] = cum
        docs = spark.createDataFrame(
            rows, "doc_id long, n_tokens long, _ord long"
        )
        caches = []
        for dist in (True, False):
            got = {
                r["doc_id"]: r["cum_tokens"]
                for r in budget_select(
                    docs, budget, distributed=dist, cache_registry=caches
                ).collect()
            }
            assert got == spec, (case, dist, rows, budget)
        for c in caches:
            c.unpersist()


def test_encoding_audit_counts_and_verdict(spark):
    """Clean ASCII (incl. tab/newline) is enc_ok; mojibake digraphs,
    U+FFFD, and C0 controls are counted per class."""
    from yacy_grid_crawler_spark.operators.textstats import encoding_audit

    docs = spark.createDataFrame(
        [
            (1, "plain text with\ttab and\nnewline"),
            (2, "re-decoded cafÃ© and â€™quoteâ€™"),
            (3, "lost byte � here � twice"),
            (4, "binary\x01noise\x1fhere"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in encoding_audit(docs).collect()}
    assert out[1]["enc_ok"] and out[1]["n_ctrl"] == 0
    assert out[2]["n_mojibake"] == 3 and not out[2]["enc_ok"]
    assert out[3]["n_replacement"] == 2 and not out[3]["enc_ok"]
    assert out[4]["n_ctrl"] == 2 and not out[4]["enc_ok"]


def test_zorder_key_interleaves_and_orders_locality(spark):
    from yacy_grid_crawler_spark.operators.sampling import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (70000, -3)],
        "a long, b long",
    )
    rows = {
        (r["a"], r["b"]): r["z_key"]
        for r in zorder_key(df, "a", "b").collect()
    }

    def py_z(a, b):
        a = min(max(a, 0), 65535)
        b = min(max(b, 0), 65535)
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for (a, b), z in rows.items():
        assert z == py_z(a, b), (a, b)
    # clamping: out-of-range maps to the boundary cell
    assert rows[(70000, -3)] == py_z(65535, 0)
    # pure codegen, no shuffle, no Python
    plan = zorder_key(df, "a", "b")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mirror_families_transitive_closure(spark):
    """A mirror RING m1-m2, m2-m3 (no m1-m3 pair) collapses into one
    family under min-label closure; unrelated hosts stay singletons."""
    from yacy_grid_crawler_spark.operators.dedup_text import mirror_families

    passage_a = ("the quick brown fox jumps over the lazy dog and then "
                 "runs far away into the deep dark forest tonight")
    passage_b = ("a second copied block of prose that mirrors share "
                 "verbatim across their page templates every single time")
    rows = [
        ("m1", passage_a),
        ("m2", passage_a + " " + passage_b),
        ("m3", passage_b),
        ("x1", "completely different text about cooking pasta with "
               "tomato sauce and fresh basil leaves in summer evenings"),
    ]
    docs = spark.createDataFrame(rows, "host string, text string")
    from yacy_grid_crawler_spark.operators.dedup_text import mirror_pairs

    pairs = mirror_pairs(docs, max_gram_hosts=2, min_shared=3)
    out = {r["host"]: r["family_id"]
           for r in mirror_families(docs, pairs=pairs).collect()}
    assert out["m1"] == out["m2"] == out["m3"] == "m1"
    assert out["x1"] == "x1"


def test_dup_ngram_fractions_exact_bp(spark):
    """'a b a b a' has 4 bigrams ('a b','b a','a b','b a') → 2 dup →
    5000 bp; trigrams 3 with 1 dup → 3333 bp; a no-repeat doc scores
    0; an empty doc scores 0 on all three."""
    from yacy_grid_crawler_spark.operators.textstats import (
        dup_ngram_fractions,
    )

    rows = [(1, "a b a b a"), (2, "one two three four five"), (3, "")]
    out = {r["doc_id"]: r for r in dup_ngram_fractions(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()}
    assert out[1]["dup2_bp"] == 5000 and out[1]["dup3_bp"] == 3333
    # 4-grams: 'a b a b', 'b a b a' — both unique → 0
    assert out[1]["dup4_bp"] == 0
    assert out[2]["dup2_bp"] == 0 and out[2]["dup4_bp"] == 0
    assert out[3]["dup2_bp"] == 0 and out[3]["dup3_bp"] == 0


def test_tokenizer_fertility_ratios(spark):
    from yacy_grid_crawler_spark.operators.textstats import (
        tokenizer_fertility,
    )

    rows = [("en", "abc def9"), ("en", "gh"), ("zz", "")]
    out = {r["lang"]: r for r in tokenizer_fertility(
        spark.createDataFrame(rows, "lang string, text string")
    ).collect()}
    # en: tokens = [abc, def, 9] + [gh] = 4; chars = 8 + 2 = 10
    assert out["en"]["tokens"] == 4 and out["en"]["chars"] == 10
    assert out["en"]["chars_per_token_milli"] == 2500
    assert out["zz"]["tokens"] == 0 and out["zz"]["chars_per_token_milli"] == 0


def test_mixture_select_quota_sum_and_prefix_cut(spark):
    """Quotas sum to the budget; each source's kept prefix fits its
    quota and is a doc_id-ordered prefix (no gaps); the overflowing
    doc is dropped."""
    from yacy_grid_crawler_spark.operators.sampling import mixture_select

    rows = [
        ("a", 1, 30), ("a", 2, 30), ("a", 3, 30),
        ("b", 4, 10), ("b", 5, 10),
        ("c", 6, 0),  # zero-token: excluded everywhere
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = mixture_select(docs, 60, token_col="n_tokens").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # weights: a=90, b=20 → quotas: a = 60*90//110 = 49, frac picks…
    # sum of quotas == 60 exactly regardless of the remainder split
    quotas = {s: rs[0]["quota"] for s, rs in by_src.items()}
    tot = sum({r["source"]: r["quota"] for r in out}.values())
    assert tot <= 60
    for s, rs in by_src.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum
        assert cum <= r["quota"]
    # source a: quota ≥ 49 → docs 1 (30) fits, doc 2 would hit 60 ≤ quota?
    # 60 > 49 and 60 > 54 → only doc 1 kept either way
    assert [r["doc_id"] for r in by_src["a"]] == [1]
    assert "c" not in by_src


def test_grouped_split_is_group_disjoint(spark):
    from pyspark.sql import functions as F

    from yacy_grid_crawler_spark.operators.sampling import (
        dataset_split, grouped_split,
    )

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("host"), (F.col("id") % 37)).alias("host"),
    )
    out = grouped_split(docs, "host").collect()
    assert len(out) == 500
    # leakage guarantee: every group maps to exactly ONE split
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_grp.values())
    assert {r["split"] for r in out} == {"train", "val", "test"}
    # determinism: same input -> same assignment
    again = {(r["doc_id"], r["split"])
             for r in grouped_split(docs, "host").collect()}
    assert again == {(r["doc_id"], r["split"]) for r in out}
    # contrast: the doc-hash split DOES scatter a group across splits
    doc_level = dataset_split(docs).collect()
    doc_split = {r["doc_id"]: r["split"] for r in doc_level}
    grp_of = {r["doc_id"]: r["grp"] for r in out}
    scattered = {}
    for d, s in doc_split.items():
        scattered.setdefault(grp_of[d], set()).add(s)
    assert any(len(s) > 1 for s in scattered.values())


def test_prefix_filter_pairs_exact_recall_vs_allpairs(spark):
    from pyspark.sql import functions as F

    from yacy_grid_crawler_spark.operators.dedup_text import (
        doc_shingles, prefix_filter_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls on the quiet gray town and children play outside")
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " today"),                      # near-dup of 0
            (2, base.replace("quick", "slow")),        # near-dup of 0
            (3, "completely different words about spark shuffle "
                "partitions and catalyst optimizer internals"),
            (4, "another unrelated document mentioning bloom filters "
                "politeness budgets and frontier scheduling"),
        ],
        ["doc_id", "text"],
    )
    got = {(r["doc_a"], r["doc_b"]): r["jaccard_bp"]
           for r in prefix_filter_pairs(docs, threshold_bp=5000).collect()}

    # ground truth: brute-force all-pairs jaccard over the same shingles
    sh = doc_shingles(docs)
    sets = {}
    for r in sh.collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    want = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j:
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                bp = 10000 * inter // union
                if bp >= 5000:
                    want[(i, j)] = bp
    assert got == want          # exact recall AND exact scores
    assert (0, 1) in got and (0, 2) in got
    assert all(3 not in p and 4 not in p for p in got)


def test_prefix_filter_pairs_randomized_equals_bruteforce(spark):
    import random

    from yacy_grid_crawler_spark.operators.dedup_text import (
        doc_shingles, prefix_filter_pairs,
    )

    rng = random.Random(1311)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for d in range(40):
        n = rng.randint(5, 14)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant exact+near duplicates
    rows.append((100, rows[3][1]))
    rows.append((101, rows[3][1] + " w0"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    for t in (5000, 7000, 9000):
        got = {(r["doc_a"], r["doc_b"]): (r["inter"], r["jaccard_bp"])
               for r in prefix_filter_pairs(docs, threshold_bp=t).collect()}
        sets = {}
        for r in doc_shingles(docs).collect():
            sets.setdefault(r["doc_id"], set()).add(r["shingle"])
        want = {}
        ids = sorted(sets)
        for i in ids:
            for j in ids:
                if i < j:
                    inter = len(sets[i] & sets[j])
                    union = len(sets[i] | sets[j])
                    bp = 10000 * inter // union
                    if bp >= t:
                        want[(i, j)] = (inter, bp)
        assert got == want, f"threshold {t}"


def test_pack_interleaved_costs_and_atomicity(spark):
    """Span-derived costs (ceil chars/4 + 576/media), whole-document
    packing (one row per doc), prefix-sum shard law, and the
    distributed == window equality."""
    from yacy_grid_crawler_spark.operators.sampling import pack_interleaved

    spans_schema = (
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    rows = [
        (1, [("text", "x" * 10, "", 0)]),                    # 3 tokens
        (2, [("text", "y" * 9, "", 0), ("media", "", "m1", 1)]),  # 3+576
        (3, [("media", "", "m2", 0), ("media", "", "m3", 1)]),    # 1152
        (4, [("text", "z" * 4000, "", 0)]),                  # 1000 (oversized)
        (5, [("text", "", "", 0)]),                          # 0 tokens
    ]
    docs = spark.createDataFrame(rows, spans_schema)
    got = {
        r["doc_id"]: r
        for r in pack_interleaved(
            docs, budget=600, distributed=False
        ).collect()
    }
    assert len(got) == 5  # atomic: one row per document, never split
    assert got[1]["n_text_tokens"] == 3 and got[1]["n_media_tokens"] == 0
    assert got[2]["cost"] == 3 + 576
    assert got[3]["cost"] == 1152
    assert got[4]["cost"] == 1000
    assert got[5]["cost"] == 0
    # prefix-sum shard law: shard_id = floor(exclusive prefix / 600)
    starts, acc = {}, 0
    for d in sorted(got):
        starts[d] = acc
        acc += got[d]["cost"]
    for d, r in got.items():
        assert r["shard_id"] == starts[d] // 600, d
    caches = []
    dist = {
        r["doc_id"]: (r["cost"], r["shard_id"])
        for r in pack_interleaved(
            docs, budget=600, distributed=True, cache_registry=caches
        ).collect()
    }
    for c in caches:
        c.unpersist()
    assert dist == {
        d: (r["cost"], r["shard_id"]) for d, r in got.items()
    }


def test_span_lint_pure_codegen(spark):
    """Lint is a single narrow projection: no exchange, no Python."""
    from yacy_grid_crawler_spark.operators.extract import span_lint

    rows = [
        (1, [("text", "hi", "", 0), ("media", "", "m1", 1)]),
        (2, [("text", "", "", 0), ("media", "", "", 2)]),  # all four fire
        (3, [("blob", "x", "", 0)]),
        (4, []),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {r["doc_id"]: r for r in span_lint(docs).collect()}
    assert got[1]["lint_ok"]
    r2 = got[2]
    assert (
        not r2["offsets_ok"]
        and r2["n_empty_text"] == 1
        and r2["n_missing_ref"] == 1
        and not r2["lint_ok"]
    )
    assert got[3]["n_bad_kind"] == 1 and not got[3]["lint_ok"]
    assert got[4]["offsets_ok"] and got[4]["lint_ok"]  # empty doc is clean
    plan = span_lint(docs)._sc._jvm.PythonSQLUtils.explainString(
        span_lint(docs)._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_corpus_drift_ranks_shifted_words_first(spark):
    """Hand-built two-snapshot corpus: 'alpha' only in crawl A (even
    doc_ids), 'beta' only in crawl B, 'common' everywhere. The
    drifted words outrank the common one, counts and exact BIGINT
    drift scores match the hand computation, and probabilities sum
    to ~1 per side over the full vocab."""
    from yacy_grid_crawler_spark.operators.textstats import corpus_drift

    docs = spark.createDataFrame(
        [
            (0, "alpha alpha common"),
            (2, "alpha common"),
            (1, "beta common common"),
            (3, "beta beta common"),
        ],
        "doc_id long, text string",
    )
    rows = {r["word"]: r for r in corpus_drift(docs, top_n=10).collect()}
    # totals: A = 5 words (3 alpha + 2 common), B = 6 (3 beta + 3 common)
    assert rows["alpha"]["cnt_a"] == 3 and rows["alpha"]["cnt_b"] == 0
    assert rows["beta"]["cnt_a"] == 0 and rows["beta"]["cnt_b"] == 3
    assert rows["alpha"]["drift_score"] == abs(3 * 6 - 0 * 5)
    assert rows["beta"]["drift_score"] == abs(0 * 6 - 3 * 5)
    assert rows["common"]["drift_score"] == abs(2 * 6 - 3 * 5)
    # the operator's OWN row order: drift desc, word asc
    ordered = [r["word"] for r in corpus_drift(docs, top_n=10).collect()]
    assert ordered == ["alpha", "beta", "common"]
    # top_n cuts after ordering
    cut = [r["word"] for r in corpus_drift(docs, top_n=2).collect()]
    assert cut == ["alpha", "beta"]
    assert abs(sum(r["p_a"] for r in rows.values()) - 1.0) < 1e-4
    assert abs(sum(r["p_b"] for r in rows.values()) - 1.0) < 1e-4


def test_span_chunks_greedy_boundaries_and_oversize(spark):
    """Hand-built interleaved doc, budget 500: spans [text 400t,
    media 576t, text 100t, text 100t, media 576t] must chunk as
    [text400] [media576 oversize] [text100+text100] [media576
    oversize] — the 576 media can never share (576 > 500) and is
    flagged oversize, not split or dropped; text spans pack
    greedily. Spans arrive offset-SHUFFLED to prove the operator
    re-sorts. Plan pin: zero Exchange (pure projection + explode)."""
    from yacy_grid_crawler_spark.operators.sampling import span_chunks

    def t(chars, off):
        return ("text", "x" * chars, "", off)

    def m(off):
        return ("media", "", f"img://1/{off}", off)

    # offsets deliberately out of order in the array
    spans = [t(400, 2), m(1), t(1600, 0), t(400, 3), m(4)]
    df = spark.createDataFrame(
        [(1, spans)],
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = span_chunks(df, budget=500)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = [tuple(r) for r in out.orderBy("chunk_no").collect()]
    assert rows == [
        (1, 0, 1, 400, 1, 0, False),
        (1, 1, 1, 576, 0, 1, True),
        (1, 2, 2, 200, 2, 0, False),
        (1, 3, 1, 576, 0, 1, True),
    ]


def test_span_chunks_reassembles_to_whole_doc(spark):
    """Conservation: over the shared synthetic spans table, summing
    chunk costs and span counts per doc reproduces the document's
    whole-doc totals, chunk_no is dense from 0, and every
    non-oversize chunk respects the budget."""
    import __spark_entry__ as e
    from yacy_grid_crawler_spark.operators.sampling import span_chunks

    spans = e._synth_spans(spark, "/root/testdata/sf0.01")
    out = span_chunks(spans, budget=600).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
        if not r["oversize"]:
            assert r["chunk_cost"] <= 600
    whole = {
        r["doc_id"]: (len(r["spans"]),
                      sum(1 for s in r["spans"] if s["kind"] == "media"))
        for r in spans.collect()
    }
    for doc_id, chunks in per_doc.items():
        assert sorted(c["chunk_no"] for c in chunks) == list(
            range(len(chunks))
        )
        n_spans = sum(c["n_spans"] for c in chunks)
        n_media = sum(c["n_media"] for c in chunks)
        assert (n_spans, n_media) == whole[doc_id]


def test_lm_bigram_backoff_fires_only_on_heldout(spark):
    """Training-split docs never back off (all their bigrams are in
    the LM); a held-out doc with novel bigrams must."""
    from yacy_grid_crawler_spark.operators.textstats import lm_bigram_score

    # split is md5(doc_id)-parity (type-safe for string ids):
    # int(md5(str(i))[:2], 16) % 2 == 0 for i in 1..6 (train),
    # == 1 for 0 and 7..11 (held out)
    import hashlib

    def in_train(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 2 == 0

    assert all(in_train(i) for i in (1, 2, 3)) and not in_train(7) \
        and not in_train(0)
    rows = [
        ("1", "the cat sat on the mat"),
        ("2", "the cat ate the fish"),
        ("3", "a dog sat on a log"),
        ("7", "the cat sat on the mat"),        # held out, fully covered
        ("0", "purple elephants juggle quanta"),  # held out, all-novel
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in lm_bigram_score(df).collect()}
    assert got["1"]["backoff_bp"] == 0
    assert got["2"]["backoff_bp"] == 0
    assert got["3"]["backoff_bp"] == 0
    assert got["7"]["backoff_bp"] == 0
    assert got["0"]["backoff_bp"] == 10000
    # held-out novel text must score strictly worse than covered text
    assert got["0"]["avg_neg_logprob"] > got["7"]["avg_neg_logprob"]
