"""Distributed suffix array (prefix doubling) vs brute-force sort."""

import pytest

from yacy_grid_crawler_spark.operators.suffix import (
    longest_repeats,
    suffix_array,
)

TEXTS = [
    "banana bandana",
    "the cat sat on the mat",
    "abracadabra abracadabra",
    "aa aaa aaaa",
    "mississippi",
    "",  # empty doc must contribute no suffixes
    "x",
]


def _ref_sa(texts):
    sufs = []
    for i, t in enumerate(texts):
        for p in range(1, len(t) + 1):
            sufs.append((t[p - 1 :], str(i), p))
    sufs.sort()
    return [(r, d, p) for r, (_s, d, p) in enumerate(sufs)]


def _ref_repeats(texts, top=30, cap=64):
    sufs = []
    for i, t in enumerate(texts):
        for p in range(1, len(t) + 1):
            sufs.append((t[p - 1 :], str(i), p))
    sufs.sort()
    rows = []
    for rank in range(1, len(sufs)):
        a, b = sufs[rank][0][:cap], sufs[rank - 1][0][:cap]
        lcp = 0
        while lcp < min(len(a), len(b)) and a[lcp] == b[lcp]:
            lcp += 1
        rows.append((rank, lcp, a[:lcp]))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:top]


@pytest.fixture(scope="module")
def sa_docs(spark):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(TEXTS)],
        "doc_id string, text string",
    )


def test_suffix_array_matches_bruteforce(spark, sa_docs):
    got = [
        (r["sa_rank"], r["doc_id"], r["pos"])
        for r in suffix_array(sa_docs).orderBy("sa_rank").collect()
    ]
    assert got == _ref_sa(TEXTS)


def test_longest_repeats_matches_bruteforce(spark, sa_docs):
    got = [
        (r["sa_rank"], r["lcp"], r["prefix"])
        for r in longest_repeats(sa_docs, top=20).collect()
    ]
    assert got == _ref_repeats(TEXTS, top=20)


def test_suffix_array_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id string, text string")
    assert suffix_array(empty).count() == 0


def _ref_dup_coverage(texts, min_len=10, cap=64):
    sufs = []
    for i, t in enumerate(texts):
        for p in range(1, len(t) + 1):
            sufs.append((str(i), p, t[p - 1 :][:cap]))
    out = {}
    for i, t in enumerate(texts):
        intervals = []
        for d, p, s in sufs:
            if d != str(i):
                continue
            best = 0
            for d2, p2, s2 in sufs:
                if (d2, p2) == (d, p):
                    continue
                l = 0
                while l < min(len(s), len(s2)) and s[l] == s2[l]:
                    l += 1
                best = max(best, l)
            if best >= min_len:
                intervals.append((p, p + best))
        merged, dup = [], 0
        for st, en in sorted(intervals):
            if merged and st <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], en))
            else:
                merged.append((st, en))
        dup = sum(en - st for st, en in merged)
        total = len(t)
        out[str(i)] = (total, dup, (10000 * dup) // total if total else 0)
    return out


def test_dup_coverage_matches_bruteforce(spark):
    from yacy_grid_crawler_spark.operators.suffix import dup_coverage

    shared = "the quick brown fox jumps over the lazy dog"
    texts = [
        f"alpha {shared} omega",
        f"{shared} entirely different tail here",
        "no duplicated content in this one at all",
        f"prefix junk {shared}",
        "",
    ]
    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["total_chars"], r["dup_chars"], r["dup_bp"])
        for r in dup_coverage(docs, min_len=10).collect()
    }
    assert got == _ref_dup_coverage(texts, min_len=10)
