"""BPE tokenizer training vs a pure-Python executable spec."""

import re
from collections import Counter

import pytest

from yacy_grid_crawler_spark.operators.bpe import bpe_train, bpe_vocab


def _ref_bpe(texts, k):
    """Pure-Python BPE with the module's exact rules: [a-z]+ words,
    char+'_' init, overlap-inclusive pair counting, argmax with
    (count desc, left asc, right asc), non-overlapping left-to-right
    merge application."""
    words = Counter()
    for t in texts:
        words.update(re.findall(r"[a-z]+", t.lower()))
    vocab = {
        " ".join(list(w)) + " _": c for w, c in words.items()
    }
    merges = []
    for step in range(1, k + 1):
        pairs = Counter()
        for seq, c in vocab.items():
            s = seq.split(" ")
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, l + r, c))
        vocab = {
            (" " + seq + " ").replace(f" {l} {r} ", f" {l}{r} ").strip(): c
            for seq, c in vocab.items()
        }
    return merges, vocab


TEXTS = [
    "the cat sat on the mat",
    "the cats chatter that the hat is flat",
    "that cat and that hat chat",
    "lower lowest newer newest wider widest",
    "lower newer lower newer lowest newest",
]


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(TEXTS)], "doc_id string, text string"
    )


def test_bpe_train_matches_reference(spark, tiny_docs):
    merge_df, _vocab = bpe_train(tiny_docs, k=10)
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in merge_df.orderBy("step").collect()
    ]
    want, _ = _ref_bpe(TEXTS, 10)
    assert got == want


def test_bpe_vocab_matches_reference(spark, tiny_docs):
    want_merges, want_vocab = _ref_bpe(TEXTS, 6)
    freq = Counter()
    for seq, c in want_vocab.items():
        for tok in seq.split(" "):
            freq[tok] += c
    want = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [
        (r["token"], r["freq"])
        for r in bpe_vocab(tiny_docs, k=6, top=15).collect()
    ]
    assert got == want


def test_bpe_doc_tokens_matches_reference(spark, tiny_docs):
    from yacy_grid_crawler_spark.operators.bpe import bpe_doc_tokens

    _, want_vocab = _ref_bpe(TEXTS, 6)
    tok_per_word = {
        seq.replace(" ", "")[:-1]: len(seq.split(" "))
        for seq in want_vocab
    }
    want = {}
    for i, t in enumerate(TEXTS):
        ws = re.findall(r"[a-z]+", t.lower())
        want[str(i)] = (len(ws), sum(tok_per_word[w] for w in ws))
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_doc_tokens(tiny_docs, k=6).collect()
    }
    assert got == want


def test_bpe_overlapping_run_merges_match_reference(spark):
    """l==r merges on odd runs: counting includes overlaps but
    application is non-overlapping left-to-right ('a a a' -> 'aa a'),
    and both engines plus the spec must agree on the asymmetry."""
    texts = ["aaa aaaa aaaaa bbb abab", "aaa aaa bbbb baab"]
    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )
    merge_df, vocab = bpe_train(docs, k=6)
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in merge_df.orderBy("step").collect()
    ]
    want_merges, want_vocab = _ref_bpe(texts, 6)
    assert got == want_merges
    assert {(r["seq"], r["cnt"]) for r in vocab.collect()} == set(
        want_vocab.items()
    )


def test_bpe_merged_vocab_sequences_match_reference(spark, tiny_docs):
    """The returned vocab's post-merge symbol sequences equal the
    pure-Python spec's word-by-word (application semantics, not just
    the merge table)."""
    _merge_df, vocab = bpe_train(tiny_docs, k=5)
    got = {(r["seq"], r["cnt"]) for r in vocab.collect()}
    _, want_vocab = _ref_bpe(TEXTS, 5)
    # a seq determines its word (strip spaces, drop the marker), so the
    # (seq, cnt) set comparison is exact per-word
    assert got == set(want_vocab.items())


def test_bpe_hypothesis_random_corpora(spark):
    """Property: engine merge tables equal the pure-Python spec on
    random small corpora (short alphabet forces heavy ties and l==r
    runs — the adversarial regime for the replace semantics)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=5,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(texts=corpus)
    def run(texts):
        docs = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(texts)],
            "doc_id string, text string",
        )
        merge_df, vocab = bpe_train(docs, k=4)
        got = [
            (r["step"], r["left_sym"], r["right_sym"], r["merged"],
             r["pair_count"])
            for r in merge_df.orderBy("step").collect()
        ]
        want, want_vocab = _ref_bpe(texts, 4)
        assert got == want
        assert {(r["seq"], r["cnt"]) for r in vocab.collect()} == set(
            want_vocab.items()
        )

    run()


def test_checkpointed_equals_unchunked(spark, tiny_docs):
    """Round-3 verdict ask #5: the localCheckpoint-every-N plan-depth
    bound must be a pure physical change — merge table AND final
    vocab sequences identical to the unchunked run at k=256 (the tiny
    corpus saturates earlier; both runs must break at the same step),
    and the final plan must carry at most checkpoint_every pending
    replaces instead of k."""
    k, every = 256, 16
    m_chunked, v_chunked = bpe_train(
        tiny_docs, k=k, checkpoint_every=every
    )
    m_plain, v_plain = bpe_train(tiny_docs, k=k, checkpoint_every=10**9)
    assert [tuple(r) for r in m_chunked.collect()] == [
        tuple(r) for r in m_plain.collect()
    ]
    key = lambda r: (r["word"], r["cnt"], r["seq"])
    assert sorted(map(key, v_chunked.collect())) == sorted(
        map(key, v_plain.collect())
    )
    # plan depth bounded: the chunked final vocab stacks at most
    # `every` replaces above its checkpointed scan; the plain one
    # stacks one per learned merge
    n_merges = m_plain.count()

    def n_replaces(df):  # literal replace() calls, not regexp_replace
        plan = df._jdf.queryExecution().analyzed().toString()
        return plan.count("replace(") - plan.count("regexp_replace(")

    assert n_replaces(v_chunked) <= every
    if n_merges > every:
        assert n_replaces(v_plain) == n_merges


def test_checkpointed_large_k_synthetic(spark):
    """k=256 with genuine merges past the checkpoint boundary: a
    synthetic corpus with enough distinct words that >64 merges are
    learnable; every-64 checkpointing matches the pure-Python spec."""
    import random

    rng = random.Random(99)
    words = [
        "".join(rng.choice("abcdefgh") for _ in range(rng.randint(3, 9)))
        for _ in range(400)
    ]
    texts = [
        " ".join(rng.choices(words, k=40)) for _ in range(60)
    ]
    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )
    k = 256
    merge_df, _v = bpe_train(docs, k=k, checkpoint_every=64)
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in merge_df.collect()
    ]
    want, _ = _ref_bpe(texts, k)
    assert len(got) > 64, "corpus too small to cross a checkpoint"
    assert got == want
