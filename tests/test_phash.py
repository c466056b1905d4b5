"""Perceptual-hash (dHash) near-dup: hash determinism, banded-join
exactness vs brute force, plan shape, and the df-cap escape hatch.

The oracle-gate replica (test_entry.py) already pins media_phash /
phash_neardup against DuckDB at sf0.01; these tests pin the operator
properties the oracle can't see — pigeonhole exactness at several
thresholds, the no-cartesian plan, and skew-cap behavior.
"""

import pytest
from pyspark.sql import functions as F

from yacy_grid_crawler_spark.operators.multimodal import (
    PHASH_BITS,
    _dhash_bits,
    perceptual_hash,
    phash_near_pairs,
    synth_media_from_docs,
)

SF_DIR = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def hashes(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = synth_media_from_docs(docs).select("media_id", "kind", "content")
    pert = docs.filter(
        (F.col("doc_id") % 7 == 0) & (F.length("text") > 2)
    ).select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string"), F.lit("v")).alias(
            "media_id"
        ),
        F.lit("variant").alias("kind"),
        F.encode(
            F.expr(
                "concat(substring(text, 1, length(text) div 2 - 1), '~', "
                "substring(text, length(text) div 2 + 1, length(text)))"
            ),
            "utf-8",
        ).alias("content"),
    )
    h = perceptual_hash(base.unionByName(pert)).persist()
    h.count()
    yield h
    h.unpersist()


def test_dhash_bits_known_vector():
    # descending vector -> every comparison true -> all 63 bits set
    assert _dhash_bits(list(range(64, 0, -1))) == (1 << PHASH_BITS) - 1
    # ascending -> no bits; constant -> no bits (strict >)
    assert _dhash_bits(list(range(64))) == 0
    assert _dhash_bits([7] * 64) == 0
    # single comparison: only bit 0 (values[0] > values[1])
    assert _dhash_bits([2, 1] + [1] * 62) == 1


def test_phash_deterministic_and_long_safe(hashes):
    rows = {r["media_id"]: r["phash"] for r in hashes.collect()}
    again = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(
            synth_media_from_docs(
                hashes.sparkSession.read.parquet(f"{SF_DIR}/documents.parquet")
            )
        ).collect()
    }
    for mid, ph in again.items():
        assert rows[mid] == ph
        assert 0 <= ph < (1 << 63)


def test_variant_pairs_found_at_low_hamming(spark, hashes):
    """Every perturbed blob must pair with its base at hamming <= 2:
    one replaced character moves exactly one chunk sum, flipping at
    most the two comparisons that touch it."""
    pairs = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in phash_near_pairs(hashes, max_hamming=6).collect()
    }
    variants = [
        r["media_id"]
        for r in hashes.filter(F.col("kind") == "variant").collect()
    ]
    assert variants, "fixture must synthesize variants"
    for vid in variants:
        base = vid[:-1]
        assert (base, vid) in pairs, f"missing near-dup pair for {vid}"
        assert pairs[(base, vid)] <= 2


@pytest.mark.parametrize("k", [0, 3, 6])
def test_banded_join_exact_vs_brute_force(hashes, k):
    got = {
        (r["media_id_a"], r["media_id_b"], r["hamming"])
        for r in phash_near_pairs(hashes, max_hamming=k).collect()
    }
    rows = [(r["media_id"], r["phash"]) for r in hashes.collect()]
    want = set()
    for i in range(len(rows)):
        for j in range(len(rows)):
            (ia, ha), (ib, hb) = rows[i], rows[j]
            if ia < ib and bin(ha ^ hb).count("1") <= k:
                want.add((ia, ib, bin(ha ^ hb).count("1")))
    assert got == want


def test_max_hamming_bound_enforced():
    # the bound check precedes any DataFrame access, so None is safe
    with pytest.raises(ValueError):
        phash_near_pairs(None, max_hamming=7)
    with pytest.raises(ValueError):
        phash_near_pairs(None, max_hamming=-1)


def test_band_df_cap_drops_hot_buckets(spark):
    """A degenerate corpus (many identical hashes) with a cap: the
    hot buckets are dropped, so the quadratic pair set collapses while
    distinct-hash pairs (cold buckets) survive."""
    # 50 rows of phash=0 flood every zero band; z1/z2 share ONLY the
    # cold band-0 bucket (value 3) — z2 flips one bit-9 (band 1)
    rows = [("a%03d" % i, 0) for i in range(50)] + [
        ("z1", 3),
        ("z2", 3 | (1 << 9)),
    ]
    df = spark.createDataFrame(rows, "media_id string, phash long")
    uncapped = phash_near_pairs(df, max_hamming=6).count()
    capped = phash_near_pairs(df, max_hamming=6, band_df_cap=10)
    got = {
        (r["media_id_a"], r["media_id_b"]) for r in capped.collect()
    }
    assert uncapped >= 50 * 49 // 2
    # every bucket the a-rows occupy is hot (dropped), so the
    # quadratic flood collapses; the z pair survives via its cold
    # band-0 bucket
    assert got == {("z1", "z2")}


def test_phash_neardup_plan_shape(hashes):
    """No cartesian product, no window, exactly one Python surface
    (the mapInPandas hash kernel) feeding a banded equi-join."""
    plan = _formatted(phash_near_pairs(hashes, max_hamming=6))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# video_near_pairs: frame-signature containment join
# ---------------------------------------------------------------------------


def _synth_videos(spark):
    """3 crafted videos, 16 exact frames each: v1 base, v2 = v1 with
    one frame blanked (15/16 shared), v3 unrelated."""
    chunk = [("%02d" % i) * 8 for i in range(16)]  # 16 distinct 16-char frames
    t1 = "".join(chunk)
    t2 = "".join(chunk[:7]) + "~" * 16 + "".join(chunk[8:])
    t3 = "".join(("z%x" % i) * 8 for i in range(16))
    rows = [("v1", "video", t1.encode(), 16000),
            ("v2", "video", t2.encode(), 16000),
            ("v3", "video", t3.encode(), 16000)]
    return spark.createDataFrame(
        rows, "media_id string, kind string, content binary, duration_ms int"
    )


def test_video_near_pairs_containment(spark):
    from yacy_grid_crawler_spark.operators.multimodal import (
        sample_frames,
        video_near_pairs,
    )

    frames = sample_frames(_synth_videos(spark), every_ms=1000, max_frames=16)
    got = {
        (r["media_id_a"], r["media_id_b"]): (
            r["shared_frames"],
            r["containment"],
        )
        for r in video_near_pairs(frames, min_containment=0.5).collect()
    }
    assert got == {("v1", "v2"): (15, round(15 / 16, 4))}


def test_video_near_pairs_sig_df_cap(spark):
    """A ubiquitous frame (shared by all videos) under the cap: pairs
    whose ONLY overlap is the degenerate frame disappear."""
    from pyspark.sql import functions as F
    from yacy_grid_crawler_spark.operators.multimodal import video_near_pairs

    # 5 videos all sharing frame X; v1/v2 additionally share frame Y
    rows = []
    for v in ["v1", "v2", "v3", "v4", "v5"]:
        rows.append((v, 0, b"X"))
        rows.append((v, 1, b"own-" + v.encode()))
    rows.append(("v1", 2, b"Y"))
    rows.append(("v2", 2, b"Y"))
    frames = spark.createDataFrame(
        rows, "media_id string, frame_no int, frame binary"
    )
    uncapped = video_near_pairs(frames, min_containment=0.3)
    assert uncapped.count() == 10  # all C(5,2) pairs share X
    capped = video_near_pairs(frames, min_containment=0.3, sig_df_cap=3)
    got = {
        (r["media_id_a"], r["media_id_b"]) for r in capped.collect()
    }
    assert got == {("v1", "v2")}


def test_video_near_pairs_plan_shape(spark):
    from yacy_grid_crawler_spark.operators.multimodal import (
        sample_frames,
        video_near_pairs,
    )

    pairs = video_near_pairs(
        sample_frames(_synth_videos(spark), every_ms=1000, max_frames=16)
    )
    plan = _formatted(pairs)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
