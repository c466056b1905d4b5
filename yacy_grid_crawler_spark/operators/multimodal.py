"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata; decode / feature-extract / resize / frame-sample
as Arrow-batched pandas functions over `mapInPandas`.

The media decode libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode kernels are STUBBED behind
`media_decoders_available()` with a deterministic fake (documented
below) — the Spark-side plumbing (schema, partitioning, UDF signature,
Arrow batch shape) is real and tested. Mirrors the reference's stance
that media links are carried but never expanded
(CrawlerListener.java:55 — images_sxt commented out; F1 content-domain
filter keeps them out of the frontier): media is *payload*, not
*control flow*.

Scale notes: media blobs dominate bytes at 100 TB — they stay in their
own column so column pruning keeps them out of every crawl-side scan;
decode fans out with `mapInPandas` (per-partition batch iterator, no
per-row Python), and `repartition(n, 'media_id')` sizes decode tasks
independently of the text pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),  # image/video
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),  # audio/video
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, byte_mean double, "
    "byte_entropy double, feature array<double>, decoded boolean"
)


def media_decoders_available() -> bool:
    """True when real decode libs are importable (not in this image)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def synth_media_from_docs(docs: DataFrame, media_ratio_mod: int = 7) -> DataFrame:
    """Deterministic fake media table derived from the documents table
    (no external data): every doc_id % mod == 0 yields one blob whose
    bytes are the utf-8 text — stands in for image bytes so the
    binary-column plumbing is exercised end to end."""
    return (
        docs.filter(F.col("doc_id") % media_ratio_mod == 0)
        .select(
            F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("kind"),
            F.encode(F.col("text"), "utf-8").alias("content"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        )
    )


def _fake_decode_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding': byte-histogram moments. Replaced
    by a real model when decoders exist."""
    if not content:
        return [0.0] * dim
    buckets = [0] * dim
    for b in content:
        buckets[b % dim] += 1
    n = len(content)
    return [round(c / n, 6) for c in buckets]


def extract_media_features(media: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    With real decoders: image → resize(64,64) → channel stats; audio →
    frame-sample → spectral stats. Without (this image): raises
    NotImplementedError inside the decode branch and falls back to the
    deterministic byte-histogram fake, flagged `decoded=false`.
    """
    if n_partitions:
        media = media.repartition(n_partitions, "media_id")
    have_decoders = media_decoders_available()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                content = row["content"] or b""
                if have_decoders:
                    # real path (not reachable in this container)
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg; see module docstring"
                    )
                n = len(content)
                counts: dict[int, int] = {}
                for b in content:
                    counts[b] = counts.get(b, 0) + 1
                ent = (
                    -sum((c / n) * math.log2(c / n) for c in counts.values())
                    if n
                    else 0.0
                )
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": n,
                        "byte_mean": round(sum(content) / n, 6) if n else 0.0,
                        "byte_entropy": round(ent, 6),
                        "feature": _fake_decode_features(content),
                        "decoded": False,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FEATURE_SCHEMA)
