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
    """True when real image decode libs are importable (not in this
    container image)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def video_decoder_available() -> bool:
    """True when a real video demux/decode lib (PyAV) is importable
    (not in this container image)."""
    try:
        import av  # noqa: F401

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


def extract_media_features(media: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    With real decoders (PIL present): image blobs are decoded,
    resized to 64×64 RGB, and summarized by channel stats
    (`decoded=true`). Blobs that fail to decode — or any blob when the
    libs are absent, as in this container — fall back to the
    deterministic byte-histogram fake, flagged `decoded=false`
    (a corrupt blob degrades to the fallback; it never kills the job).
    """
    if n_partitions:
        media = media.repartition(n_partitions, "media_id")
    have_decoders = media_decoders_available()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = []
            # the loop is over BLOBS (one unit of decode work each);
            # all within-blob math is numpy over the decoded buffer
            for media_id, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                content = content or b""
                if have_decoders and kind == "image":
                    try:
                        import io

                        import PIL.Image

                        img = PIL.Image.open(io.BytesIO(content))
                        ow, oh = img.size
                        arr = np.asarray(
                            img.convert("RGB").resize((64, 64)),
                            dtype=np.float64,
                        )
                        gray = arr.mean(axis=2).astype(np.uint8)
                        counts = np.bincount(gray.ravel(), minlength=256)
                        p = counts[counts > 0] / gray.size
                        feature = [
                            round(float(x), 6)
                            for x in (
                                *arr.reshape(-1, 3).mean(axis=0) / 255.0,
                                *arr.reshape(-1, 3).std(axis=0) / 255.0,
                                ow / 65536.0,
                                oh / 65536.0,
                            )
                        ]
                        out.append(
                            {
                                "media_id": media_id,
                                "kind": kind,
                                "n_bytes": len(content),
                                "byte_mean": round(float(arr.mean()), 6),
                                "byte_entropy": round(
                                    float(-(p * np.log2(p)).sum()), 6
                                ),
                                "feature": feature,
                                "decoded": True,
                            }
                        )
                        continue
                    except Exception:
                        pass  # undecodable blob → deterministic fallback
                buf = np.frombuffer(content, dtype=np.uint8)
                n = buf.size
                if n:
                    counts = np.bincount(buf, minlength=256)
                    p = counts[counts > 0] / n
                    ent = float(-(p * np.log2(p)).sum())
                    mean = float(buf.mean())
                    hist = np.bincount(buf % 8, minlength=8) / n
                    feature = [round(float(x), 6) for x in hist]
                else:
                    ent, mean, feature = 0.0, 0.0, [0.0] * 8
                out.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "n_bytes": n,
                        "byte_mean": round(mean, 6),
                        "byte_entropy": round(ent, 6),
                        "feature": feature,
                        "decoded": False,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id string, kind string, content binary, width int, height int, "
    "decoded boolean"
)


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64,
    n_partitions: int | None = None,
) -> DataFrame:
    """Image resize over Arrow batches (mapInPandas). With PIL present
    the real path decodes, resizes, and emits raw 8-bit grayscale
    (`decoded=true`, len == width*height — same output size contract
    as the fake). Undecodable blobs, or all blobs when PIL is absent
    (this container), use the deterministic fake that tiles/truncates
    the byte buffer to width×height (`decoded=false`)."""
    if n_partitions:
        media = media.repartition(n_partitions, "media_id")
    have_decoders = media_decoders_available()
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            pdf = pdf[pdf["kind"] == "image"]
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                content = content or b""
                if have_decoders:
                    try:
                        import io

                        import PIL.Image

                        img = PIL.Image.open(io.BytesIO(content))
                        resized = img.convert("L").resize((width, height))
                        out.append(
                            {
                                "media_id": media_id,
                                "kind": "image",
                                "content": resized.tobytes(),
                                "width": width,
                                "height": height,
                                "decoded": True,
                            }
                        )
                        continue
                    except Exception:
                        pass  # undecodable blob → deterministic fallback
                buf = np.frombuffer(content, dtype=np.uint8)
                resized = (
                    np.resize(buf, target) if buf.size else np.zeros(target, np.uint8)
                )
                out.append(
                    {
                        "media_id": media_id,
                        "kind": "image",
                        "content": resized.tobytes(),
                        "width": width,
                        "height": height,
                        "decoded": False,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = (
    "media_id string, frame_no int, ts_ms int, frame binary, decoded boolean"
)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """Video frame sampling over Arrow batches: one output row per
    sampled timestamp (`every_ms` grid, capped at `max_frames`). With
    PyAV present the real path seeks and decodes the nearest keyframe
    per grid point and emits raw grayscale frame bytes
    (`decoded=true`); undecodable blobs, or all blobs when PyAV is
    absent (this container), use the deterministic fake that slices
    the byte buffer proportionally to the timestamp so frame counts,
    ordering, and schema are exercised for real (`decoded=false`)."""
    if n_partitions:
        media = media.repartition(n_partitions, "media_id")
    have_decoders = video_decoder_available()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            pdf = pdf[pdf["kind"] == "video"]
            out = []
            for media_id, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                content = content or b""
                if have_decoders:
                    # accumulate locally and extend `out` only once the
                    # WHOLE blob decodes: an exception mid-blob must not
                    # leave partial real frames that the fallback would
                    # then duplicate as a second (media_id, frame_no) set
                    real: list = []
                    try:
                        import io

                        import av

                        with av.open(io.BytesIO(content)) as container:
                            stream = container.streams.video[0]
                            for i in range(max_frames):
                                ts = i * every_ms
                                if dur and ts >= int(dur):
                                    break
                                container.seek(
                                    int(ts * 1000), stream=stream, any_frame=False
                                )
                                frame = next(container.decode(stream))
                                gray = frame.to_ndarray(format="gray")
                                real.append(
                                    {
                                        "media_id": media_id,
                                        "frame_no": i,
                                        "ts_ms": ts,
                                        "frame": gray.tobytes(),
                                        "decoded": True,
                                    }
                                )
                        if real:
                            out.extend(real)
                            continue
                    except Exception:
                        pass  # discard partial frames → deterministic fallback
                dur = int(dur or 0)
                n_frames = min(max(dur // every_ms, 1), max_frames)
                buf = np.frombuffer(content, dtype=np.uint8)
                for i in range(n_frames):
                    ts = i * every_ms
                    if buf.size:
                        a = (i * buf.size) // max(n_frames, 1)
                        b = ((i + 1) * buf.size) // max(n_frames, 1)
                        frame = buf[a:b].tobytes()
                    else:
                        frame = b""
                    out.append(
                        {
                            "media_id": media_id,
                            "frame_no": i,
                            "ts_ms": ts,
                            "frame": frame,
                            "decoded": False,
                        }
                    )
            if out:
                yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


def sniff_media_type(media: DataFrame, content_col: str = "content") -> DataFrame:
    """Magic-number content-type sniffing over opaque binary blobs —
    the first thing a multimodal ingest does with crawled bytes
    (declared Content-Type headers lie; the magic bytes don't).
    Detects PNG / JPEG / GIF / WebP / WAV (RIFF-discriminated) / MP4
    (ftyp at byte 5); everything else is application/octet-stream.

    Pure codegen: ONE binary substring (first 16 bytes) hexed to a
    string, then literal prefix/position compares — no UDF, no
    shuffle; the blob column itself is read but never moved. The
    DuckDB oracle hexes the whole blob and string-substrings the hex
    (DuckDB lacks BLOB substring) — byte-identical semantics.

    Output: (media_id, sniffed_type, magic_hex)."""
    h = F.upper(F.hex(F.expr(f"substring({content_col}, 1, 16)")))
    riff_tag = F.substring(h, 17, 8)  # bytes 9-12
    sniffed = (
        F.when(h.startswith("89504E47"), F.lit("image/png"))
        .when(h.startswith("FFD8FF"), F.lit("image/jpeg"))
        .when(h.startswith("474946"), F.lit("image/gif"))
        .when(
            h.startswith("52494646"),
            F.when(riff_tag == "57454250", F.lit("image/webp"))
            .when(riff_tag == "57415645", F.lit("audio/wav"))
            .otherwise(F.lit("application/riff")),
        )
        .when(F.substring(h, 9, 8) == "66747970", F.lit("video/mp4"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return media.select(
        "media_id",
        sniffed.alias("sniffed_type"),
        F.substring(h, 1, 24).alias("magic_hex"),
    )


def dedup_media_blobs(media: DataFrame, content_col: str = "content") -> DataFrame:
    """Exact binary-blob dedup: identical media bytes collapse to one
    canonical keeper (min media_id), every row annotated with its
    group size — the image/audio dedup step of a multimodal pipeline
    (the same asset re-crawled under many URLs is stored once).

    Scale shape: the BLOB never shuffles — the first projection
    reduces each row to (media_id, md5, octet_length) before the
    single blob_md5-keyed window (group stats via count/min over the
    partition; partitioned by hash, never a single partition).  At
    10^10 assets the md5 key is uniform so no salting is needed.
    """
    from pyspark.sql import Window

    narrow = media.select(
        "media_id",
        F.md5(F.col(content_col)).alias("blob_md5"),
        F.octet_length(F.col(content_col)).cast("long").alias("n_bytes"),
    )
    w = Window.partitionBy("blob_md5")
    return narrow.select(
        "media_id",
        "blob_md5",
        "n_bytes",
        F.count(F.lit(1)).over(w).alias("n_refs"),
        F.min("media_id").over(w).alias("keeper_id"),
        (F.col("media_id") == F.min("media_id").over(w)).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# Perceptual near-dup for media blobs: dHash + Hamming-band LSH.
#
# Exact blob dedup (dedup_media_blobs) misses the most common web case:
# the SAME image re-encoded (quality level, strip-EXIF, resize) under
# different bytes. A difference hash (dHash) is the classic cheap
# perceptual fingerprint: compare adjacent region brightnesses and keep
# the comparison bits — re-encodes land within a few flipped bits.
# The hash is 63 bits so it always fits a signed Spark LongType.
# ---------------------------------------------------------------------------

PHASH_SCHEMA = "media_id string, kind string, phash long, decoded boolean"

_PHASH_REGIONS = 64  # 64 region values -> 63 adjacent-comparison bits
PHASH_BITS = _PHASH_REGIONS - 1


def _dhash_bits(values) -> int:
    """63-bit dHash from a length-64 int vector: bit i set iff
    values[i] > values[i+1]. Top bit (2^63) never used, so the result
    is non-negative in a signed 64-bit long."""
    import numpy as np

    v = np.asarray(values, dtype=np.int64)
    bits = (v[:-1] > v[1:]).astype(np.uint64)
    return int((bits << np.arange(PHASH_BITS, dtype=np.uint64)).sum())


def perceptual_hash(media: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Perceptual difference-hash over Arrow batches (mapInPandas).

    Real path (PIL importable, `kind='image'`, blob decodes): grayscale
    64x1 strip resize gives 64 region means; 63 adjacent comparisons
    make the hash (`decoded=true`). Fallback — any blob when PIL is
    absent (this container), non-images, or corrupt blobs — is the
    deterministic closed-form fake the DuckDB oracle reproduces: the
    blob's utf-8 code points (raw byte values if not valid utf-8) are
    cut into 64 contiguous chunks with boundaries floor(i*n/64); chunk
    SUMS are the region values, same comparison rule (`decoded=false`).
    A corrupt blob degrades to the fallback; it never kills the job.

    Scale shape: one narrow output row (8-byte hash) per blob, blob
    bytes never shuffle (mapInPandas reads them in place); decode
    parallelism is sized independently via `repartition(n, media_id)`.
    """
    if n_partitions:
        media = media.repartition(n_partitions, "media_id")
    have_decoders = media_decoders_available()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = []
            for media_id, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                content = content or b""
                if have_decoders and kind == "image":
                    try:
                        import io

                        import PIL.Image

                        img = PIL.Image.open(io.BytesIO(content))
                        strip = np.asarray(
                            img.convert("L").resize((_PHASH_REGIONS, 1)),
                            dtype=np.int64,
                        ).ravel()
                        out.append(
                            {
                                "media_id": media_id,
                                "kind": kind,
                                "phash": _dhash_bits(strip),
                                "decoded": True,
                            }
                        )
                        continue
                    except Exception:
                        pass  # undecodable blob -> deterministic fallback
                try:
                    vals = np.frombuffer(
                        content.decode("utf-8").encode("utf-32-le"),
                        dtype=np.uint32,
                    ).astype(np.int64)
                except Exception:
                    vals = np.frombuffer(content, dtype=np.uint8).astype(np.int64)
                n = vals.size
                # chunk sums with floor(i*n/64) boundaries; cumsum-diff
                # handles empty chunks (n < 64) exactly like the
                # oracle's COALESCE(list_sum(...), 0)
                bounds = (np.arange(_PHASH_REGIONS + 1, dtype=np.int64) * n) // _PHASH_REGIONS
                csum = np.concatenate([[0], np.cumsum(vals)])
                sums = csum[bounds[1:]] - csum[bounds[:-1]]
                out.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "phash": _dhash_bits(sums),
                        "decoded": False,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return media.mapInPandas(batches, PHASH_SCHEMA)


def phash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
    hash_col: str = "phash",
    band_df_cap: int | None = None,
) -> DataFrame:
    """Hamming-band LSH self-join over 63-bit perceptual hashes — the
    media analogue of the SimHash banded join (dedup_text.py).

    The hash is split into 7 bands of 9 bits; candidates are pairs
    sharing ANY band value (one equi-join, never all-pairs). By
    pigeonhole a pair with hamming distance <= 6 cannot differ in all
    7 bands, so the candidate set is a SUPERSET of every true pair and
    the bit_count verify makes the result exact — hence
    `max_hamming <= 6` is enforced.

    Scale shape: 7 narrow rows (id, hash, band) per blob, one
    shuffle on (band_no, band_val), AQE splits skewed buckets. A
    degenerate corpus (millions of identical hashes) makes one bucket
    quadratic — `band_df_cap` drops buckets hotter than the cap
    (documented recall loss, same df-cap escape hatch as the n-gram
    Jaccard join). Output: (media_id_a, media_id_b, hamming), exact
    and duplicate-free.
    """
    from yacy_grid_crawler_spark.operators.dedup_text import (
        banded_hamming_pairs,
    )

    return banded_hamming_pairs(
        hashes,
        bits=PHASH_BITS,
        max_hamming=max_hamming,
        id_col=id_col,
        hash_col=hash_col,
        out_a=f"{id_col}_a",
        out_b=f"{id_col}_b",
        n_bands=7,
        band_df_cap=band_df_cap,
    )


def video_near_pairs(
    frames: DataFrame,
    min_containment: float = 0.5,
    sig_df_cap: int | None = None,
) -> DataFrame:
    """Video near-dup from shared frames: two videos are near-dups
    when most of the shorter one's sampled frames appear (byte-exact)
    in the other — catches re-muxed, trimmed, and re-uploaded copies
    whose container bytes (and so blob md5) differ while frame content
    survives. Input is `sample_frames` output (media_id, frame bytes).

    Frame signature is md5 of the frame's UPPERCASE HEX — a string
    md5, because the DuckDB oracle has no blob md5; byte-identical
    frames get identical signatures in both engines. Containment =
    |shared distinct sigs| / min(n_frames_a, n_frames_b), the same
    asymmetric measure as the shingle containment join
    (dedup_text.py::containment_pairs), at video granularity.

    Scale shape: frames collapse to (media_id, 32-char sig) BEFORE
    anything shuffles — frame bytes never move; then the classic
    inverted-index geometry: one equi-join on frame_sig (never
    all-pairs), one pair agg, two broadcast-size joins for the frame
    counts. Real corpora have degenerate ubiquitous frames (black
    intro/outro cards shared by millions of videos) — `sig_df_cap`
    drops signatures hotter than the cap, the same escape hatch as
    the n-gram join's df-cap (documented recall loss on pairs whose
    ONLY overlap is degenerate frames, which is the point).

    Output: (media_id_a, media_id_b, shared_frames, containment),
    containment rounded to 4dp, filtered to >= min_containment.
    """
    sigs = frames.select(
        "media_id",
        F.md5(F.upper(F.hex(F.col("frame")))).alias("frame_sig"),
    ).distinct()
    if sig_df_cap is not None:
        hot = (
            sigs.groupBy("frame_sig")
            .count()
            .filter(F.col("count") > sig_df_cap)
            .select("frame_sig")
        )
        sigs = sigs.join(F.broadcast(hot), "frame_sig", "left_anti")
    sizes = sigs.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.frame_sig") == F.col("b.frame_sig"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_frames"))
    )
    sa = sizes.select(
        F.col("media_id").alias("media_id_a"), F.col("n_frames").alias("_na")
    )
    sb = sizes.select(
        F.col("media_id").alias("media_id_b"), F.col("n_frames").alias("_nb")
    )
    return (
        shared.join(sa, "media_id_a")
        .join(sb, "media_id_b")
        .select(
            "media_id_a",
            "media_id_b",
            "shared_frames",
            F.round(
                F.col("shared_frames")
                / F.least(F.col("_na"), F.col("_nb")).cast("double"),
                4,
            ).alias("containment"),
        )
        .filter(F.col("containment") >= min_containment)
    )
