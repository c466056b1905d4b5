"""JSONList (NDJSON) graph-asset source/sink — the reference's wire
format for parser output.

The reference reads graph assets as newline-delimited JSON
(`JSONList`, CrawlerListener.java:233-244): one JSON object per line,
elasticsearch-bulk-style ``{"index": …}`` directive lines skipped
(:272). Each document line carries the MCP `WebMapping` fields this
component consumes (:274-295): `url_s` (source URL), `canonical_s`,
and the four `FIELDS_IN_GRAPH` string arrays `inboundlinks_sxt`,
`outboundlinks_sxt`, `frames_sxt`, `iframes_sxt`; `images_sxt` exists
in the schema but is deliberately NOT followed (:55).

This module converts that format losslessly into the engine's spans
model (BASELINE.json input_hint):

    documents(doc_id string,
              spans array<struct<kind,text,media_ref,offset>>)

kind mapping: canonical_s → 'canonical', inboundlinks_sxt →
'inbound', outboundlinks_sxt → 'outbound', frames_sxt → 'frame',
iframes_sxt → 'iframe' — the FIELDS_IN_GRAPH declaration order
(:52-58) fixes the span offset order (the canonical insertion order
of SURVEY.md §5); images_sxt → kind 'media' with `media_ref` set and
`text` NULL, so the media links are retained for span-sequence
accounting but can never become frontier URLs (extract.py excludes
non-link kinds; F1 would drop them anyway).

Everything is JVM-side (`from_json` + array algebra) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (json field, span kind, is_media) in reference declaration order
# (canonical first — CrawlStartService.java:189-190 seeds exactly this
# field; then FIELDS_IN_GRAPH order CrawlerListener.java:52-58)
_FIELD_KINDS = [
    ("canonical_s", "canonical", False),
    ("inboundlinks_sxt", "inbound", False),
    ("outboundlinks_sxt", "outbound", False),
    ("frames_sxt", "frame", False),
    ("iframes_sxt", "iframe", False),
    ("images_sxt", "media", True),
]

JSONLIST_SCHEMA = (
    "url_s string, canonical_s string, "
    "inboundlinks_sxt array<string>, outboundlinks_sxt array<string>, "
    "frames_sxt array<string>, iframes_sxt array<string>, "
    "images_sxt array<string>, text_t string"
)

_SPAN_TYPE = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _spans_expr():
    """One expression building the ordered spans array from the parsed
    JSONList fields: offsets are the running position across fields in
    declaration order (deterministic canonical insertion order)."""
    pieces = []
    offset_base = F.lit(0)
    for field, kind, is_media in _FIELD_KINDS:
        if field == "canonical_s":
            arr = F.when(
                F.col("d.canonical_s").isNotNull(), F.array(F.col("d.canonical_s"))
            ).otherwise(F.array().cast("array<string>"))
        else:
            arr = F.coalesce(F.col(f"d.{field}"), F.array().cast("array<string>"))
        def _mk(_k: str, _m: bool, _b):
            def build(v, i):
                return F.struct(
                    F.lit(_k).alias("kind"),
                    (F.lit(None).cast("string") if _m else v).alias("text"),
                    (v if _m else F.lit(None).cast("string")).alias("media_ref"),
                    (_b + i).cast("int").alias("offset"),
                )

            return build

        # transform's (element, index) form handles empty arrays cleanly
        piece = F.transform(arr, _mk(kind, is_media, offset_base))
        pieces.append(piece)
        offset_base = offset_base + F.size(arr)
    out = pieces[0]
    for p in pieces[1:]:
        out = F.concat(out, p)
    # text content (text_t) rides last as a 'text' span when present
    text_span = F.when(
        F.col("d.text_t").isNotNull(),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("d.text_t").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                offset_base.cast("int").alias("offset"),
            )
        ),
    ).otherwise(F.array().cast(_SPAN_TYPE))
    return F.concat(out, text_span)


def read_jsonlist(spark: SparkSession, path: str) -> DataFrame:
    """Reference-format NDJSON graph asset → documents(doc_id, spans).

    Directive lines (``{"index": …}`` — no `url_s`) and unparseable
    lines are skipped, mirroring CrawlerListener.java:272 and the
    malformed-drop behavior."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.from_json(F.col("value"), JSONLIST_SCHEMA).alias("d")
    ).filter(F.col("d.url_s").isNotNull())
    return parsed.select(
        F.col("d.url_s").alias("doc_id"), _spans_expr().alias("spans")
    )


def write_jsonlist(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """documents(doc_id, spans) → reference-format NDJSON: the inverse
    mapping (span kinds back to WebMapping array fields), one JSON
    object per line — what a reference indexer/parser downstream would
    consume."""

    def kind_texts(kind: str):
        # NB: higher-order-function lambdas must have EXACT arity —
        # a default arg would be counted as the index parameter
        def match(s):
            return (s["kind"] == F.lit(kind)) & s["text"].isNotNull()

        return F.transform(F.filter(F.col("spans"), match), lambda s: s["text"])

    media_refs = F.transform(
        F.filter(
            F.col("spans"),
            lambda s: (s["kind"] == "media") & s["media_ref"].isNotNull(),
        ),
        lambda s: s["media_ref"],
    )
    out = docs.select(
        F.to_json(
            F.struct(
                F.col("doc_id").alias("url_s"),
                F.element_at(kind_texts("canonical"), 1).alias("canonical_s"),
                kind_texts("inbound").alias("inboundlinks_sxt"),
                kind_texts("outbound").alias("outboundlinks_sxt"),
                kind_texts("frame").alias("frames_sxt"),
                kind_texts("iframe").alias("iframes_sxt"),
                media_refs.alias("images_sxt"),
                F.element_at(kind_texts("text"), 1).alias("text_t"),
            )
        ).alias("value")
    )
    out.write.mode(mode).text(path)
