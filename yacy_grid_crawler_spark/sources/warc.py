"""WARC record serializer/parser — the reference's archival format.

The reference flushes every fetched page into a WARC asset
(`CrawlerListener.java:501` builds `{base}/warc/{id}/{docname}.warc.gz`
and hands it to the loader as `sourceasset`/`targetasset`, :546/:563).
The crawler component itself never re-reads WARC, but a user of the
reference owns those archives, so the engine provides the record
format as a first-class operator pair: a builder that renders
standards-shaped WARC/1.0 response records and a parser that inverts
it — both pure whole-stage-codegen string expressions (concat /
regexp_extract), zero Python, zero shuffle.

Record shape (ISO 28500 response record over a text payload):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Record-ID: <urn:md5:{md5(target_uri)}>\r\n
    WARC-Date: {date}\r\n
    WARC-Target-URI: {target_uri}\r\n
    Content-Type: text/plain; charset=utf-8\r\n
    Content-Length: {octet_length(payload)}\r\n
    \r\n
    {payload}\r\n\r\n

Content-Length is the BYTE length of the payload (octet_length), not
the character count — the distinction matters for any non-ASCII page
and is the field real WARC consumers seek on.

At 100 TB the builder is a map-only projection: records are derived
per-row on whatever partitioning the scan produced, and writing them
through the asset-name lineage (operators/batching.py::asset_columns)
gives one `.warc` object per (crawl, depth, partition) with no
repartition — the same geometry the reference's per-batch flush has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"
WARC_DATE_DEFAULT = "2026-01-01T00:00:00Z"


def build_warc_records(
    docs: DataFrame,
    uri_col: str = "target_uri",
    payload_col: str = "text",
    date: str = WARC_DATE_DEFAULT,
) -> DataFrame:
    """Append `warc_record` (the full WARC/1.0 response record as one
    string) and `record_bytes` (its octet length) to `docs`.

    Pure codegen: one concat over the row's columns — no UDF, no
    shuffle, safe to fuse into any upstream scan.
    """
    uri = F.col(uri_col)
    payload = F.col(payload_col)
    record = F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"),
        F.md5(uri),
        F.lit(">" + CRLF),
        F.lit("WARC-Date: " + date + CRLF),
        F.lit("WARC-Target-URI: "),
        uri,
        F.lit(CRLF),
        F.lit("Content-Type: text/plain; charset=utf-8" + CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(CRLF + CRLF),
        payload,
        F.lit(CRLF + CRLF),
    )
    return docs.withColumns(
        {
            "warc_record": record,
            "record_bytes": F.octet_length(record).cast("long"),
        }
    )


# Header values never contain CR/LF; the payload is everything between
# the FIRST blank line (non-greedy prefix) and the closing CRLF CRLF.
_HDR = {
    "record_id": r"WARC-Record-ID: <([^>\r\n]*)>",
    "warc_date": r"WARC-Date: ([^\r\n]*)",
    "target_uri": r"WARC-Target-URI: ([^\r\n]*)",
    "content_type": r"Content-Type: ([^\r\n]*)",
}
_LEN = r"Content-Length: ([0-9]+)"
_PAYLOAD = r"(?s)^.*?\r\n\r\n(.*)\r\n\r\n$"


def parse_warc_records(
    records: DataFrame, record_col: str = "warc_record"
) -> DataFrame:
    """Invert :func:`build_warc_records`: extract the response headers
    and payload from each record string.

    Returns (record_id, warc_date, target_uri, content_type,
    content_length, payload, length_ok) — `length_ok` checks the
    declared Content-Length against the parsed payload's octet length,
    the integrity test an archive reader runs per record. All
    regexp_extract codegen; Java and RE2 agree on every pattern used
    ((?s), non-greedy, char classes only).
    """
    rec = F.col(record_col)
    payload = F.regexp_extract(rec, _PAYLOAD, 1)
    n = F.regexp_extract(rec, _LEN, 1).cast("int")
    return records.select(
        *[
            F.regexp_extract(rec, pat, 1).alias(name)
            for name, pat in _HDR.items()
        ],
        n.alias("content_length"),
        payload.alias("payload"),
        (F.octet_length(payload) == n).alias("length_ok"),
    )
