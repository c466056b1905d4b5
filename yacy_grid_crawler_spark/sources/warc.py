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

from pyspark.sql import DataFrame, Window
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


# ---------------------------------------------------------------------------
# SURT keys + CDX capture index — the lookup side of the archive the
# crawler writes. The reference emits WARC assets per batch
# (CrawlerListener.java:497-503, 546, 563); every real consumer of
# those archives (wayback-style replay, recrawl diffing) addresses
# them through a CDX index keyed by SURT (Sort-friendly URI Reordering
# Transform — the Heritrix/OpenWayback convention, public spec).
# ---------------------------------------------------------------------------

def surt_key(url_col) -> "F.Column":
    """SURT canonical sort key for a URL, pure codegen string ops.

    Rules applied (documented subset of the Heritrix canonicalizer —
    deterministic, engine-neutral):
      * lowercase everything, strip the scheme and any '#fragment';
      * drop a leading 'www.' host label and any userinfo;
      * reverse the remaining host labels and join with ',' then ')';
      * path kept verbatim ('/' when absent);
      * query parameters split on '&', empties dropped, SORTED and
        re-joined (param order never changes replay identity).

    'http://WWW.News.Example.org/A/b?z=1&a=2' →
    'org,example,news)/a/b?a=2&z=1'. Zero shuffles — a map over the
    scan; at 100 TB the key is computed in the same stage that writes
    the CDX shard.
    """
    u = F.substring_index(
        F.regexp_replace(F.lower(url_col), r"^[a-z]+://", ""), "#", 1
    )
    hostport = F.substring_index(
        F.substring_index(F.regexp_extract(u, r"^([^/?]*)", 1), "@", -1),
        ":",
        1,
    )
    host = F.regexp_replace(hostport, r"^www\.", "")
    # everything after the authority ('' | '/path[?q]' | '?q')
    rest = F.substring(u, F.length(F.regexp_extract(u, r"^([^/?]*)", 1)) + 1, 1 << 20)
    path = F.substring_index(rest, "?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        rest.contains("?"), F.substring_index(rest, "?", -1)
    ).otherwise(F.lit(""))
    params = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda p: p != "")), "&"
    )
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        path,
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params)),
    )


def cdx_index(captures: DataFrame, url_col: str = "url",
              ts_col: str = "ts", digest_col: str = "digest") -> DataFrame:
    """CDX-shaped capture index over (url, ts, digest) rows: one row
    per capture with its SURT `urlkey` and a `revisit` flag — true
    when the capture's payload digest equals the PREVIOUS capture of
    the same urlkey in timestamp order (the CDX 'revisit record'
    dedup rule: replay stores the body once and points later
    identical captures at it).

    Scale shape: surt_key is a map; the only movement is ONE hash
    exchange on urlkey for the lag window — per-key capture counts
    are bounded (captures of one URL), so no skewed/global window. A
    production CDX writer range-partitions on (urlkey, ts) so shard
    files concatenate into the sorted index; the flag computed here
    is partition-local either way.
    """
    w = Window.partitionBy("urlkey").orderBy(ts_col)
    return (
        captures.withColumn("urlkey", surt_key(F.col(url_col)))
        .withColumn(
            "revisit",
            F.coalesce(
                F.lag(digest_col).over(w) == F.col(digest_col), F.lit(False)
            ),
        )
        .select("urlkey", F.col(ts_col).alias("ts"),
                F.col(digest_col).alias("digest"), "revisit")
    )
