"""robots.txt text parsing → the per-host rules dimension the wave
consumes.

The reference delegates robots fetching/parsing to its loader
component (the crawler consumes only the verdicts); this engine's
robots gate (`operators/filters.py::robots_verdict`) and politeness
delays (`operators/batching.py::politeness_slots`) both take a
`(host, disallow_prefixes, crawl_delay_ms)` dimension table. This
module closes the loop: given raw robots.txt BODIES (host, text), it
produces that dimension with pure codegen expressions — no UDFs — so
the parse has an exactly-equivalent DuckDB oracle and runs inside
whole-stage codegen next to the fetch that produced the bodies.

Deliberately simplified, documented contract (the deterministic core
of the de-facto robots.txt grammar):

* every ``Disallow: <prefix>`` line contributes its trimmed prefix,
  regardless of which user-agent group it sits in (the engine crawls
  as ``*`` and honors the union — the conservative reading);
* empty ``Disallow:`` lines (the "allow everything" idiom) are
  dropped;
* ``crawl_delay_ms`` = 1000 × the FIRST integer ``Crawl-delay:``
  value, 0 when absent;
* directive matching is exact-case (``Disallow:``/``Crawl-delay:``),
  line-oriented, CRLF-safe.

Scale shape: a narrow per-row map over the robots-body table — no
shuffle, no join; the output is the host-cardinality dim that
`robots_verdict` consumes as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(
    bodies: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → (host, disallow_prefixes, crawl_delay_ms)."""
    lines = f"transform(split({text_col}, '\\r?\\n'), l -> trim(l))"
    prefixes = (
        f"filter(transform(filter({lines}, l -> startswith(l, 'Disallow:')),"
        f" l -> trim(substring(l, 10))), p -> p != '')"
    )
    # no-match regexp_extract yields '' — branch on it instead of
    # casting, because CAST('' AS INT) throws under ANSI mode (Spark 4
    # default) and in DuckDB
    m = f"regexp_extract({text_col}, '(?m)^Crawl-delay: *([0-9]+)', 1)"
    delay = f"(case when {m} = '' then 0 else cast({m} as int) end) * 1000"
    return bodies.select(
        F.col(host_col).alias("host"),
        F.expr(prefixes).alias("disallow_prefixes"),
        F.expr(delay).cast("int").alias("crawl_delay_ms"),
    )


def robots_sitemaps(
    bodies: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → one row per ``Sitemap: <url>`` directive
    (host, sitemap_url) — the discovery half of the sitemap loop
    (`seeds.parse_sitemap` expands the fetched documents). Same
    contract style as parse_robots: exact-case directive, line
    oriented, CRLF-safe, pure codegen; hosts without sitemap lines
    produce no rows (inner explode)."""
    urls = (
        f"transform(filter(transform(split({text_col}, '\\r?\\n'),"
        " l -> trim(l)), l -> startswith(l, 'Sitemap:')),"
        " l -> trim(substring(l, 9)))"
    )
    return bodies.select(
        F.col(host_col).alias("host"),
        F.explode(F.expr(f"filter({urls}, u -> u != '')")).alias(
            "sitemap_url"
        ),
    )
