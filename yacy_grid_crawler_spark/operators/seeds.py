"""S1/S2/P5 — seed-list source: splitter, canonicalization, good/bad
partition, crawl-id stamping.

Reference: CrawlstartURLSplitter (CrawlerListener.java:110-140) —
separators ``|http``, ``%7Chttp``, ``%0D%0A``, ``%0A``, ``%0D``,
space → newline; each piece parsed, malformed pieces diverted to
``badURLStrings``. Used from CrawlStartService.java:105.

Spark-first: the separator normalization is pure JVM
(`regexp_replace` chain + `split` + `explode` + `posexplode` for seed
ordinals); only the parse/canonicalize step uses the Arrow UDF kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import canonicalize

# (pattern, replacement) — order mirrors CrawlerListener.java:117
_SEPARATOR_RULES = [
    (r"\|http", "\nhttp"),
    (r"%7Chttp", "\nhttp"),
    (r"%0D%0A", "\n"),
    (r"%0A", "\n"),
    (r"%0D", "\n"),
    (r" ", "\n"),
]


def split_seed_column(col):
    """Column expression: raw seed string → array of url strings."""
    c = col
    for pat, rep in _SEPARATOR_RULES:
        c = F.regexp_replace(c, pat, rep)
    return F.split(c, "\n")


def split_seeds(spark: SparkSession, seed_strings: list[str]) -> DataFrame:
    """seeds → (seed_ord, url_raw, url) with url NULL for malformed.

    Callers partition into good (`url IS NOT NULL`) and bad seeds
    (CrawlerListener.java:122-131).
    """
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seed_strings)], "seed_ord int, seed_raw string"
    )
    return (
        df.select(
            "seed_ord",
            F.posexplode(split_seed_column(F.col("seed_raw"))).alias("piece_ord", "url_raw"),
        )
        .filter(F.col("url_raw") != "")
        .withColumn("url", canonicalize(F.col("url_raw")))
        .select("seed_ord", "piece_ord", "url_raw", "url")
    )


def parse_sitemap(
    df: DataFrame, xml_col: str = "sitemap_xml", keep: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Sitemap seed expansion: extract every ``<loc>`` URL from
    sitemap XML bodies — the other bulk seed source next to the S1
    splitter (YaCy's loader feeds sitemap URLs into crawl starts; the
    splitter then treats each as a seed). Regex extraction, not an
    XML parser, deliberately: sitemaps are machine-generated with a
    fixed element shape, the regex stays in whole-stage codegen, and
    the same pattern runs verbatim in the DuckDB oracle. One output
    row per loc; malformed/empty bodies simply yield no rows.
    """
    locs = F.expr(f"regexp_extract_all({xml_col}, '<loc>([^<]+)</loc>', 1)")
    return df.select(*keep, F.explode(locs).alias("loc"))
