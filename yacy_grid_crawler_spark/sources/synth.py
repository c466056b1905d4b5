"""Spark-side deterministic synthetic spans corpus — the bench input.

Builds the BASELINE.json input_hint table
    documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)
entirely with JVM expressions over `spark.range(n)`: no Python loop, no
RNG state — md5-derived arithmetic only, so the same (n, hosts, links)
triple yields identical bytes on any cluster size. Host assignment is
cube-skewed (Zipf-ish hot head) to exercise the salting/skew path.

This generates the 10^x-URL synthetic frontier the BASELINE metric
names; scale it by raising `n_docs` — generation is O(n) narrow work,
no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_docs(
    spark: SparkSession,
    n_docs: int,
    n_hosts: int = 100,
    links_per_doc: int = 6,
    media_every: int = 5,
) -> DataFrame:
    """One row per page; links target (i*31 + k*7919) % n_docs."""
    df = spark.range(n_docs).withColumnRenamed("id", "i")
    # uniform [0,1) from md5, cubed → hot-host skew toward host 0
    u = (
        F.conv(F.substring(F.md5(F.col("i").cast("string")), 1, 8), 16, 10).cast(
            "double"
        )
        % 1000000
    ) / 1000000.0
    host_ord = F.least(
        F.floor(F.lit(n_hosts) * u * u * u).cast("int"), F.lit(n_hosts - 1)
    )
    host = F.concat(
        F.lit("host"), F.lpad(host_ord.cast("string"), 4, "0"), F.lit(".example.org")
    )

    def page_url(idx_col):
        hu = (
            F.conv(F.substring(F.md5(idx_col.cast("string")), 1, 8), 16, 10).cast(
                "double"
            )
            % 1000000
        ) / 1000000.0
        ho = F.least(F.floor(F.lit(n_hosts) * hu * hu * hu).cast("int"), F.lit(n_hosts - 1))
        return F.concat(
            F.lit("http://host"),
            F.lpad(ho.cast("string"), 4, "0"),
            F.lit(".example.org/page/"),
            idx_col.cast("string"),
            F.lit(".html"),
        )

    def messy_link(idx_col, k: int):
        """Deterministically de-canonicalize ~30% of link occurrences
        (upper-case scheme/host, #fragment, default port + '/./'
        segment) so the bench exercises the canonicalizer's slow path
        at a realistic web-crawl rate, not just the vectorized
        fast-gate. All variants normalize back to page_url(idx), so
        graph semantics are unchanged."""
        clean = page_url(idx_col)
        variant = F.pmod(idx_col * 13 + F.lit(k * 101), F.lit(10))
        return (
            F.when(
                variant == 7,
                # upper-case scheme+host only (path case is significant
                # and preserved by the normal form)
                F.regexp_replace(
                    F.regexp_replace(clean, "^http://host", "HTTP://HOST"),
                    r"\.example\.org/",
                    ".EXAMPLE.ORG/",
                ),
            )
            .when(variant == 8, F.concat(clean, F.lit("#sec"), F.lit(k)))
            .when(
                variant == 9,
                F.concat(
                    F.regexp_replace(clean, r"\.org/page/", ".org:80/./page/"),
                ),
            )
            .otherwise(clean)
        )

    df = df.withColumn("doc_id", page_url(F.col("i")))
    link_structs = [
        F.struct(
            F.lit("canonical").alias("kind"),
            F.col("doc_id").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    ]
    for k in range(1, links_per_doc + 1):
        tgt = (F.col("i") * 31 + k * 7919) % n_docs
        link_structs.append(
            F.struct(
                F.lit("outbound").alias("kind"),
                messy_link(tgt, k).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(k).alias("offset"),
            )
        )
    media = F.when(
        F.col("i") % media_every == 0,
        F.array(
            F.struct(
                F.lit("media").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.concat(host, F.lit("/asset/"), F.col("i").cast("string"), F.lit(".jpg")).alias(
                    "media_ref"
                ),
                F.lit(links_per_doc + 1).alias("offset"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"))
    return df.select(
        "doc_id", F.concat(F.array(*link_structs), media).alias("spans")
    )
