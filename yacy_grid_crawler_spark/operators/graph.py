"""Link-graph analytics for crawl prioritization.

The reference's frontier is FIFO-within-priority-lane; a web-scale
crawler prioritizes by link authority. This module adds PageRank over
the document link graph as the scoring input to the priority lanes
(G4) — the classic crawl-ordering signal.

Exact-arithmetic design: floating-point PageRank sums in a DIFFERENT
ORDER on every shuffle, so engine-vs-oracle equality would hinge on
rounding luck. With damping 1/2 over a uniform out-degree-3 graph the
iteration has an exact INTEGER form: let s_t(v) = pr_t(v) * n * 6^t;
then

    s_0(v)   = 1
    s_{t+1}(v) = 3 * 6^t  +  sum over in-neighbors u of s_t(u)

(bigint-safe for 10 iterations on 10^6 nodes), and the DuckDB oracle
reproduces it bit-exactly with a recursive CTE. `pagerank_scaled`
returns s_T — monotone in true PageRank, which is all a priority
ordering needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_ITERS = 6
OUT_DEGREE = 3  # the synthetic edge generator emits k=1..3 per node


def synthetic_edges(docs: DataFrame) -> DataFrame:
    """The deterministic link graph shared with the BFS flagship
    query: doc d links to (d*17 + k) % n for k in 1..3."""
    n = docs.count()
    return docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(*[((F.col("doc_id") * 17 + k) % n) for k in (1, 2, 3)])
        ).alias("dst"),
    )


def pagerank_scaled(
    docs: DataFrame,
    edges: DataFrame | None = None,
    iters: int = PR_ITERS,
    cache_registry: list | None = None,
) -> DataFrame:
    """(doc_id, pr_scaled) — s_T from the integer recurrence above.
    One equi-join + one map-side-combining sum-agg shuffle per
    iteration (the standard distributed power-iteration shape);
    `localCheckpoint` per round keeps the plan O(1) like the BFS
    driver loop. Skew note: in-degree hubs concentrate one agg key —
    at 10^10-edge scale the same salting used for hot hosts applies
    (two-level aggregation); AQE skew-join covers the join side."""
    if edges is None:
        edges = synthetic_edges(docs)
    edges = edges.persist()
    if cache_registry is not None:
        cache_registry.append(edges)
    ranks = docs.select(
        "doc_id", F.lit(1).cast("long").alias("s")
    ).localCheckpoint()
    teleport = 3  # 3 * 6^t, tracked exactly
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("s").alias("in_sum"))
        )
        ranks = (
            ranks.select("doc_id")
            .join(contrib, "doc_id", "left")
            .select(
                "doc_id",
                (F.lit(teleport) + F.coalesce(F.col("in_sum"), F.lit(0)))
                .cast("long")
                .alias("s"),
            )
            .localCheckpoint()
        )
        teleport *= 6
    return ranks.select("doc_id", F.col("s").alias("pr_scaled"))


TRUST_ITERS = 6


def trustrank_scaled(
    docs: DataFrame,
    edges: DataFrame | None = None,
    iters: int = TRUST_ITERS,
    seed_col: str = "is_seed",
    cache_registry: list | None = None,
) -> DataFrame:
    """(doc_id, trust_scaled) — TrustRank (Gyöngyi, Garcia-Molina &
    Pedersen, VLDB 2004): PageRank whose teleport mass lands ONLY on
    a curated trusted-seed set, so trust decays with link distance
    from the seeds and spam farms unreachable from them score zero.
    The crawl-priority complement to `pagerank_scaled`: PR says
    "popular", TrustRank says "popular AND reachable from pages we
    vetted" — the standard frontier anti-spam signal.

    `docs` must carry an integer 0/1 `seed_col`. Same exact-integer
    trick as PageRank (damping 1/2, uniform out-degree 3): with
    w(v) ∈ {0,1} the seed flag, define s_t(v) = trust_t(v)·|S|·6^t;
    then

        s_0(v)     = w(v)
        s_{t+1}(v) = 3·6^t·w(v)  +  sum over in-neighbors u of s_t(u)

    is a bigint recurrence the DuckDB oracle reproduces bit-exactly,
    and s_T is monotone in true TrustRank — all an ordering needs.
    An un-trusted node keeps s ≡ 0 until trust REACHES it through
    links, so "distance-from-seed decay" is structural, not tuned.

    Scale shape per round: identical to `pagerank_scaled` — one
    edge⋈score equi-join + one map-side-combining long-sum agg;
    `localCheckpoint` keeps the plan O(1) in t; in-degree hubs are
    the salting/AQE-skew candidates exactly as documented there."""
    if edges is None:
        edges = synthetic_edges(docs)
    edges = edges.persist()
    if cache_registry is not None:
        cache_registry.append(edges)
    base = docs.select(
        "doc_id", F.col(seed_col).cast("long").alias("w")
    ).localCheckpoint()
    ranks = base.select("doc_id", F.col("w").alias("s"), "w")
    teleport = 3  # 3·6^t, tracked exactly
    for _ in range(iters):
        contrib = (
            edges.join(ranks.select("doc_id", "s"), edges.src == F.col("doc_id"))
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("s").alias("in_sum"))
        )
        ranks = (
            base.join(contrib, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.lit(teleport) * F.col("w")
                    + F.coalesce(F.col("in_sum"), F.lit(0))
                )
                .cast("long")
                .alias("s"),
                "w",
            )
            .localCheckpoint()
        )
        teleport *= 6
    return ranks.select("doc_id", F.col("s").alias("trust_scaled"))


HITS_ITERS = 4


def hits_scores(
    docs: DataFrame,
    edges: DataFrame | None = None,
    iters: int = HITS_ITERS,
    cache_registry: list | None = None,
) -> DataFrame:
    """(doc_id, auth, hub) — Kleinberg HITS over the link graph, the
    complement to PageRank for crawl prioritization (authorities are
    index-worthy targets; hubs are frontier-expansion-worthy link
    pages). Same exact-arithmetic trick as `pagerank_scaled`:
    unnormalized HITS is a pure integer recurrence

        hub_0(v) = 1
        auth_{t+1}(v) = sum over in-neighbors u  of hub_t(u)
        hub_{t+1}(v)  = sum over out-neighbors w of auth_{t+1}(w)

    and the unnormalized iterates are monotone in the normalized
    scores (normalization rescales all of a side uniformly), which is
    all a priority ORDERING needs. Values grow ~(indeg·outdeg)^t — at
    out-degree 3 that is 9^t, bigint-safe far past any useful t.

    Scale shape per half-step: one equi-join (edge table against the
    current score vector) + one map-side-combining long-sum agg —
    identical geometry to the PageRank round and to every distributed
    power iteration; `localCheckpoint` keeps the plan O(1) in t. The
    in-degree hub key is the skew point; two-level (salted) agg and
    AQE skew-join apply exactly as documented on `pagerank_scaled`."""
    if edges is None:
        edges = synthetic_edges(docs)
    edges = edges.persist()
    if cache_registry is not None:
        cache_registry.append(edges)
    ids = docs.select("doc_id")
    hub = ids.select(
        "doc_id", F.lit(1).cast("long").alias("hub")
    ).localCheckpoint()
    auth = ids.select("doc_id", F.lit(0).cast("long").alias("auth"))
    for _ in range(iters):
        in_sum = (
            edges.join(hub, edges.src == hub.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("hub").alias("in_sum"))
        )
        auth = (
            ids.join(in_sum, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("in_sum", F.lit(0)).cast("long").alias("auth"),
            )
            .localCheckpoint()
        )
        out_sum = (
            edges.join(auth, edges.dst == auth.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.sum("auth").alias("out_sum"))
        )
        hub = (
            ids.join(out_sum, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("out_sum", F.lit(0)).cast("long").alias("hub"),
            )
            .localCheckpoint()
        )
    return auth.join(hub, "doc_id").select("doc_id", "auth", "hub")


HOST_RE = r"^[a-z]+://(?:[^/@]*@)?([^/:?]+)"  # same extractor as plans/wave.py


def link_host_stats(links: DataFrame) -> DataFrame:
    """Per-target-host inlink aggregation over a (src_url, dst_url)
    link table — the second classic crawl-priority signal next to
    PageRank (a host pointed at by many DISTINCT source hosts is
    authoritative; one pointed at by many links from ONE host is a
    link farm). Mirrors the graph-side WebMapping the reference emits
    per document (CrawlerListener.java graph assets carry the
    outlink lists); this op is the reduce over those assets.

    Output per dst_host: n_inlinks (total edges in), n_src_hosts
    (distinct referring hosts), n_dst_urls (distinct target URLs on
    the host). Host extraction uses the wave's own regex so the
    numbers key exactly like politeness/sharding do.

    Scale shape: one hash aggregate keyed on dst_host; the two
    count_distincts rewrite to a single expand + two-level partial
    aggregate (no per-group sets materialize); Zipf head hosts are
    the usual salting candidates but the expand already splits the
    key across (host, value) before the final reduce, so the hot key
    only concentrates the LAST narrow stage.
    """
    hosts = links.select(
        F.regexp_extract(F.col("src_url"), HOST_RE, 1).alias("src_host"),
        F.regexp_extract(F.col("dst_url"), HOST_RE, 1).alias("dst_host"),
        F.col("dst_url"),
    )
    return hosts.groupBy("dst_host").agg(
        F.count("*").alias("n_inlinks"),
        F.countDistinct("src_host").alias("n_src_hosts"),
        F.countDistinct("dst_url").alias("n_dst_urls"),
    )


def anchor_stats(links: DataFrame) -> DataFrame:
    """Anchor-text consolidation per target URL over a
    (src_url, dst_url, anchor_text) link table — the third classic
    crawl/search signal next to PageRank and inlink counts: the
    anchor texts OTHER pages use for a URL describe it better than
    its own content (the reference's graph assets carry the outlink
    anchor lists per document; this op is the transpose-and-reduce
    over them).

    Output per dst_url: n_anchors (total anchored inlinks),
    n_unique_anchors (distinct texts), top_anchor (the modal text,
    ties broken lexicographically so the result is deterministic),
    top_anchor_n (its count).

    Scale shape: two hash aggregates — (dst_url, anchor_text) counts
    with map-side partial agg, then a dst_url-keyed reduce; the modal
    pick is a window over the counts table partitioned by dst_url
    (cardinality = distinct target URLs, so fully parallel; no
    single-partition window). Both dst_url stages hash-partition on
    the same key, so AQE reuses the exchange."""
    counts = links.groupBy("dst_url", "anchor_text").agg(
        F.count("*").alias("_n")
    )
    totals = counts.groupBy("dst_url").agg(
        F.sum("_n").alias("n_anchors"),
        F.count("*").alias("n_unique_anchors"),
    )
    w = Window.partitionBy("dst_url").orderBy(
        F.col("_n").desc(), F.col("anchor_text")
    )
    top = (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "dst_url",
            F.col("anchor_text").alias("top_anchor"),
            F.col("_n").alias("top_anchor_n"),
        )
    )
    return totals.join(top, "dst_url")


def host_link_graph(links: DataFrame) -> DataFrame:
    """Collapse the URL-level link table to the HOST graph:
    (src_host, dst_host, n_links, n_dst_urls, is_internal). This is
    the standard first reduction before any site-level authority
    computation (host-level PageRank, spam-mass propagation, mirror
    detection) — the URL graph at 10^11 edges is ~100× larger than
    its host projection, so every downstream graph algorithm runs on
    this rollup, not the raw edges.

    is_internal marks same-host (navigation) edges, which host-level
    ranking discards but mirror/boilerplate detection keeps.

    Scale shape: one hash aggregate keyed on (src_host, dst_host);
    the countDistinct rewrites to an expand + two-level partial agg.
    The pair key is far less skewed than either host alone (a Zipf
    head host fans across all of its partners), so this usually needs
    no salting even where per-host aggs do."""
    hosts = links.select(
        F.regexp_extract(F.col("src_url"), HOST_RE, 1).alias("src_host"),
        F.regexp_extract(F.col("dst_url"), HOST_RE, 1).alias("dst_host"),
        F.col("dst_url"),
    )
    return (
        hosts.groupBy("src_host", "dst_host")
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct("dst_url").alias("n_dst_urls"),
        )
        .withColumn(
            "is_internal", F.col("src_host") == F.col("dst_host")
        )
    )


def url_features(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL structural quality features over CANONICAL URLs — the
    classic spam/quality signals a frontier prioritizer feeds into
    its lane scoring (alongside pagerank_scaled / link_host_stats):

      host_len, n_subdomains  — long, deeply-nested hosts skew spammy
      host_digit_ratio        — digit-heavy hosts (DGA/farm pattern)
      path_depth              — '/'-separated segments below the host
      path_len
      n_query_params          — '&'-split params after '?'
      has_port                — explicit :port survives canonicalization
      ext                     — last path segment's extension ('' if none)

    Pure codegen string ops, zero shuffles — a map over whatever scan
    carries the URL column; at 100 TB it fuses into the wave's
    canonicalize stage. Assumes canonical form (scheme://host[:p]/path
    [?q], no fragment) as produced by P2 — behavior on arbitrary
    strings is undefined like every post-P2 operator."""
    u = F.col(url_col)
    after_scheme = F.substring_index(u, "://", -1)
    authority = F.substring_index(after_scheme, "/", 1)
    host = F.substring_index(authority, ":", 1)
    has_port = (authority != host).alias("has_port")
    # path without query: between the authority and '?'
    path_q = F.expr(
        f"substring(substring_index({url_col}, '://', -1),"
        f" length(substring_index(substring_index({url_col}, '://', -1),"
        " '/', 1)) + 1)"
    )
    path = F.substring_index(path_q, "?", 1)
    query = F.when(
        path_q.contains("?"), F.substring_index(path_q, "?", -1)
    ).otherwise(F.lit(""))
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    last_seg = F.element_at(F.concat(F.array(F.lit("")), segs), -1)
    ext = F.when(
        last_seg.contains("."), F.lower(F.substring_index(last_seg, ".", -1))
    ).otherwise(F.lit(""))
    host_digits = F.length(F.regexp_replace(host, r"[^0-9]", ""))
    return urls.select(
        u.alias("url"),
        F.length(host).cast("int").alias("host_len"),
        F.greatest(
            F.size(F.split(host, r"\.")) - F.lit(2), F.lit(0)
        ).cast("int").alias("n_subdomains"),
        F.round(host_digits / F.greatest(F.length(host), F.lit(1)), 4)
        .alias("host_digit_ratio"),
        F.size(segs).cast("int").alias("path_depth"),
        F.length(path).cast("int").alias("path_len"),
        F.when(query == "", F.lit(0))
        .otherwise(F.size(F.split(query, "&")))
        .cast("int").alias("n_query_params"),
        has_port,
        ext.alias("ext"),
    )


def resolve_redirects(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "url_id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 16,
) -> DataFrame:
    """Resolve every URL through its redirect chain to the terminal
    target: (url_id, final_id, hops). A fetched 3xx still costs a
    politeness slot but yields no document — the frontier wants the
    terminal URL (one url_id per real resource) before dedup, exactly
    like the P2 canonical form collapses syntactic aliases.

    Pointer DOUBLING, not per-hop walking: each iteration rewrites
    every mapping src→cur to src→f(cur) by self-joining the mapping
    on cur=src, so chain length L resolves in ceil(log2 L) joins —
    at 10^10 URLs a 1000-hop spam chain costs 10 shuffles, not 1000.
    Convergence = an iteration where no row advanced (observe()-free
    count on the advanced side only). Redirect GRAPHS can contain
    cycles (a<->b); rows still in flight after max_iters doublings
    (chain > 2^max_iters or cyclic) resolve to final_id = NULL,
    hops = -1 — the caller's reject lane, matching how a fetcher
    gives up after its redirect limit. Assumes at most one redirect
    edge per src (HTTP gives one Location per URL)."""
    m = edges.select(
        F.col(src_col).alias("_s"),
        F.col(dst_col).alias("_c"),
        F.lit(1).cast("bigint").alias("_h"),
        F.lit(False).alias("_done"),
    ).localCheckpoint()  # truncate lineage: the doubling loop joins m
    # with itself, so an un-truncated plan doubles in size per round
    # (2^iters Catalyst nodes — analysis, not execution, becomes the
    # cost); localCheckpoint per round keeps it O(1) like pagerank's
    for _ in range(max_iters):
        nxt = m.select(
            F.col("_s").alias("_ns"),
            F.col("_c").alias("_nc"),
            F.col("_h").alias("_nh"),
        )
        m = (
            m.join(nxt, m["_c"] == nxt["_ns"], "left")
            .select(
                "_s",
                F.coalesce("_nc", "_c").alias("_c"),
                (F.col("_h") + F.coalesce("_nh", F.lit(0))).alias("_h"),
                # done when cur has no outgoing edge anymore
                F.col("_nc").isNull().alias("_done"),
            )
            .localCheckpoint()
        )
        if m.filter(~F.col("_done")).count() == 0:
            break
    resolved = m.select(
        F.col("_s").alias(id_col),
        F.when(F.col("_done"), F.col("_c")).alias("final_id"),
        F.when(F.col("_done"), F.col("_h")).otherwise(F.lit(-1)).alias(
            "hops"
        ),
    )
    return (
        nodes.select(F.col(id_col))
        .join(resolved, id_col, "left")
        .select(
            id_col,
            # no redirect edge at all -> the URL is its own terminal;
            # unresolved (cycle / over-limit) keeps final_id NULL
            F.when(F.col("hops").isNull(), F.col(id_col))
            .otherwise(F.col("final_id"))
            .alias("final_id"),
            F.coalesce("hops", F.lit(0)).cast("bigint").alias("hops"),
        )
    )


def trap_hosts(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 100,
    max_distinct_ratio: float = 0.2,
) -> DataFrame:
    """Crawler-trap detection: a host whose URL population collapses
    onto few distinct query-stripped paths (calendar pages, session
    ids, faceted search) is generating synthetic URL space — the
    frontier should cap or reject it before it starves real hosts.

    Per host: n_urls, n_paths (distinct path after dropping the query
    string), distinct_ratio = n_paths/n_urls (4dp), and
    is_trap = n_urls >= min_urls AND distinct_ratio <= max_ratio.

    Scale shape: ONE aggregate keyed on host; the distinct-path count
    rewrites to the standard expand + two-level partial agg (no
    per-group set materializes). The Zipf head host concentrates only
    the final narrow reduce — same skew posture as link_host_stats."""
    parts = urls.select(
        F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
        F.substring_index(F.col(url_col), "?", 1).alias("_path"),
    )
    agg = parts.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("_path").alias("n_paths"),
    )
    ratio = F.round(F.col("n_paths") / F.col("n_urls"), 4)
    return agg.select(
        "host",
        "n_urls",
        "n_paths",
        ratio.alias("distinct_ratio"),
        (
            (F.col("n_urls") >= min_urls)
            & (ratio <= max_distinct_ratio)
        ).alias("is_trap"),
    )


def url_templates(
    urls: DataFrame, url_col: str = "url", min_count: int = 3
) -> DataFrame:
    """URL-template mining: collapse every digit run in the PATH to
    '{n}' and aggregate per (host, template) — the standard way a
    crawler discovers parameterized page families (item/{n}/view,
    page/{n}, calendar traps) so dedup/priority policy can act on the
    TEMPLATE instead of its millions of instances. Complements
    trap_hosts (which gates on per-host distinct-path ratio) with the
    which-pattern evidence, and url_features (per-URL signals) with
    the family-level rollup.

    Output per (host, template): n_urls (instances seen),
    n_variants (distinct concrete paths — equals n_urls unless the
    same path repeats), `templated` (the path actually contained a
    digit run), and `family` flag (templated AND n_urls >= min_count
    — the families worth a policy decision).

    Scale shape: the template is a map-side regexp_replace; ONE hash
    aggregate on (host, template) with partial combine (instances of
    a family collapse before the exchange — the hotter the family,
    the better the combine), and the distinct-path count rides the
    same shuffle via count(distinct path)'s expand. No windows, no
    joins, no UDFs.

    Reference tie-in: the reference's crawler has no template miner —
    this is frontier-policy input its operators (mustmatch, depth
    caps) consume; cites CrawlStartService.java:141-173 for where
    such patterns enter as crawl-profile regexes.
    """
    host = F.regexp_extract(F.col(url_col), r"^[a-z]+://(?:[^/@]*@)?([^/:?#]+)", 1)
    path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/?#]*(/[^?#]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    template = F.regexp_replace(path, r"[0-9]+", "{n}")
    return (
        urls.select(
            host.alias("host"), path.alias("path"), template.alias("template")
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("path").alias("n_variants"),
        )
        .withColumn("templated", F.col("template").contains("{n}"))
        .withColumn(
            "family",
            F.col("template").contains("{n}") & (F.col("n_urls") >= min_count),
        )
    )


def soft404_hosts(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_pages: int = 20,
    max_modal_share_bp: int = 5000,
) -> DataFrame:
    """Soft-404 / parked-host detection: a host that answers many
    distinct URLs with the SAME body (an error template, a parking
    page, a paywall interstitial) returns HTTP 200 for content that
    is not content — the crawler keeps scheduling it and the corpus
    fills with thousands of copies the per-document dedup then has to
    clean up. Catching it at HOST granularity stops the fetches, not
    just the duplicates.

    Per host: n_pages, modal_share_bp = 10000·(occurrences of the
    most frequent body md5) DIV n_pages, and is_soft404 = n_pages ≥
    min_pages AND modal_share_bp > max_modal_share_bp (a real site's
    modal body share is tiny; a parked host's is ~10000).

    Scale shape: body reduced to md5 in the scan projection (the text
    never shuffles), ONE (host, md5) count aggregate, ONE max_by
    re-aggregate to the host — both map-side combining; the Zipf head
    host concentrates only the second, already-tiny reduce."""
    md5 = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    per_body = (
        docs.select(F.col(host_col).alias("host"), md5.alias("_h"))
        .groupBy("host", "_h")
        .agg(F.count("*").alias("_n"))
    )
    agg = per_body.groupBy("host").agg(
        F.sum("_n").alias("n_pages"),
        F.max("_n").alias("_modal_n"),
    )
    share = F.expr("10000 * _modal_n div n_pages").cast("int")
    return agg.select(
        "host",
        F.col("n_pages").cast("long").alias("n_pages"),
        share.alias("modal_share_bp"),
        (
            (F.col("n_pages") >= int(min_pages))
            & (share > int(max_modal_share_bp))
        ).alias("is_soft404"),
    )


def link_farm_hosts(
    host_edges: DataFrame,
    min_partners: int = 2,
    recip_ppm_threshold: int = 300_000,
) -> DataFrame:
    """Nepotistic-link (link-farm) detection on the HOST graph: a host
    whose external link partners mostly link BACK is trading links
    rather than citing — the classic link-exchange signature (Davison
    2000 "Recognizing nepotistic links"; the spam-mass cousin of
    [[trustrank]]). The crawler demotes such hosts' priority lanes the
    same way the reference demotes blacklist hits.

    Input is the `host_link_graph` rollup (src_host, dst_host,
    n_links, is_internal) — already unique on the pair key. Per host,
    over EXTERNAL edges only:

      out_links       total outbound link count
      n_partners      distinct partner hosts (= row count here)
      recip_partners  partners with a reverse edge partner→host
      recip_share_ppm 1000000·recip_partners DIV n_partners
      top_share_ppm   1000000·max(n_links) DIV out_links  (how
                      concentrated the host's linking is)
      is_link_farm    n_partners ≥ min_partners AND
                      recip_share_ppm ≥ threshold

    All ratios integer-ppm (DIV) so the DuckDB oracle is bit-exact.

    Scale shape: the host graph is the ~100×-reduced projection, so
    this is cheap by construction: one self-join on the flipped pair
    key (equi-join, no expansion — both sides unique on the key) and
    one aggregate keyed on src_host. No windows, no driver collects;
    the Zipf head host concentrates only its own final reduce row."""
    ext = host_edges.filter(~F.col("is_internal")).select(
        "src_host", "dst_host", "n_links"
    )
    rev = ext.select(
        F.col("dst_host").alias("src_host"),
        F.col("src_host").alias("dst_host"),
        F.lit(1).alias("_rev"),
    )
    marked = ext.join(rev, ["src_host", "dst_host"], "left")
    agg = marked.groupBy("src_host").agg(
        F.sum("n_links").alias("out_links"),
        F.count("*").alias("n_partners"),
        F.sum(F.coalesce(F.col("_rev"), F.lit(0))).alias(
            "recip_partners"
        ),
        F.max("n_links").alias("_top"),
    )
    recip_ppm = F.expr("1000000 * recip_partners DIV n_partners")
    top_ppm = F.expr("1000000 * _top DIV out_links")
    return agg.select(
        F.col("src_host").alias("host"),
        F.col("out_links").cast("long").alias("out_links"),
        F.col("n_partners").cast("long").alias("n_partners"),
        F.col("recip_partners").cast("long").alias("recip_partners"),
        recip_ppm.cast("long").alias("recip_share_ppm"),
        top_ppm.cast("long").alias("top_share_ppm"),
        (
            (F.col("n_partners") >= int(min_partners))
            & (recip_ppm >= int(recip_ppm_threshold))
        ).alias("is_link_farm"),
    )


def host_skew(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Frontier host-concentration audit — ONE summary row:

      n_urls, n_hosts, top_share_ppm (largest host's URL share),
      hhi_ppm (Herfindahl–Hirschman index, Σ share² in ppm)

    This is the measured input to the G3 salting decision: a frontier
    with hhi_ppm near 1e6/n_hosts is uniform (hash sharding is
    enough); a Zipf head (top_share_ppm ≫ 1e6/n_hosts) is what
    `assign_shard`'s hot-host salting defuses. Integer-exact:
    hhi_ppm = Σ n_h² · 1000000 DIV N² computed in bigint — valid for
    N < 3·10⁹ URLs per audited slice (n_h² ≤ N² < 2⁶³/1e6); at the
    full 10^10 frontier run it per-shard or per-depth slice, where
    the bound holds by construction.

    Scale shape: one host aggregate (map-side combining) then a
    single-row reduce over the host dim — the same two-level shape
    as every host rollup here; no windows, no joins."""
    hosts = urls.select(
        F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host")
    )
    per_host = hosts.groupBy("host").agg(F.count("*").alias("n"))
    return per_host.agg(
        F.sum("n").cast("long").alias("n_urls"),
        F.count("*").cast("long").alias("n_hosts"),
        F.expr("1000000 * max(n) DIV sum(n)").cast("long").alias(
            "top_share_ppm"
        ),
        F.expr("1000000 * sum(n * n) DIV (sum(n) * sum(n))")
        .cast("long")
        .alias("hhi_ppm"),
    )


def param_relevance(
    urls: DataFrame,
    url_col: str = "url",
    content_col: str = "content_id",
) -> DataFrame:
    """Query-parameter relevance inference — the crawler LEARNS which
    URL parameters do not change page content (session ids, tracking
    refs) from observed (url, content) pairs, instead of relying on a
    hand-curated strip list (`strip_tracking`'s static rule set; this
    operator is its evidence-driven complement, and the learned
    'irrelevant' params feed exactly that stripper).

    Method: duplicate IDENTICAL k=v pairs collapse first
    (array_distinct — "a=1&a=1&b=2" and "a=1&b=2" carry the same
    evidence, and the collapse keeps the one-pair-removed BASE
    well-defined; same normalization in the DuckDB twin). Then for
    every parameter occurrence, the BASE is the URL with that one
    parameter removed (remaining k=v pairs sorted, so pair order
    never splits a group). Within a (host, param, base) group:
    if the param takes >1 value the group is EVIDENCE; if content also
    takes >1 value the group is a SPLIT. Per (host, param):

      verdict = 'unknown'     no evidence group (never saw the param
                              vary with everything else fixed)
                'irrelevant'  evidence but zero splits (content never
                              changed when only this param did)
                'relevant'    at least one split group

    Output: (host, param, evidence_groups, split_groups, verdict) —
    all counts exact integers, so the DuckDB twin is value-exact.

    Scale shape: parameter expansion is a codegen posexplode of the
    split query string (the base rebuild is a filter+array_sort over
    the same array — no second parse); then ONE hash aggregate on
    (host, param, base) with partial combine and ONE tiny rollup on
    (host, param). The two count(distinct)s ride the first shuffle's
    expand. No joins, no windows, no Python.
    """
    host = F.regexp_extract(
        F.col(url_col), r"^[a-z]+://(?:[^/@]*@)?([^/:?#]+)", 1
    )
    prefix = F.regexp_extract(F.col(url_col), r"^([^?#]*)", 1)
    qs = F.regexp_extract(F.col(url_col), r"\?([^#]*)", 1)
    parsed = (
        urls.select(
            host.alias("host"),
            prefix.alias("_prefix"),
            qs.alias("_qs"),
            F.col(content_col).alias("_content"),
        )
        .filter(F.col("_qs") != "")
        .select(
            "host",
            "_prefix",
            "_content",
            F.array_distinct(F.split("_qs", "&")).alias("_ps"),
        )
    )
    one = parsed.select(
        "host", "_content", "_prefix", "_ps", F.explode("_ps").alias("_kv")
    ).select(
        "host",
        "_content",
        F.concat(
            "_prefix",
            F.lit("?"),
            F.array_join(
                F.array_sort(F.expr("filter(_ps, x -> x != _kv)")), "&"
            ),
        ).alias("_base"),
        F.expr("split_part(_kv, '=', 1)").alias("param"),
        F.expr("substr(_kv, length(split_part(_kv, '=', 1)) + 2)").alias(
            "_val"
        ),
    )
    grouped = one.groupBy("host", "param", "_base").agg(
        F.countDistinct("_val").alias("_nv"),
        F.countDistinct("_content").alias("_nc"),
    )
    agg = grouped.groupBy("host", "param").agg(
        F.sum((F.col("_nv") > 1).cast("long")).alias("evidence_groups"),
        F.sum(
            ((F.col("_nv") > 1) & (F.col("_nc") > 1)).cast("long")
        ).alias("split_groups"),
    )
    return agg.select(
        "host",
        "param",
        "evidence_groups",
        "split_groups",
        F.when(F.col("evidence_groups") == 0, F.lit("unknown"))
        .when(F.col("split_groups") == 0, F.lit("irrelevant"))
        .otherwise(F.lit("relevant"))
        .alias("verdict"),
    )
