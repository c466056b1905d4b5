"""Embedding k-means clustering — the grouping primitive behind
semantic dedup, topic balancing, and IVF index training in a
training-data pipeline.

Lloyd's algorithm, made EXACTLY reproducible across engines the same
way `graph.py::pagerank_scaled` is: every arithmetic step is integer.

* Quantize each float dim to `floor(x * 2^20) + 2^20` (the offset
  makes every value non-negative, so truncating and floor division
  coincide — Spark `div` and DuckDB `//` then agree everywhere).
* Init: the k lowest-id vectors are the seed centroids (RNG-free).
* Assign: integer squared-L2 argmin, ties to the lowest centroid id.
* Update: per-dim integer mean `sum div count`. A centroid whose
  cluster empties simply drops out (deterministic in both engines);
  k is a cap, not a guarantee.

Plan shape per Lloyd round: assignment is a single-row broadcast
nested-loop join (the k×d centroid matrix as one array<struct> value)
followed by a codegen `transform` + `array_min` argmin — the big side
never shuffles and the expression tree is fixed-size in k. The update
is one groupBy(cluster) with d `element_at` sum columns: a single
shuffle of ≤k×d longs per round (map-side partial agg). The only
driver traffic is the centroid matrix between rounds — the same
bounded metadata every distributed k-means (including Spark MLlib's)
moves per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1 << 20
OFFSET = 1 << 20


def quantized(vectors: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Append `_q`: the non-negative integer quantization of the
    embedding (floor(x * 2^20) + 2^20 per dim). Codegen, no shuffle."""
    q = F.transform(
        F.col(emb_col),
        lambda x: F.floor(x.cast("double") * SCALE).cast("long") + OFFSET,
    )
    return vectors.withColumn("_q", q)


def _assign(
    qdf: DataFrame, centroids: list[tuple[int, list[int]]], id_col: str
) -> DataFrame:
    """(id, _q, cluster_id): nearest centroid by integer squared L2,
    ties to the lowest centroid id. Centroid ids are STABLE across
    rounds (an emptied cluster's id disappears rather than remapping
    the survivors — the oracle states the same rule).

    The centroid matrix travels as ONE broadcast row holding an
    array<struct<j,c>> — a single-row broadcast nested-loop join adds
    it to every partition, and the argmin is `array_min` over a
    `transform` of that array. The expression tree is fixed-size in k
    (no per-centroid literals), so plan analysis/codegen cost doesn't
    grow with k and the same plan serves k=8 and k=65536; the big
    side still never shuffles."""
    spark = qdf.sparkSession
    cent_df = spark.createDataFrame(
        [([(int(cid), [int(v) for v in c]) for cid, c in centroids],)],
        "cents array<struct<j:long,c:array<bigint>>>",
    )

    def _cand(s):
        diff2 = F.zip_with(
            F.col("_q"), s["c"], lambda a, b: (a - b) * (a - b)
        )
        dist = F.aggregate(diff2, F.lit(0).cast("long"), lambda acc, x: acc + x)
        return F.struct(dist.alias("d"), s["j"].alias("j"))

    best = F.array_min(F.transform(F.col("cents"), _cand))
    return qdf.join(F.broadcast(cent_df)).select(
        id_col,
        "_q",
        best["j"].alias("cluster_id"),
        best["d"].alias("dist"),
    )


def kmeans_assignments(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cache_registry: list | None = None,
) -> DataFrame:
    """Run `iters` exact-integer Lloyd rounds and return the final
    (id, cluster_id) assignment. See module docstring for the
    reproducibility contract and per-round plan shape."""
    qdf = quantized(vectors, emb_col).select(id_col, "_q").persist()
    if cache_registry is not None:
        cache_registry.append(qdf)
    centroids = _fit_centroids(qdf, k, iters, id_col)
    return _assign(qdf, centroids, id_col).select(id_col, "cluster_id")


def _fit_centroids(
    qdf: DataFrame, k: int, iters: int, id_col: str
) -> list[tuple[int, list[int]]]:
    """Run `iters` Lloyd rounds over the quantized vectors and return
    the fitted centroid list (see module docstring for the bounded
    per-round driver traffic)."""
    seeds = qdf.orderBy(id_col).limit(k).collect()
    centroids = [(j, list(r["_q"])) for j, r in enumerate(seeds)]
    d = len(centroids[0][1])

    for _ in range(iters):
        assigned = _assign(qdf, centroids, id_col)
        # per-(cluster, dim) sums via posexplode: the plan is fixed
        # size in d (one explode + one agg, vs d agg expressions) and
        # partial agg bounds the shuffle at k×d rows per partition
        sums = (
            assigned.select(
                "cluster_id", F.posexplode(F.col("_q")).alias("_i", "_v")
            )
            .groupBy("cluster_id", "_i")
            .agg(F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_n"))
        )
        rows = sums.collect()  # ≤k×d rows of longs — bounded metadata
        by_cluster: dict[int, list[int]] = {}
        for r in rows:
            by_cluster.setdefault(int(r["cluster_id"]), [0] * d)[
                int(r["_i"])
            ] = int(r["_s"]) // int(r["_n"])
        centroids = sorted(by_cluster.items())

    return centroids


def cluster_outliers(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    top: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cache_registry: list | None = None,
) -> DataFrame:
    """Prototype-distance outlier mining: the `top` vectors FURTHEST
    from their own cluster centroid, per cluster — the standard
    triage for junk/novel/mislabeled embeddings (SemDeDup keeps the
    density cores; this surfaces the opposite tail). Entirely
    integer: quantized dims make the squared-L2 distance a bigint, so
    the per-cluster ranking has no float boundary anywhere.

    Output: (cluster_id, id, dist) with dist the integer squared L2
    to the assigned centroid.

    Scale shape: the Lloyd fit + one final broadcast assignment
    (big side never shuffles), then a per-cluster top-k window —
    cluster count is k, and rank-k windows over k partitions are the
    same geometry as `topk_per_group`; if a single cluster dominates
    at extreme scale the two-phase rank (`batching.global_positions`)
    drops in, same as everywhere else in this repo."""
    from pyspark.sql import Window

    qdf = quantized(vectors, emb_col).select(id_col, "_q").persist()
    if cache_registry is not None:
        cache_registry.append(qdf)
    centroids = _fit_centroids(qdf, k, iters, id_col)
    assigned = _assign(qdf, centroids, id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("dist"), F.col(id_col)
    )
    return (
        assigned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(top))
        .select("cluster_id", id_col, "dist")
    )


def semantic_dedup(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cache_registry: list | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means
    clusters as the candidate-blocking key, exact cosine only WITHIN
    a cluster, drop every document whose cluster holds a
    >= threshold neighbor with a smaller id (the deterministic
    keeper). Same candidate→verify economics as
    `similarity.embedding_near_dup_lsh`, but the buckets are LEARNED
    (centroids chase density), which is what lets the paper use far
    fewer buckets than random hyperplanes need at equal recall.

    Output: (id, cluster_id, keep) for EVERY input row. Threshold
    compares the 4-dp-rounded cosine (the repo's cross-engine
    boundary convention).

    Scale shape: the Lloyd rounds are the bounded-metadata pattern of
    `kmeans_assignments`; the verify is an equi-join on cluster_id
    (never a cross join) + one distinct on dropped ids + one
    left-anti-shaped flag join. In-cluster pair count is the classic
    SemDeDup cost knob: raise k until clusters are verify-sized."""
    from .similarity import _dot, with_norm

    assign = kmeans_assignments(
        vectors, k=k, iters=iters, id_col=id_col, emb_col=emb_col,
        cache_registry=cache_registry,
    )
    v = (
        with_norm(vectors, emb_col)
        .select(id_col, "_emb", "_norm")
        .join(assign, id_col)
    )
    a = v.select(
        F.col(id_col).alias("_ida"),
        F.col("cluster_id").alias("_ca"),
        F.col("_emb").alias("_ea"),
        F.col("_norm").alias("_na"),
    )
    b = v.select(
        F.col(id_col).alias("_idb"),
        F.col("cluster_id").alias("_cb"),
        F.col("_emb").alias("_eb"),
        F.col("_norm").alias("_nb"),
    )
    dropped = (
        a.join(
            b,
            (F.col("_ca") == F.col("_cb")) & (F.col("_ida") < F.col("_idb")),
        )
        .withColumn(
            "_sim",
            F.round(
                _dot(F.col("_ea"), F.col("_eb"))
                / (F.col("_na") * F.col("_nb")),
                4,
            ),
        )
        .filter(F.col("_sim") >= threshold)
        .select(F.col("_idb").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        assign.join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.col("_dropped").isNull().alias("keep"),
        )
    )
