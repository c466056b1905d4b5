"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, plus an
LSH-bucketed variant (random-hyperplane signs derived from md5 — fully
deterministic, no RNG) as the scale path: at 10^9+ vectors the
brute-force cross join is infeasible; hyperplane LSH buckets shrink
each query's candidate set to its bucket (± multiprobe), turning the
O(N·Q) join into an equi-join on the bucket key.

All vector math is JVM-side (`zip_with` + `aggregate` — whole-stage
codegen, no Python); embeddings are cast to double so the DuckDB
oracle (double-precision) ranks identically except for sub-1e-12 ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOP_K = 5
QUERY_MOD = 50  # vec_id % QUERY_MOD == 0 → query vector


def _dot(a, b):
    # NOTE (r06 measured): unrolling this fold into a 64-term
    # element_at chain to escape CodegenFallback made it 3× SLOWER
    # (the generated method blows past JIT limits and runs in the
    # bytecode interpreter); the fold form stays. The fast path for
    # bulk dots is the GEMM kernel in brute_force_topk.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    emb = F.transform(F.col(col), lambda x: x.cast("double"))
    return df.withColumn("_emb", emb).withColumn(
        "_norm", F.sqrt(_dot(F.col("_emb"), F.col("_emb")))
    )


def brute_force_topk(
    vectors: DataFrame, top_k: int = TOP_K, query_mod: int = QUERY_MOD,
    rank_rounded: bool = False, impl: str = "gemm",
) -> DataFrame:
    """Exact cosine top-k: queries = vec_id % query_mod == 0 (a
    deterministic subset), candidates = all other vectors.
    Output (query_id, rank, neighbor_id, cos_sim rounded 4dp),
    rank by (sim desc, neighbor_id) for a total order.

    `rank_rounded=True` ranks by the 4dp-ROUNDED similarity instead of
    the raw double — choose it when the rank value itself feeds a
    downstream computation (e.g. RRF fusion) that must be engine-exact;
    raw ranking keeps maximal resolution when only the neighbor SET
    matters.

    Two implementations (r06, guide §4.2), same output — equality
    pinned in tests/test_similarity.py:

    - `impl="gemm"` (default): the query block is collected and
      broadcast as a dense numpy matrix (bounded by design — the
      same broadcast geometry as the expression form, which collects
      the query side into a broadcast relation); each partition of
      the candidate side computes one BLAS GEMM block per Arrow
      batch and emits only its LOCAL top-k per query, so the final
      exact top-k window sees ≤ partitions × Q × k rows instead of
      N × Q. The 64-wide dots run vectorized in C instead of one
      interpreted `zip_with`+`aggregate` per pair (the fold form is
      CodegenFallback; unrolling it blows JIT limits — measured).
    - `impl="expr"`: the original pure-JVM expression form — the
      executable spec the kernel is pinned against, and the
      zero-Python fallback.

    Scale note: the cross join is Q×N — the baseline only. The
    broadcast of the (small) query side keeps it shuffle-free; for
    large Q use `lsh_bucket_topk`.
    """
    from pyspark.sql import Window

    if impl == "gemm":
        gemm = _brute_force_topk_gemm(vectors, top_k, query_mod, rank_rounded)
        if gemm is not None:
            return gemm

    v = with_norm(vectors).select(
        "vec_id", "_emb", "_norm"
    )
    q = (
        v.filter(F.col("vec_id") % query_mod == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("_emb").alias("_qemb"),
            F.col("_norm").alias("_qnorm"),
        )
    )
    pairs = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    sims = pairs.withColumn(
        "cos_sim",
        _dot(F.col("_emb"), F.col("_qemb")) / (F.col("_norm") * F.col("_qnorm")),
    )
    rank_key = (
        F.round("cos_sim", 4) if rank_rounded else F.col("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        rank_key.desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def _brute_force_topk_gemm(
    vectors: DataFrame, top_k: int, query_mod: int, rank_rounded: bool
):
    """GEMM-block implementation of brute_force_topk (see its
    docstring). Returns None when the query side is empty (caller
    falls back to the expression form, which yields the correctly
    typed empty result)."""
    import numpy as np
    from pyspark.sql import Window

    spark = vectors.sparkSession
    q_pdf = (
        vectors.filter(F.col("vec_id") % query_mod == 0)
        .select("vec_id", "embedding")
        .toPandas()
    )
    if q_pdf.empty:
        return None
    q_ids = q_pdf["vec_id"].to_numpy()
    qm = np.vstack(q_pdf["embedding"].to_numpy()).astype("float64")
    qn = np.sqrt((qm * qm).sum(axis=1))
    bc = spark.sparkContext.broadcast((q_ids, qm, qn))
    id_type = vectors.schema["vec_id"].dataType.simpleString()
    out_schema = (
        f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"
    )
    k = top_k
    rounded = rank_rounded

    def topk_blocks(batches):
        import pandas as pd

        ids_q, mat_q, norm_q = bc.value
        nq = len(ids_q)
        for part in batches:
            if part.empty:
                continue
            cids = part["vec_id"].to_numpy()
            block = np.vstack(part["embedding"].to_numpy()).astype("float64")
            bn = np.sqrt((block * block).sum(axis=1))
            sims = (block @ mat_q.T) / np.outer(bn, norm_q)  # (B, nq)
            # selection key: rounded half-away-from-zero when the
            # rank itself is the contract (rank_rounded), raw
            # otherwise — mirrors the window's ORDER BY exactly
            key = (
                np.sign(sims) * np.floor(np.abs(sims) * 1e4 + 0.5) / 1e4
                if rounded
                else sims.copy()
            )
            # self-pairs are excluded by the join condition in the
            # expression form: push them below any real candidate
            key[cids[:, None] == ids_q[None, :]] = -np.inf
            # NaN (zero-norm vectors) ranks FIRST under Spark's
            # descending NaN-greatest ordering: keep such rows
            key[np.isnan(key)] = np.inf
            rows_a = []
            rows_q = []
            rows_s = []
            kk = min(k, len(cids))
            for j in range(nq):
                col = key[:, j]
                # top-k by (key desc, vec_id asc): lexsort is stable,
                # last key is primary
                order = np.lexsort((cids, -col))[:kk]
                order = order[col[order] > -np.inf]
                rows_a.append(cids[order])
                rows_q.append(np.full(len(order), ids_q[j]))
                rows_s.append(sims[order, j])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(rows_q),
                    "neighbor_id": np.concatenate(rows_a),
                    "cos_sim": np.concatenate(rows_s),
                }
            )

    cand = vectors.select("vec_id", "embedding").mapInPandas(
        topk_blocks, out_schema
    )
    rank_key = (
        F.round("cos_sim", 4) if rank_rounded else F.col("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        rank_key.desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def hyperplane_signs(
    df: DataFrame,
    n_planes: int = 8,
    col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """LSH bucket key: sign pattern of dot products with n
    deterministic pseudo-random hyperplanes. Plane p, dim d weight =
    ((hex digit d of md5('p<p>d<d>')) - 7.5) — reproducible anywhere,
    no RNG state. Adds a `bucket` string column ('0'/'1' × n_planes).

    `dim`: embedding dimensionality. Pass it to keep the operator
    fully lazy; when omitted it is probed from the first row (one
    eager driver action — the array type carries no length), with an
    explicit error on an empty input instead of first()'s None."""
    if dim is None:
        head = df.select(col).first()
        if head is None or head[0] is None:
            raise ValueError(
                "hyperplane_signs: cannot infer embedding dim from an "
                "empty input — pass dim= explicitly"
            )
        dim = len(head[0])
    planes = []
    import hashlib

    for p in range(n_planes):
        w = []
        for d in range(dim):
            h = hashlib.md5(f"p{p}d{d}".encode()).hexdigest()
            w.append(int(h[0], 16) - 7.5)
        planes.append(w)
    emb = F.transform(F.col(col), lambda x: x.cast("double"))
    bits = []
    for p in range(n_planes):
        # one JVM-parsed literal per plane (see _cent_lit); the E0
        # suffix forces DOUBLE parsing (bare decimals parse as
        # DECIMAL in Spark SQL) — repr() round-trips doubles exactly,
        # and every weight is a half-integer anyway
        arr = F.expr(
            "array(" + ",".join(f"{x!r}E0" for x in planes[p]) + ")"
        )
        bits.append(F.when(_dot(emb, arr) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn("bucket", F.concat(*bits))


def ivf_bucket_topk(
    vectors: DataFrame,
    top_k: int = TOP_K,
    query_mod: int = QUERY_MOD,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest
    centroid (the inverted-file bucket), then search each query only
    in its `n_probe` nearest buckets. Deterministic, RNG-free:
    centroids are the first vector of every (N/n_centroids)-stride of
    vec_id — on real data one k-means round over a sample replaces
    this, but the Spark plan is identical.

    Scale shape: centroids broadcast (tiny); assignment is a broadcast
    nested-loop over n_centroids rows (narrow, no shuffle); the probe
    is an equi-join on bucket id — same join geometry as production
    IVF at 10^9+ vectors. Recall < 1 by construction; measured against
    brute_force_topk in tests/test_similarity.py."""
    from pyspark.sql import Window

    v = with_norm(vectors).select("vec_id", "_emb", "_norm")
    n = v.count()
    stride = max(n // n_centroids, 1)
    cent = (
        v.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("_emb").alias("_cemb"),
            F.col("_norm").alias("_cnorm"),
        )
    )
    sim = _dot(F.col("_emb"), F.col("_cemb")) / (F.col("_norm") * F.col("_cnorm"))
    ranked = (
        v.join(F.broadcast(cent))
        .withColumn("_csim", sim)
        .withColumn(
            "_crank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("_csim").desc(), F.col("cent_id")
                )
            ),
        )
    )
    assigned = ranked.filter(F.col("_crank") == 1).select(
        "vec_id", "_emb", "_norm", F.col("cent_id").alias("bucket")
    )
    qprobe = (
        ranked.filter(
            (F.col("vec_id") % query_mod == 0) & (F.col("_crank") <= n_probe)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("_emb").alias("_qemb"),
            F.col("_norm").alias("_qnorm"),
            F.col("cent_id").alias("bucket"),
        )
    )
    pairs = assigned.join(qprobe, "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sims = pairs.withColumn(
        "cos_sim",
        _dot(F.col("_emb"), F.col("_qemb")) / (F.col("_norm") * F.col("_qnorm")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def embedding_near_dup_exact(
    vectors: DataFrame, threshold: float = 0.4
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact all-pairs baseline:
    (doc_a < doc_b, cos_sim >= threshold). O(N²) compare — correct at
    any N but only *feasible* at small N or within a blocking key; the
    10^10-scale path is `embedding_near_dup_lsh` (equi-join on LSH
    bucket, then exact verify). Threshold compares the 4-dp-rounded
    similarity so engine/oracle boundary behavior is identical.

    (Driver data note: the synthetic embeddings have max pairwise
    cosine ≈ 0.51, so the default τ=0.4 exercises the operator;
    production near-dup uses τ≈0.95.)

    Physical shape: one side is broadcast as a dense numpy matrix and
    each partition of the other side computes a BLAS GEMM block
    against it inside an Arrow-batched `mapInPandas` — the same
    broadcast-nested-loop geometry as the DataFrame formulation
    (`a.join(F.broadcast(b), doc_a < doc_b)`) but the 64-wide dot
    products run vectorized in C instead of one interpreted
    `zip_with`+`aggregate` lambda per pair (~10× at sf0.1).
    """
    import numpy as np

    out_schema = "doc_a bigint, doc_b bigint, cos_sim double"
    # The broadcast side is collected to the driver — bounded by
    # design (this is the labeled small-N baseline). Refuse unbounded
    # collects instead of OOMing the driver at scale.
    max_rows = 2_000_000  # 64-dim float64 ≈ 1 GiB broadcast
    capped = vectors.select("vec_id", "embedding").limit(max_rows + 1)
    pdf = capped.toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"embedding_near_dup_exact: >{max_rows} vectors — the "
            "all-pairs baseline broadcasts the full matrix; use "
            "embedding_near_dup_lsh for large inputs"
        )
    if pdf.empty:
        return vectors.sparkSession.createDataFrame([], out_schema)
    ids_all = pdf["vec_id"].to_numpy()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = vectors.sparkSession.sparkContext.broadcast((ids_all, mat, norms))

    def block_sims(batches):
        import pandas as pd

        ids_b, mat_b, norms_b = bc.value
        for part in batches:
            if part.empty:
                continue
            block = np.vstack(part["embedding"].to_numpy()).astype("float64")
            bn = np.sqrt((block * block).sum(axis=1))
            raw = (block @ mat_b.T) / np.outer(bn, norms_b)
            # round HALF-AWAY-FROM-ZERO to match SQL ROUND() (np.round
            # is banker's half-to-even; the two differ exactly at the
            # threshold boundary the filter below compares against)
            sims = np.sign(raw) * np.floor(np.abs(raw) * 1e4 + 0.5) / 1e4
            ia, ib = np.where(sims >= threshold)
            doc_a = part["vec_id"].to_numpy()[ia]
            doc_b = ids_b[ib]
            keep = doc_a < doc_b
            yield pd.DataFrame(
                {
                    "doc_a": doc_a[keep],
                    "doc_b": doc_b[keep],
                    "cos_sim": sims[ia, ib][keep],
                }
            )

    return vectors.select("vec_id", "embedding").mapInPandas(
        block_sims, out_schema
    )


def embedding_near_dup_lsh(
    vectors: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: hyperplane-LSH bucket as the
    blocking key (same-bucket candidates only → equi-join, no cross
    join), exact cosine verify inside the bucket. Recall < 1 by
    construction (near-threshold pairs can straddle a hyperplane);
    recall vs the exact baseline is pinned in tests/test_similarity.py.
    Fewer planes → bigger buckets → higher recall; n_planes tunes the
    recall/cost trade-off at scale. `dim` (optional) keeps the plan
    fully lazy — see hyperplane_signs."""
    v = hyperplane_signs(vectors, n_planes, dim=dim)
    v = with_norm(v).select("vec_id", "bucket", "_emb", "_norm")
    a = v.select(
        F.col("vec_id").alias("doc_a"),
        F.col("bucket").alias("bucket_a"),
        F.col("_emb").alias("_ea"),
        F.col("_norm").alias("_na"),
    )
    b = v.select(
        F.col("vec_id").alias("doc_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("_emb").alias("_eb"),
        F.col("_norm").alias("_nb"),
    )
    pairs = a.join(
        b,
        (F.col("bucket_a") == F.col("bucket_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    )
    sims = pairs.withColumn(
        "cos_sim",
        F.round(
            _dot(F.col("_ea"), F.col("_eb")) / (F.col("_na") * F.col("_nb")), 4
        ),
    )
    return sims.filter(F.col("cos_sim") >= threshold).select(
        "doc_a", "doc_b", "cos_sim"
    )


def lsh_bucket_topk(
    vectors: DataFrame,
    top_k: int = TOP_K,
    query_mod: int = QUERY_MOD,
    n_planes: int = 8,
    rank_rounded: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's
    hyperplane-LSH bucket — the scale path (equi-join on bucket key,
    AQE-balanced, no cross join). Recall < 1 by construction; the
    exactness oracle is brute_force_topk. `rank_rounded` as in
    brute_force_topk: rank by the 4dp-rounded similarity when the rank
    feeds an engine-exact downstream (e.g. RRF). `dim` (optional)
    keeps the plan fully lazy — see hyperplane_signs."""
    from pyspark.sql import Window

    v = hyperplane_signs(vectors, n_planes, dim=dim)
    v = with_norm(v).select("vec_id", "bucket", "_emb", "_norm")
    q = v.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("qbucket"),
        F.col("_emb").alias("_qemb"),
        F.col("_norm").alias("_qnorm"),
    )
    pairs = v.join(
        q,
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    sims = pairs.withColumn(
        "cos_sim",
        _dot(F.col("_emb"), F.col("_qemb")) / (F.col("_norm") * F.col("_qnorm")),
    )
    rank_key = (
        F.round("cos_sim", 4) if rank_rounded else F.col("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        rank_key.desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the memory-bandwidth lever for ANN at scale
# ---------------------------------------------------------------------------

def _qdot(a, b):
    """Exact integer dot product of two int arrays (long accumulator —
    64 dims x 127^2 stays far below 2^63)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq8_quantize(vectors: DataFrame, col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: scale =
    max(|x_i|)/127, q_i = floor(x_i/scale + 0.5) in [-127, 127]
    (zero vectors quantize to all-zero with scale 0). 4x smaller
    vectors = 4x less scan + shuffle + cache traffic — the standard
    SQ8 trick ANN engines use before any index structure; because the
    scale is per-vector it CANCELS in cosine, so quantized similarity
    is purely integer-derived and bit-reproducible on any engine.

    All math is JVM codegen (`transform`/`aggregate`); output
    (vec_id, scale, qvec:array<int>).
    """
    v = vectors.withColumn(
        "_emb", F.transform(F.col(col), lambda x: x.cast("double"))
    ).withColumn(
        "_maxabs",
        F.aggregate(
            "_emb", F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
        ),
    )
    scale = F.col("_maxabs") / F.lit(127.0)
    qvec = F.when(
        F.col("_maxabs") == 0.0,
        F.transform("_emb", lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            "_emb", lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")
        )
    )
    return v.select(
        "vec_id", scale.alias("scale"), qvec.alias("qvec")
    )


def sq8_topk(
    vectors: DataFrame, top_k: int = TOP_K, query_mod: int = QUERY_MOD
) -> DataFrame:
    """Approximate cosine top-k over SQ8-quantized vectors: the scan
    side carries int8-range ints instead of doubles (4x narrower),
    and because per-vector scales cancel, quantized cosine =
    dot_int / sqrt(n_a * n_b) with n = sum(q_i^2) — exact integer
    numerators, one sqrt, one division: identical doubles in Spark
    and the DuckDB oracle, so ranks never drift across engines.

    Scale shape mirrors brute_force_topk (broadcast query side, no
    shuffle of the big side) — SQ8 composes with the LSH/IVF bucket
    joins for the full production stack (quantize once, bucket-join
    the narrow vectors). Recall vs the float baseline is pinned in
    tests/test_similarity.py.
    """
    from pyspark.sql import Window

    q8 = sq8_quantize(vectors).withColumn(
        "_n", _qdot(F.col("qvec"), F.col("qvec"))
    )
    q = q8.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("_qq"),
        F.col("_n").alias("_qn"),
    )
    pairs = q8.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    )
    qcos = F.when(
        (F.col("_n") == 0) | (F.col("_qn") == 0), F.lit(0.0)
    ).otherwise(
        _qdot(F.col("qvec"), F.col("_qq"))
        / F.sqrt((F.col("_n") * F.col("_qn")).cast("double"))
    )
    sims = pairs.withColumn("qcos", qcos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            F.round("qcos", 4).alias("qcos"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory lever past SQ8: m codes/vector
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_K = 16  # codes per subspace
PQ_SCALE = 1000  # global int-quantization scale (exact cross-engine math)


def _int_l2(a, b):
    """Exact integer squared-L2 of two long arrays (long accumulator —
    8 dims x (2*PQ_SCALE)^2 stays far below 2^63)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_quantize(vectors: DataFrame, col: str = "embedding") -> DataFrame:
    """Global fixed-scale integer quantization (q_i = floor(x_i *
    PQ_SCALE + 0.5)) — unlike SQ8's per-vector scale this preserves
    ABSOLUTE L2 geometry across vectors, which PQ's shared codebooks
    require; and because every downstream distance is a sum of integer
    squares, codes and ADC scores are bit-reproducible in any engine.
    """
    return vectors.select(
        "vec_id",
        F.transform(
            F.col(col),
            lambda x: F.floor(x.cast("double") * PQ_SCALE + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("qvec"),
    )


def pq_codebook(
    quantized: DataFrame, m: int = PQ_M, k: int = PQ_K
) -> list[list[list[int]]]:
    """Training-free deterministic codebook: the k vectors first in
    md5(vec_id) order seed every subspace (k-means with zero Lloyd
    iterations — sample-based initialization, the standard cheap
    baseline). Returns cents[s][c] = the c-th centroid of subspace s
    (k*dim ints — bounded driver metadata, same class as the IVF
    centroid read at similarity.py:129; on a real cluster this ships
    to executors as a broadcast literal).
    """
    rows = (
        quantized.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .select("qvec")
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebook: need at least 1 vector to seed")
    dim = len(rows[0].qvec)
    if dim % m != 0:
        raise ValueError(
            f"pq_codebook: dim {dim} not divisible by m={m} subspaces — "
            "trailing dimensions would be silently dropped"
        )
    dsub = dim // m
    return [
        [list(r.qvec[dsub * s : dsub * s + dsub]) for r in rows]
        for s in range(m)
    ]


def _cent_lit(cents: list[list[list[int]]], s: int):
    """Subspace s's k centroids as ONE nested array literal.

    r06: was `F.array(F.array(F.lit(v)...)...)` — k·dsub Literal
    nodes built one py4j round-trip each (~1.2k across the LUT; and
    PySpark's `F.lit(<list>)` decomposes into the same per-element
    calls — profiled). Plan CONSTRUCTION dominated warm runs of the
    PQ queries (build 1.6-1.7 s vs 0.5-0.7 s execute). A SQL string
    parsed JVM-side costs ONE round trip; int literals parse as
    int/bigint and the downstream exact integer arithmetic is
    unchanged."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(str(int(v)) for v in c) + ")"
            for c in cents[s]
        )
        + ")"
    )


def _pq_lut(cents: list[list[list[int]]]):
    """Per-query m x k ADC lookup table over the `qvec` column: exact
    subspace squared-L2 to every centroid. NOTE: the transform lambda
    must stay single-argument — a second arg would make Spark pass the
    ELEMENT INDEX into it."""
    dsub = len(cents[0][0])

    def lut_sub(s):
        return F.transform(
            _cent_lit(cents, s),
            lambda cv: _int_l2(F.slice("qvec", dsub * s + 1, dsub), cv),
        )

    return F.array(*[lut_sub(s) for s in range(len(cents))])


def _adc_expr(m: int):
    """Sum of m LUT lookups: `_lut[s][codes[s]]` over s in [0, m).

    Unrolled as a left-assoc chain of m element_at terms instead of
    `aggregate(sequence(0, m-1), ...)`: higher-order-function
    expressions are CodegenFallback (interpreted per row), and this
    runs once per (query, candidate) pair — the ADC scoring hot path.
    The unrolled form stays inside whole-stage codegen; the sum is
    exact integer math either way, same order, identical results."""
    expr = F.lit(0).cast("long")
    for s in range(m):
        expr = expr + F.element_at(
            F.element_at(F.col("_lut"), s + 1),
            F.element_at(F.col("codes"), s + 1) + 1,
        )
    return expr


def _rank_topk(pairs: DataFrame, top_k: int) -> DataFrame:
    """Per-query top-k by (adc_dist, neighbor_id) — the only shuffle
    in either PQ plan (tiny: queries x candidates rows keyed on
    query_id)."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "neighbor_id", "adc_dist")
    )


def pq_encode(
    quantized: DataFrame,
    cents: list[list[list[int]]],
    keep: tuple[str, ...] = (),
    impl: str = "arrow",
    coarse: list[list[int]] | None = None,
) -> DataFrame:
    """Encode each vector as m one-byte-range codes: per subspace,
    argmin squared-L2 against the 16 centroids (first-min = smallest
    code on ties, matching the oracle's (l2, code) order).

    Two implementations with bit-identical results (both exact int64;
    equality pinned in tests/test_similarity.py):

    - `impl="arrow"` (default): a `mapInPandas` numpy kernel — one
      (batch x k x dsub) broadcasted subtract + square + argmin per
      subspace. Chosen because Catalyst does NOT codegen nested
      higher-order functions: the expression form runs interpreted at
      ~19k vec/s on 32 threads (measured, 1M rows) vs ~50x that for
      the vectorized kernel; np.argmin takes the first minimum =
      the same smallest-code tie-break.
    - `impl="expr"`: the pure-JVM expression form over codebook
      literals — the executable spec the Arrow kernel is pinned
      against, and the zero-Python fallback.

    Either way: zero shuffle (a projection / partition-local map over
    broadcast codebook constants), and at 10^10 vectors the encoded
    table is m longs/vector vs 64 floats — a 32x narrower scan side,
    which is the entire point of PQ at 100 TB.

    `coarse` (arrow impl only): optional list of coarse IVF centroids
    (full-dim int vectors). When given, the kernel also emits a
    `bucket` int column = argmin exact-int64 squared-L2 over the
    coarse centroids (first min = smallest centroid id on ties —
    np.argmin returns the first occurrence, the same (d, cid)
    tie-break as the expression form in ivfpq_topk). Fusing the
    coarse assignment into the encode pass matters because nested
    higher-order-function expressions run INTERPRETED in Catalyst
    (see the impl note above): at sf0.1 the expression-form coarse
    assignment over the full table was the single largest cost in
    the ivfpq plan; in the kernel it is one (batch × n_coarse × dim)
    numpy broadcast per batch — and one fewer full-table pass.
    """
    if impl == "arrow":
        return _pq_encode_arrow(quantized, cents, keep=keep, coarse=coarse)
    if coarse is not None:
        raise ValueError("pq_encode: coarse= requires impl='arrow'")
    m = len(cents)
    dsub = len(cents[0][0])

    def code_expr(s):
        sub = F.slice("qvec", dsub * s + 1, dsub)
        dists = F.transform(_cent_lit(cents, s), lambda cv: _int_l2(sub, cv))
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return quantized.select(
        "vec_id",
        F.array(*[code_expr(s) for s in range(m)]).alias("codes"),
        *keep,
    )


def _pq_encode_arrow(
    quantized: DataFrame,
    cents: list[list[list[int]]],
    keep: tuple[str, ...] = (),
    coarse: list[list[int]] | None = None,
) -> DataFrame:
    """Vectorized PQ encoder: numpy int64 over Arrow batches. Exact —
    no floats anywhere, so it reproduces the expression form (and the
    DuckDB oracle) bit-for-bit. Partition-local map: no shuffle.
    With `coarse`, also emits the IVF `bucket` column (argmin exact
    int64 L2 over the coarse centroids — see pq_encode)."""
    import numpy as np
    from pyspark.sql import types as T

    m = len(cents)
    dsub = len(cents[0][0])
    cent_arr = np.asarray(cents, dtype=np.int64)  # (m, k, dsub)
    coarse_arr = (
        np.asarray(coarse, dtype=np.int64) if coarse is not None else None
    )  # (n_coarse, dim)

    out_fields = [quantized.schema["vec_id"]] + [
        T.StructField("codes", T.ArrayType(T.IntegerType()))
    ] + (
        [T.StructField("bucket", T.IntegerType())]
        if coarse is not None
        else []
    ) + [quantized.schema[c] for c in keep]
    out_schema = T.StructType(out_fields)

    def encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["qvec"].to_numpy()).astype(np.int64)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                sub = x[:, dsub * s : dsub * s + dsub]  # (B, dsub)
                # (B, k): exact int64 squared-L2 to every centroid
                d = ((sub[:, None, :] - cent_arr[s][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, s] = d.argmin(axis=1)  # first min = smallest code
            out = {"vec_id": pdf["vec_id"], "codes": list(codes)}
            if coarse_arr is not None:
                cd = ((x[:, None, :] - coarse_arr[None, :, :]) ** 2).sum(
                    axis=2
                )  # (B, n_coarse) exact int64
                out["bucket"] = cd.argmin(axis=1).astype(np.int32)
            for c in keep:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    cols = ["vec_id", "qvec", *keep]
    return quantized.select(*cols).mapInPandas(encode_batches, out_schema)


def pq_topk(
    vectors: DataFrame,
    top_k: int = TOP_K,
    query_mod: int = QUERY_MOD,
    m: int = PQ_M,
    k: int = PQ_K,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k (Jégou et al. 2011): each
    query precomputes an m x k lookup table of exact subspace L2s to
    every centroid, then scoring a database vector is m table lookups
    summed — no vector math on the scan side at all. The scan touches
    only (vec_id, codes): 8 ints/vector instead of 64 floats.

    Plan shape mirrors brute_force_topk: broadcast query side (with
    its LUTs), NO shuffle of the database side, per-query top-k via a
    query_id window (tiny: queries x top_k rows). Composes with the
    IVF bucket join for the production IVF-PQ stack. All distances
    are exact longs — bit-reproducible vs the DuckDB oracle.
    """
    qv = pq_quantize(vectors)
    cents = pq_codebook(qv, m=m, k=k)
    coded = pq_encode(qv, cents)

    queries = qv.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), _pq_lut(cents).alias("_lut")
    )
    pairs = (
        coded.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _adc_expr(m).alias("adc_dist"),
        )
    )
    return _rank_topk(pairs, top_k)


def ivfpq_topk(
    vectors: DataFrame,
    top_k: int = TOP_K,
    query_mod: int = QUERY_MOD,
    n_coarse: int = 8,
    n_probe: int = 3,
    m: int = PQ_M,
    k: int = PQ_K,
    cache_registry: list | None = None,
) -> DataFrame:
    """IVF-PQ — the production ANN stack at 10^10 vectors: a coarse
    inverted file prunes the scan to `n_probe` buckets, and PQ/ADC
    scores what remains with m table lookups per candidate. Coarse
    centroids use the same deterministic vec_id-stride rule as
    ivf_bucket_topk (`similarity.py:140-150`); assignment is argmin
    exact integer L2 (consistent with ADC's metric, unlike the cosine
    flat-IVF variant), tie-break on centroid id.

    Scale shape: BOTH codebooks ride as broadcast literals — coarse
    assignment and PQ encoding are one zero-shuffle projection over
    the base table; the probe is a broadcast equi-join on the bucket
    id against a SKINNY (query_id, bucket) relation — the m x k LUTs
    join in separately, one row per query, so they are never
    duplicated per probe; scoring touches only (bucket, codes) —
    8 ints/vector. The only shuffle is the per-query top-k window.
    All distances exact longs.

    Setup runs three bounded driver actions (codebook, count, coarse
    seeds) over the quantized input; pass `cache_registry` (a list the
    CALLER sweeps with .unpersist(), same contract as
    minhash_lsh_pairs) to persist the quantized table so those setup
    passes and the main scan read the cache instead of rescanning the
    source — at 10^10 rows that is the difference between one and
    four full input scans.
    """
    qv = pq_quantize(vectors)
    if cache_registry is not None:
        qv = qv.persist()
        cache_registry.append(qv)
    cents = pq_codebook(qv, m=m, k=k)

    n = qv.count()  # bounded metadata read, same as ivf_bucket_topk
    stride = max(n // n_coarse, 1)
    coarse = [
        list(r.qvec)
        for r in qv.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(n_coarse)
        .select("qvec")
        .collect()
    ]
    # one JVM-parsed literal, not 8×64 py4j round trips (see _cent_lit)
    coarse_lit = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(str(int(x)) for x in c) + ")" for c in coarse
        )
        + ")"
    )
    cdists = F.transform(coarse_lit, lambda cv: _int_l2(F.col("qvec"), cv))
    # argsort by (dist, cid): zip dists with their index, array_sort
    # orders structs lexicographically — exact-integer tie-break.
    # Evaluated ONLY on the query side below (tiny); the full-table
    # coarse assignment runs inside the Arrow encode kernel (numpy
    # argmin over the same exact int64 L2 — identical bucket ids, see
    # pq_encode), because this nested-HOF expression is interpreted
    # and was the dominant cost of the plan when applied per row.
    ranked_buckets = F.array_sort(
        F.transform(
            cdists,
            lambda d, i: F.struct(d.alias("d"), i.cast("int").alias("c")),
        )
    )

    coded = pq_encode(qv, cents, coarse=coarse)

    qside = qv.filter(F.col("vec_id") % query_mod == 0)
    qluts = qside.select(
        F.col("vec_id").alias("query_id"), _pq_lut(cents).alias("_lut")
    )
    probes = F.transform(
        F.slice(ranked_buckets, 1, n_probe), lambda x: x["c"]
    )
    qprobes = qside.select(
        F.col("vec_id").alias("query_id"),
        F.explode(probes).alias("bucket"),
    )
    pairs = (
        coded.join(F.broadcast(qprobes), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(qluts), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _adc_expr(m).alias("adc_dist"),
        )
    )
    return _rank_topk(pairs, top_k)


RRF_K = 60  # Cormack et al. 2009's constant


def rrf_fuse(
    rankings: list[DataFrame], k: int = 5, rrf_k: int = RRF_K
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    hybrid-retrieval combiner: each input ranking contributes
    1/(rrf_k + rank) per (query, doc), summed across rankings; no
    score calibration between systems needed, which is exactly why it
    wins for lexical+vector hybrids. Integer-scaled
    (1000000 DIV (rrf_k + rank)) so the fused score is engine-exact —
    provided the INPUT ranks are themselves deterministic (rank on
    rounded scores with id tie-breaks; see
    `brute_force_topk(rank_rounded=True)`).

    Inputs: DataFrames with columns (query_id, doc_id, rank).
    Output: (query_id, doc_id, rrf, rnk) — top-k per query by
    (rrf desc, doc_id).

    Scale shape: a union of already-top-k'd rankings is ≤ Σk rows per
    query — one map-side-combining sum keyed (query_id, doc_id), then
    a per-query top-k window over ≤ Σk rows per group (bounded by
    construction, no skew possible)."""
    from functools import reduce

    from pyspark.sql import Window

    parts = [
        r.select(
            "query_id",
            "doc_id",
            F.expr(
                f"CAST(1000000 AS BIGINT) DIV ({int(rrf_k)} + rank)"
            ).alias("_c"),
        )
        for r in rankings
    ]
    fused = (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_c").alias("rrf"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.col("doc_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
        .select("query_id", "doc_id", "rrf", F.col("rnk").cast("int").alias("rnk"))
    )


def topk_recall(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one —
    the acceptance metric every ANN deployment (LSH, IVF, SQ8) is
    tuned by. Per query: (query_id, n_exact, n_hit, recall_bp) with
    recall_bp = (10000 * n_hit) DIV n_exact, integer-exact so the
    cross-engine hash compare is bit-stable.

    Inputs are any two frames with (query_id, neighbor_id) columns
    (extra columns ignored). Queries the approximate side missed
    ENTIRELY still appear with n_hit 0 — a recall audit that silently
    drops empty-result queries overstates recall, so the exact side
    drives a left join.

    Scale shape: both inputs are already top-k'd (≤k rows per query),
    so every join group and aggregate group is bounded by k — one
    equi-join on (query_id, neighbor_id) plus one query_id aggregate;
    no skew possible by construction."""
    ex = exact.select("query_id", "neighbor_id")
    ap = approx.select("query_id", "neighbor_id").distinct().withColumn(
        "_hit", F.lit(1)
    )
    return (
        ex.join(ap, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .select(
            "query_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            "n_hit",
            F.expr("(10000 * n_hit) DIV n_exact").alias("recall_bp"),
        )
    )


def pair_recall(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Pair-level recall of an approximate near-duplicate pass against
    the exact baseline — the acceptance metric for blocked dedup
    (LSH/IVF blocking trades recall for feasibility; this measures the
    trade). ONE summary row: (n_exact_pairs, n_hit, recall_bp), with
    recall_bp integer-exact and 10000 on an empty exact set (nothing
    to miss).

    Inputs are any two frames with (doc_a, doc_b) pair columns (extra
    columns ignored; pairs assumed canonicalized doc_a < doc_b, as all
    the dedup operators emit).

    Scale shape: one equi-join on the pair key + one global aggregate
    (map-side combined to a single row); the approx side is
    distinct-ed first so duplicate candidate emissions can't inflate
    hits."""
    ex = exact.select("doc_a", "doc_b")
    ap = approx.select("doc_a", "doc_b").distinct().withColumn(
        "_hit", F.lit(1)
    )
    return (
        ex.join(ap, ["doc_a", "doc_b"], "left")
        .agg(
            F.count("*").cast("long").alias("n_exact_pairs"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .select(
            "n_exact_pairs",
            "n_hit",
            F.expr(
                "CASE WHEN n_exact_pairs = 0 THEN CAST(10000 AS BIGINT)"
                " ELSE (10000 * n_hit) DIV n_exact_pairs END"
            ).alias("recall_bp"),
        )
    )


def hard_negatives(
    vectors: DataFrame,
    top_k: int = 10,
    keep: int = 5,
    dup_threshold: float = 0.4,
    query_mod: int = QUERY_MOD,
) -> DataFrame:
    """Hard-negative mining for contrastive embedding training — the
    pair-generation pass behind every retriever/embedding fine-tune:
    for each anchor (query) take its nearest neighbors that are
    SIMILAR-BUT-NOT-DUPLICATE (cos below `dup_threshold` — at or above
    it the pair is a near-dup/positive, not a negative), re-ranked and
    truncated to `keep`. Random negatives are trivial; the top-of-the-
    non-dup-range ones are what move the loss.

    Output: (query_id, neg_rank, neighbor_id, cos_sim) — neg_rank is
    the 1-based rank AMONG the kept negatives. cos_sim is rounded to
    4dp and the dup gate compares the ROUNDED value, so the cut is
    engine-exact.

    Scale shape: inherits `brute_force_topk`'s broadcast geometry for
    the candidate ranking (swap in `lsh_bucket_topk`/IVF upstream at
    scale — the gate and re-rank are the same bounded-per-query ops);
    the re-rank window is keyed by query_id over ≤top_k rows."""
    from pyspark.sql import Window

    base = brute_force_topk(vectors, top_k=top_k, query_mod=query_mod)
    # base's cos_sim is already 4dp-rounded — the dup gate cuts on it
    neg = base.filter(F.col("cos_sim") < dup_threshold)
    w = Window.partitionBy("query_id").orderBy(F.col("rank"))
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= keep)
        .select("query_id", "neg_rank", "neighbor_id", "cos_sim")
    )
