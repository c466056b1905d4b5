"""Distributed probabilistic sketches: HyperLogLog cardinality and
Count-Min frequency estimation.

Why they exist in a crawl/curation engine: at 10^10-URL frontier
scale the questions "how many distinct URLs / users / hosts" and
"how often does this token appear" must be answerable in one pass
with bounded state — exact distinct counts shuffle every key, while
a sketch shuffles O(m) registers per group.  These are the classic
one-pass summaries (Flajolet et al. 2007 HLL; Cormode & Muthukrishnan
2005 CMS) re-expressed as pure Spark aggregations.

Determinism contract: every hash bit is derived from md5 hex-string
arithmetic (substring / trim / CASE over nibbles) that evaluates
bit-identically in Spark SQL and DuckDB, so the ORACLE can rebuild
the exact same sketch state.  No RNG, no libm transcendentals in the
register path; the only float is the final alpha*m^2/sum division of
two exactly-representable values (IEEE-deterministic cross-engine).
The standard small-range linear-counting correction (m*ln(m/V)) is
deliberately omitted: ln() is libm-dependent and would break
cross-engine equality — the raw HLL estimator's small-n bias is the
documented trade (callers see `nonzero_registers` to judge it).

Scale shape: HLL is one groupBy((group, bucket)).max(rho) — a single
shuffle whose width is min(rows, groups*m), with map-side partial max
combining before the exchange.  CMS is one explode(d salts) +
groupBy((salt, bucket)).count() — a single shuffle of at most
groups*d*w rows.  Neither carries row payloads past the first
aggregation; both are pure whole-stage-codegen (no Python UDFs).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HLL geometry.  m = 16^HLL_PREFIX_HEX registers addressed by the
# first hex chars of md5; rho (leading-zero run + 1) is read from the
# next RHO_HEX chars (4 bits each), capped at RHO_CAP when that whole
# window is zero.  2^(RHO_CAP - rho) then fits comfortably in a
# signed 64-bit numerator: m * 2^(RHO_CAP-1) = 256 * 2^52 = 2^60.
# ---------------------------------------------------------------------------
HLL_PREFIX_HEX = 2
HLL_M = 16 ** HLL_PREFIX_HEX  # 256 registers
RHO_HEX = 13
RHO_CAP = 4 * RHO_HEX + 1  # 53

# alpha_m * m^2 * 2^RHO_CAP precomputed in Python and embedded as ONE
# double literal so both engines evaluate the same constant/N divide.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUMERATOR_CONST = HLL_ALPHA * HLL_M * HLL_M * float(2 ** RHO_CAP)

# leading-zero count of one hex nibble ('0' handled by the trim path)
_NIBBLE_LZ = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}


def _rho_column() -> "F.Column":
    """rho = 1 + number of leading zero BITS in the RHO_HEX-hex-char
    window after the register prefix, capped at RHO_CAP.  Pure string
    ops (trim LEADING + nibble CASE) over the `_hll_hash` column of
    the enclosing select — the identical SQL shape is restated in the
    DuckDB oracle."""
    # Spark's two-arg ltrim()/F.ltrim have ENGINE-SWAPPED argument
    # order vs DuckDB; ANSI trim(LEADING .. FROM ..) parses and
    # evaluates identically in both dialects (verified empirically).
    stripped = F.expr(
        f"trim(LEADING '0' FROM substring(_hll_hash, {HLL_PREFIX_HEX + 1}, {RHO_HEX}))"
    )
    nib = F.substring(stripped, 1, 1)
    lz_nib = F.lit(0)
    for ch, lz in _NIBBLE_LZ.items():
        lz_nib = F.when(nib == ch, lz).otherwise(lz_nib)
    return F.when(F.length(stripped) == 0, F.lit(RHO_CAP)).otherwise(
        (F.lit(RHO_HEX) - F.length(stripped)) * 4 + lz_nib + 1
    )


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """HyperLogLog register table: one row per (group, bucket) holding
    max(rho) — the complete, mergeable sketch state.

    Emitting registers (not just the estimate) is the point: register
    tables from independent partitions/days/clusters merge with a
    plain max, which is how a 1000-executor rollup composes.  Single
    shuffle on (group, bucket); max() combines map-side first.
    """
    h = F.md5(F.col(value_col).cast("string"))
    keyed = df.select(
        *[F.col(c) for c in group_cols],
        h.alias("_hll_hash"),
    ).select(
        *[F.col(c) for c in group_cols],
        F.substring(F.col("_hll_hash"), 1, HLL_PREFIX_HEX).alias("bucket"),
        _rho_column().cast("int").alias("_rho"),
    )
    return keyed.groupBy(*group_cols, "bucket").agg(
        F.max("_rho").alias("register")
    )


def _hll_numerator(register_col: str) -> "F.Column":
    """Aggregate expression for the HLL harmonic numerator over a
    register column: sum(2^(RHO_CAP - register)) over NON-NULL
    registers + (m - V) * 2^RHO_CAP for the absent/null buckets
    (rho = 0).  Exact int64 in both engines; the SINGLE shared
    encoding of the estimator — hll_cardinality and hll_set_overlap
    both divide HLL_NUMERATOR_CONST by it, so a change here cannot
    desynchronize them."""
    present = F.sum(
        F.expr(f"shiftleft(cast(1 AS bigint), {RHO_CAP} - {register_col})")
    )
    nonzero = F.count(F.col(register_col))  # counts non-null only
    return (
        F.coalesce(present, F.lit(0).cast("long"))
        + (F.lit(HLL_M) - nonzero) * F.lit(2 ** RHO_CAP).cast("long")
    )


def _hll_estimate(numerator) -> "F.Column":
    return F.round(
        F.lit(HLL_NUMERATOR_CONST) / numerator.cast("double"), 4
    )


def hll_cardinality(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group distinct-count estimate from the HLL registers.

    numerator = sum(2^(RHO_CAP - register)) + (m - V) * 2^RHO_CAP
    (V = nonzero registers; absent buckets contribute rho = 0) is an
    EXACT 64-bit integer in both engines; the estimate is the single
    IEEE divide HLL_NUMERATOR_CONST / numerator.  Columns:
    group..., nonzero_registers, hll_numerator, hll_estimate.
    """
    regs = hll_registers(df, value_col, group_cols)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("nonzero_registers"),
        _hll_numerator("register").cast("long").alias("hll_numerator"),
    )
    return agg.select(
        *group_cols,
        F.col("nonzero_registers"),
        F.col("hll_numerator"),
        _hll_estimate(F.col("hll_numerator")).alias("hll_estimate"),
    )


def hll_set_overlap(
    df: DataFrame,
    value_col: str,
    set_col: str,
    set_a: str,
    set_b: str,
) -> DataFrame:
    """HLL set algebra: estimate |A|, |B|, |A∪B| and (by
    inclusion-exclusion) |A∩B| of two value sets in ONE pass.

    The union sketch costs nothing extra — HLL registers merge by
    max, so the same per-bucket aggregate that separates A and B
    registers (conditional max) also yields the union register.  The
    final fold is over ≤ m = 256 rows (a deliberate single-row
    reduce of an already-tiny table).  Intersection estimates can go
    negative for near-disjoint sets — that is the estimator, not a
    bug; callers clamp if they need to.
    Columns: est_a, est_b, est_union, est_intersection.
    """
    regs = hll_registers(
        df.filter(F.col(set_col).isin([set_a, set_b])), value_col, [set_col]
    )
    per_bucket = regs.groupBy("bucket").agg(
        F.max(F.when(F.col(set_col) == set_a, F.col("register"))).alias("ra"),
        F.max(F.when(F.col(set_col) == set_b, F.col("register"))).alias("rb"),
        F.max("register").alias("ru"),
    )

    out = per_bucket.agg(
        _hll_estimate(_hll_numerator("ra")).alias("est_a"),
        _hll_estimate(_hll_numerator("rb")).alias("est_b"),
        _hll_estimate(_hll_numerator("ru")).alias("est_union"),
    )
    return out.select(
        "est_a",
        "est_b",
        "est_union",
        F.round(
            F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
        ).alias("est_intersection"),
    )


# ---------------------------------------------------------------------------
# DDSketch-style quantile sketch (Masson et al. 2019) on quarter-log2
# bins: bin(v) = 4*floor(log2 v) + quarter(v).  The bins are LINEAR
# within each octave (not geometric), so the worst-case midpoint
# relative error is 1/8 = 12.5% (bin [L, 1.25L), midpoint 1.125L,
# worst at v = L) — NOT the geometric-bin DDSketch figure of ~9%.
# ≤ 4*60 bins cover the domain.  floor(log2 v) is read as
# length(bin(v)) - 1 — a STRING op that is engine-identical (no libm
# log); the quarter and the bin midpoint are pure integer shifts, so
# the only float is one dyadic division by 8.0 (exact in IEEE).
# Mergeable: bin tables from independent partitions/days merge by
# summing counts, same as the HLL register max-merge.
# ---------------------------------------------------------------------------
DD_QUANTILES_PCT = (50, 90, 99)


def dd_bins(
    df: DataFrame, value_col: str, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Quarter-log2 histogram: (group..., bin_id, bin_est, cnt).

    Domain is 1 <= v < 2^60: the BINDING constraint is the midpoint
    shift (9+2q) << e, which overflows int64 at e = 60 (v = 2^60
    would wrap negative in Spark and raise in DuckDB — engine
    divergence at the boundary), not the v*4 quarter shift.  Rows
    outside the domain are excluded and the caller sees the gap as
    sum(cnt) < input rows.  One count shuffle of at most
    groups * 4*60 rows with map-side combine — the sketch never
    carries row payloads."""
    v = F.col(value_col).cast("long")
    e = (F.length(F.bin(v)) - 1).alias("_e")
    kept = df.filter(
        (v >= 1) & (v < F.lit(2 ** 60).cast("long"))
    ).select(*[F.col(c) for c in group_cols], v.alias("_v"), e)
    quarter = F.expr("shiftright(_v * 4, _e)") - 4
    binned = kept.select(
        *[F.col(c) for c in group_cols],
        (F.col("_e") * 4 + quarter).cast("int").alias("bin_id"),
        # midpoint of [2^e(1+q/4), 2^e(1+(q+1)/4)] = 2^e*(9+2q)/8,
        # computed as an exact integer shift then one dyadic divide
        (
            F.expr("shiftleft(9 + 2 * (shiftright(_v * 4, _e) - 4), _e)")
            / F.lit(8.0)
        ).alias("bin_est"),
    )
    return binned.groupBy(*group_cols, "bin_id", "bin_est").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def dd_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    quantiles_pct: Sequence[int] = DD_QUANTILES_PCT,
) -> DataFrame:
    """Per-group quantile estimates from the DDSketch bins.

    rank threshold for percentile p is ceil(n*p/100) in exact integer
    arithmetic ((n*p + 99) div 100); the estimate is the bin_est of
    the first bin whose cumulative count reaches it.  The windows run
    over the ALREADY-AGGREGATED bin table (≤ groups * 244 rows),
    partitioned by group — never over raw rows, never single-
    partition.  Columns: group..., n, dd_p{p} per requested p."""
    from pyspark.sql import Window

    bins = dd_bins(df, value_col, group_cols)
    w_grp = Window.partitionBy(*[F.col(c) for c in group_cols])
    w_cum = w_grp.orderBy("bin_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bins.select(
        *group_cols,
        "bin_est",
        F.sum("cnt").over(w_grp).alias("_n"),
        F.sum("cnt").over(w_cum).alias("_cum"),
    )
    aggs = [F.max("_n").alias("n")]
    for p in quantiles_pct:
        # ceil(n*p/100) in pure integer arithmetic — no float rank
        thresh = F.expr(f"(_n * {int(p)} + 99) div 100")
        aggs.append(
            F.min(
                F.when(F.col("_cum") >= thresh, F.col("bin_est"))
            ).alias(f"dd_p{p}")
        )
    return cum.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# Count-Min sketch.  d independent hash rows via salted md5; width w
# = 16^CMS_BUCKET_HEX buckets per row.  Point estimate = min over the
# d row counters — a deterministic upper bound on the true count.
# ---------------------------------------------------------------------------
CMS_SALTS = ("r0", "r1", "r2", "r3")  # d = 4
CMS_BUCKET_HEX = 3
CMS_W = 16 ** CMS_BUCKET_HEX  # 4096 buckets per row


def _cms_bucket(salt: str, item_col) -> "F.Column":
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), item_col.cast("string"))),
        1,
        CMS_BUCKET_HEX,
    )


def cms_sketch(items: DataFrame, item_col: str) -> DataFrame:
    """Build the d x w counter table (salt, bucket, cnt) from an item
    stream.  One explode to d rows per item, one count shuffle keyed
    on (salt, bucket) — at most d*w = 16384 output rows regardless of
    input size, with map-side partial counts doing the heavy fold.
    """
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("salt"),
                        _cms_bucket(s, F.col(item_col)).alias("bucket"),
                    )
                    for s in CMS_SALTS
                ]
            )
        ).alias("k")
    )
    return rows.groupBy(
        F.col("k.salt").alias("salt"), F.col("k.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(sketch: DataFrame, queries: DataFrame, item_col: str) -> DataFrame:
    """Point-query the sketch: expand each query item to its d
    (salt, bucket) keys, equi-join the counter table, take min(cnt).
    The query side is tiny (top-k candidates) → broadcast it so the
    16k-row sketch never shuffles."""
    keys = queries.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("salt"),
                        _cms_bucket(s, F.col(item_col)).alias("bucket"),
                    )
                    for s in CMS_SALTS
                ]
            )
        ).alias("k"),
    ).select(item_col, F.col("k.salt").alias("salt"), F.col("k.bucket").alias("bucket"))
    joined = sketch.join(F.broadcast(keys), ["salt", "bucket"], "inner")
    return joined.groupBy(item_col).agg(F.min("cnt").alias("cms_cnt"))


def cms_heavy_hitters(
    tokens: DataFrame, item_col: str, k: int = 20
) -> DataFrame:
    """Heavy-hitter audit: exact top-k items (count desc, item asc —
    deterministic tie-break via TakeOrderedAndProject, no global
    window) joined with their CMS point estimates.  Output
    (item, exact_cnt, cms_cnt, overcount) demonstrates the sketch's
    one-sided error: cms_cnt >= exact_cnt always, equality unless a
    collision in every one of the d rows."""
    sketch = cms_sketch(tokens, item_col)
    exact = (
        tokens.groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col(item_col).asc())
        .limit(k)
    )
    est = cms_estimate(sketch, exact.select(item_col), item_col)
    return (
        exact.join(est, item_col, "inner")
        .select(
            item_col,
            "exact_cnt",
            "cms_cnt",
            (F.col("cms_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.col("exact_cnt").desc(), F.col(item_col).asc())
    )
