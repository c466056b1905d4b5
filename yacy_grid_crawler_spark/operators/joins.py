"""Time-alignment joins the built-in operator set lacks: as-of join
and range (interval) join, in their scalable single-shuffle forms.

The reference engine joins nothing by time (its only join-like ops are
the url_id exist-checks, CrawlerListener.java:300-320); these cover the
event/telemetry side of a crawl corpus — matching fetch events to the
most recent robots refresh, attributing clicks to purchase windows —
the two classic "Spark lacks this" operators, expressed so the big side
shuffles once and no pairwise product ever forms.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    time_col: str,
    payload_cols: Sequence[str],
    prefix: str = "matched_",
) -> DataFrame:
    """Backward-inclusive as-of join: each left row gains the payload
    of the LATEST right row with the same keys and right.time <=
    left.time (NULLs when no prior right row exists — a left join).

    Not a pair join at all: both sides are unioned with a side tag,
    ONE shuffle on `keys` sorts (time, side) per key, and a running
    `last(payload, ignorenulls)` window carries the most recent right
    payload forward onto every left row. Right rows sort BEFORE left
    rows at equal time (side 0 < 1), which is what makes the match
    inclusive. Equal-time right duplicates resolve deterministically
    to the greatest payload struct (the window order's last).

    Scale shape: cost = one hash shuffle + per-key sort, state = one
    payload struct per partition-local scan — the same geometry as a
    windowed dedup, at any fan-in. Skewed keys are AQE's problem, not
    a cross product's."""
    keys = list(keys)
    payload = F.struct(
        F.col(time_col).alias("_pt"),
        *[F.col(c) for c in payload_cols],
    )
    left_cols = [c for c in left.columns if c not in keys]
    # SQL join semantics: a right row with a NULL key or NULL time can
    # never satisfy `l.key = r.key AND l.t >= r.t`, so it must not
    # enter the window state (partitionBy would otherwise group NULL
    # keys together and NULLS-FIRST ordering would carry a NULL-time
    # payload onto every left row). NULL-key/time LEFT rows stay and
    # simply never match — left-join semantics.
    for c in (*keys, time_col):
        right = right.filter(F.col(c).isNotNull())
    r = right.select(
        *keys,
        F.col(time_col).alias("_t"),
        payload.alias("_p"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        *keys,
        F.col(time_col).alias("_t"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.lit(1).alias("_side"),
        *left_cols,
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side", "_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_m", F.last("_p", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *keys,
        *left_cols,
        F.col("_m._pt").alias(f"{prefix}{time_col}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    time_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """Range (interval) join: every (point, interval) pair sharing
    `keys` with start <= point.time <= end (inclusive both ends).
    `time/start/end` are integers (e.g. epoch micros); `bucket` is the
    coarse grid width in the same unit — pick it near the typical
    interval length so intervals explode into O(1) buckets.

    The naive plan is a theta join (BroadcastNestedLoop or cartesian);
    this is the bucketized equi-join instead: intervals explode to the
    bucket ids they overlap (sequence(start div b, end div b)), points
    map to exactly ONE bucket id, and the two meet in a plain
    (keys, bucket) equi-join refined by the precise range predicate.
    A point's single bucket means each qualifying pair is produced
    exactly once — no distinct needed.

    Scale shape: shuffle on (keys, bucket) only; per-task work is
    bucket-local. Interval count × (len/bucket + 1) bounds the explode;
    hot buckets are AQE skew-join territory, never a cross product."""
    if int(bucket) <= 0:
        raise ValueError(f"bucket must be a positive integer, got {bucket}")
    keys = list(keys)
    # floor(x / b) is monotone, so start <= t <= end always implies
    # bucket(start) <= bucket(t) <= bucket(end) — coverage holds for
    # any epoch range, negatives included
    def _b(c):
        return F.floor(F.col(c) / F.lit(int(bucket))).cast("long")

    p = points.withColumn("_bucket", _b(time_col))
    i = intervals.withColumn(
        "_bucket", F.explode(F.sequence(_b(start_col), _b(end_col)))
    )
    joined = p.join(i, [*keys, "_bucket"]).filter(
        (F.col(time_col) >= F.col(start_col))
        & (F.col(time_col) <= F.col(end_col))
    )
    return joined.drop("_bucket")
