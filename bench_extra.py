#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1) — NOT the judged
bench. bench.py is frozen for measurement; this file exists so the
optimization work can (a) time each headline query with the same
min-of-2 fresh-session methodology, (b) isolate computation from the
count() sink via the noop sink (guide §1.4), (c) dump
`.explain("formatted")` for the before/after plan evidence committed
under plans/r06/, and (d) time any single query repeatedly while
iterating.

Usage:
  python bench_extra.py queries            # min-of-2 per headline query
  python bench_extra.py queries q1 q2 ...  # subset
  python bench_extra.py noop q1 ...        # noop-sink isolation
  python bench_extra.py plans before|after [q ...]  # dump explain files
  python bench_extra.py all                # every registry query, 1 run
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # frozen harness: reuse its constants + calib probe

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _spark():
    from yacy_grid_crawler_spark.session import get_spark

    return get_spark(app="bench-extra", cores=CPUS, shuffle_partitions=CPUS)


def time_queries(names: list[str], sink: str = "count", runs: int = 2) -> dict:
    import __spark_entry__ as entry

    spark = _spark()
    q = entry.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = q[name](spark, SF_DIR)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
        out[name] = samples
        print(f"{name}: {samples} (min {min(samples)})", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out


def dump_plans(tag: str, names: list[str]) -> None:
    import __spark_entry__ as entry

    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = _spark()
    q = entry.queries()
    for name in names:
        df = q[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    if mode == "plans":
        tag, names = rest[0], rest[1:] or bench.BENCH_QUERIES
        dump_plans(tag, names)
        return
    if mode == "all":
        import __spark_entry__ as entry

        names = list(entry.queries())
        print(json.dumps(time_queries(names, runs=1)))
        return
    names = rest or bench.BENCH_QUERIES
    sink = "noop" if mode == "noop" else "count"
    t = time_queries(names, sink=sink)
    print(json.dumps({"calib": bench.calib(), "times": t}))


if __name__ == "__main__":
    main()
