"""Generate PLANS.md: a physical-plan audit of EVERY registry query —
the human-readable companion to the mechanical pins (tests/
test_plans.py for the wave plans; tests/test_entry.py asserts
cartesian==0 and python-surfaces⊆intended per query, piggybacked on
the oracle gate so every registry query's plan shape is re-checked on
every suite run). For each query: exchange count (shuffles), join
strategies, Python execution surfaces, and whole-stage-codegen spans,
extracted from the AQE-final executed physical plan (each audited
query runs once at the audit SF so exchange reuse and cache
boundaries show up instead of text-duplicated subtrees).

Run: python plan_audit.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import re
import sys


# plan-family notes for the representative queries (the rest of the
# registry is audited identically, just without prose)
FAMILY_NOTES = {
    "crawl_bfs_seen": "the flagship BFS wave (anti-joins, batching)",
    "dedup_minhash_lsh": "shingle explode -> band self-join",
    "anti_join_seen": "persistent-seen anti-join",
    "ann_ivfpq_topk": "IVF-PQ: coarse prune + ADC scan",
    "bpe_doc_tokens": "broadcast dictionary tokenization",
    "suffix_array": "prefix doubling (iterative, checkpointed)",
    "lm_bigram_score": "LM train/score joins",
    "linear_classifier_score": "hashed-feature broadcast scoring",
    "quality_fuse": "multi-signal two-phase percentile fusion",
    "events_sessionize": "sessionization (windowed gaps)",
    "topk_per_group": "grouped top-k",
    "politeness_slots": "per-host politeness scheduling",
}

# Queries whose plans INTENTIONALLY contain Python execution surfaces
# (Arrow/Pandas nodes) — the MEASURED set from the full-registry audit
# (every other query's AQE-final plan is pure JVM, and the whole
# registry has zero CartesianProduct nodes). The assertion lives in
# tests/test_entry.py, riding the oracle gate: a regression that drags
# a Python surface into a JVM-only query (or grows a cartesian
# anywhere) fails the suite. Kernels by family:
#   * url canonicalization tier-3 residue Arrow kernel
#     (url_canonicalize, smart_sld — the other crawl queries are
#     fully covered by the JVM tier-1/2 gates)
#   * multimodal decode/feature kernels (PIL/PyAV behind guards)
#   * CDC rolling-hash Arrow kernel
#   * PQ encode Arrow kernel (the measured anti-HOF-cliff move)
#   * exact-GEMM embedding baselines (hard-capped, labeled)
INTENDED_PYTHON = {
    "url_canonicalize", "smart_sld",
    "media_features", "media_resize", "media_frames", "media_phash",
    "phash_neardup", "curate_media", "video_neardup",
    "cdc_chunks", "cdc_savings", "cdc_change_rate",
    "ann_pq_topk", "ann_ivfpq_topk",
    "dedup_embedding", "dedup_recall",
    # r06: brute_force_topk defaults to the GEMM block kernel (guide
    # §4.2 — BLAS dots instead of one interpreted fold per pair);
    # every query composing it gains exactly that one intended kernel
    "ann_cosine_topk", "ann_recall", "ann_mrl_recall",
    "hybrid_search", "hard_negatives",
}


def _features(df) -> dict:
    """Distinct-operator counts from the AQE-final formatted explain.
    The executed plan is a DAG rendered as a tree — cached/reused
    subtrees repeat TEXTUALLY (quality_fuse renders ~500 join nodes
    for a plan that executes ~30), so every metric here counts each
    distinct operator id exactly once."""
    fmt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    ops: dict[str, str] = {}
    codegen: set[str] = set()
    for line in fmt.splitlines():
        m = re.match(r"^[\s+:-]*(\*?)\s*([A-Za-z][\w]*).*\((\d+)\)\s*$", line)
        if not m:
            continue
        star, op, oid = m.groups()
        ops.setdefault(oid, op)
        if star:
            codegen.add(oid)
    names = list(ops.values())

    def n(*keys):
        return sum(1 for o in names if any(k in o for k in keys))

    return {
        "exchanges": n("Exchange") - n("ReusedExchange"),
        "single_partition_exchanges": sum(
            1
            for oid, op in ops.items()
            if op == "Exchange"
            and re.search(
                rf"^\({oid}\) Exchange.*\n(?:.*\n){{0,3}}?"
                r"Arguments: SinglePartition",
                fmt,
                re.M,
            )
        ),
        "reused_or_cached": n("ReusedExchange", "InMemoryTableScan",
                              "TableCacheQueryStage"),
        "broadcast_joins": n("BroadcastHashJoin", "BroadcastNestedLoopJoin"),
        "sort_merge_joins": n("SortMergeJoin"),
        "shuffled_hash_joins": n("ShuffledHashJoin"),
        "cartesian": n("CartesianProduct"),
        "python_surfaces": n("ArrowEvalPython", "BatchEvalPython",
                             "FlatMapGroupsInPandas", "MapInPandas"),
        "codegen_spans": len(codegen),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from yacy_grid_crawler_spark.session import get_spark

    spark = get_spark(app="plan-audit", cores=8, shuffle_partitions=8)
    registry = entry.queries()
    names = sorted(registry)  # canonical order: full coverage, stable diffs
    lines = [
        "# PLANS — physical-plan audit of the FULL query registry",
        "",
        f"Auto-generated by `python plan_audit.py {sf_dir}` (AQE-final "
        "executed plans — each query is run once so reused exchanges and "
        "cached stages are visible). Mechanical pins: the wave plans in "
        "tests/test_plans.py, plus per-query cartesian==0 and "
        "python-surfaces⊆intended assertions riding the oracle gate in "
        "tests/test_entry.py.",
        "",
        "| query | family | exchanges | 1-part exch | reused/cached |"
        " broadcast joins |"
        " SMJ | SHJ | cartesian | python surfaces | codegen spans |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    violations = []
    for name in names:
        df = registry[name](spark, sf_dir)
        df.count()  # execute: AQE-final plan, reused/cached stages visible
        f = _features(df)
        why = FAMILY_NOTES.get(name, "")
        lines.append(
            f"| `{name}` | {why} | {f['exchanges']} |"
            f" {f['single_partition_exchanges']} | {f['reused_or_cached']} |"
            f" {f['broadcast_joins']} |"
            f" {f['sort_merge_joins']} | {f['shuffled_hash_joins']} |"
            f" {f['cartesian']} | {f['python_surfaces']} |"
            f" {f['codegen_spans']} |"
        )
        if f["cartesian"]:
            violations.append(f"{name}: cartesian={f['cartesian']}")
        if f["python_surfaces"] and name not in INTENDED_PYTHON:
            violations.append(
                f"{name}: python_surfaces={f['python_surfaces']} "
                "(not in INTENDED_PYTHON)"
            )
    if violations:
        lines += ["", "## VIOLATIONS", ""] + [f"- {v}" for v in violations]
    lines += [
        "",
        "Reading guide: every metric counts DISTINCT operator ids in the "
        "AQE-final formatted plan — the executed DAG, not the rendered "
        "tree (cached subtrees repeat textually up to ~60x in composed "
        "plans like quality_fuse; each counts once here, and nested "
        "cached subplans can restart numbering, so treat deep "
        "compositions as approximate). `1-part exch` counts "
        "`Exchange SinglePartition` nodes — nonzero only for bounded "
        "metadata (global limits over tiny aggregates, offsets tables); "
        "`python surfaces` counts Arrow/Pandas nodes (the wave hot path "
        "has zero; media decode, IVF-PQ's exact-int encode kernel, and "
        "state-store kernels are the only intended ones); `cartesian` "
        "must be 0 everywhere. `crawl_bfs_seen` reads the finished "
        "crawl's frontier table, so its own plan is a scan — the wave "
        "plans it runs internally are pinned by tests/test_plans.py. "
        "Composed multi-pass operators (quality_fuse: three signal "
        "passes + three two-phase ranks) legitimately carry tens of "
        "small exchanges; their runtime is bounded by the 1M-row probes "
        "in BASELINE.md, not by node count.",
    ]
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
