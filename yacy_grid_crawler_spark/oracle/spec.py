"""Pure-Python single-node executable specification of the crawl-wave
semantics (SURVEY.md §5.1) — the correctness oracle for the Spark
engine.

Mirrors the reference decision order exactly
(CrawlerListener.java:270-442):

    per document (in canonical order), per extracted link (span order):
      P2 parse/canonicalize   (:277-292; malformed → drop)
      F1 content-domain       (:304-306; keep text|all)
      P3 md5 url_id           (:308-309)
      D2 session seen add-before-filter (:312-315 — a URL seen once,
         even later rejected, is never reconsidered)
      F2 mustmatch/mustnotmatch (anchored full-match, :330-336;
         fail → status 'rejected', comment class 'filter')
      F3 blacklist            (:339-347; fail → status 'rejected',
         comment class 'blacklist')
      RB robots gate          [north-rule addition, SURVEY.md §1.6;
         fail → status 'rejected', comment class 'robots']
    D3 persistent exist-check (:360-365) — drop silently
    F4 index/noindex split    (:368-384)
    G2 two-pass emit: index batch group before noindex (:386-429)
    G1 batches of 8           (:406, 451-462)
    politeness slots per host [north-rule addition]
    status 'accepted' + D4 within-batch collapse (:431-442)

Canonical total order (the spec for the reference's hash-unspecified
intra-wave order, SURVEY.md §2 G5): documents in parent-frontier order
(batch_no, batch_pos), links in span-offset order; frontier output
ordered by (depth, lane priority-first, do_index desc, batch_no,
batch_pos).

This module shares the URL kernels with the engine
(functions/urlnorm.py) so the normal form cannot drift.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..config import BATCH_SIZE
from ..functions.urlnorm import canonicalize_url, content_domain, url_host, url_id

LINK_KINDS = {"canonical", "inbound", "outbound", "frame", "iframe"}


@dataclass
class OracleResult:
    seen: set[str] = field(default_factory=set)  # url_ids (incl. rejected)
    status: dict[str, tuple[str, str]] = field(default_factory=dict)  # url_id -> (status, comment_class)
    frontier: list[dict] = field(default_factory=list)  # ordered rows
    metrics: list[dict] = field(default_factory=list)  # per (depth) counters


def _anchored(pattern: str):
    return re.compile(pattern) if pattern else None


def _full(rx, s: str) -> bool:
    return rx is not None and rx.fullmatch(s) is not None


def crawl(
    docs: dict[str, list[dict]],  # doc_id(normal url) -> spans
    seeds: list[str],  # raw seed URLs (already split)
    profile: dict,
    blacklist: list[dict] | None = None,  # [{rule_kind, host, pattern}]
    robots: dict[str, dict] | None = None,  # host -> {disallow:[prefix], delay_ms}
    preexisting_status: set[str] | None = None,  # url_ids in crawl_status (D3)
    wave_start_fn=None,  # depth -> wave-start epoch ms (engine clock mirror)
    indexer_blacklist: list[dict] | None = None,  # same shape as blacklist
) -> OracleResult:
    res = OracleResult()
    wave_start_fn = wave_start_fn or (lambda _depth: 0)
    blacklist = blacklist or []
    indexer_blacklist = indexer_blacklist or []
    robots = robots or {}
    preexisting = set(preexisting_status or ())

    host_slot: dict[str, int] = {}
    mm = _anchored(profile.get("mustmatch", ".*"))
    mnm = _anchored(profile.get("mustnotmatch", ""))
    imm = _anchored(profile.get("indexmustmatch", ".*"))
    imnm = _anchored(profile.get("indexmustnotmatch", ""))
    max_depth = int(profile.get("crawlingDepth", 3))
    lane = "priority" if int(profile.get("priority", 0)) > 0 else "normal"
    crawl_id_ = profile.get("id", "crawl-0")

    bl_hosts = {b["host"] for b in blacklist if b.get("rule_kind") == "host" and b.get("host")}
    bl_regex = [
        re.compile(b["pattern"])
        for b in blacklist
        if b.get("rule_kind") == "regex" and b.get("pattern")
    ]

    def blacklisted(u: str) -> bool:
        # host rules short-circuit on exact host equality
        # (Blacklist.java:110-118); regex rules are full-match (:119-125)
        if url_host(u) in bl_hosts:
            return True
        return any(r.fullmatch(u) is not None for r in bl_regex)

    # the INDEXER blacklist (grid.indexer.blacklist, default
    # indexer_blacklist_filetypes.txt) gates only the index/noindex
    # split — a blacklisted URL is still crawled, it just rides the
    # noindex lane (CrawlerListener.java:374-384)
    ibl_hosts = {
        b["host"]
        for b in indexer_blacklist
        if b.get("rule_kind") == "host" and b.get("host")
    }
    ibl_regex = [
        re.compile(b["pattern"])
        for b in indexer_blacklist
        if b.get("rule_kind") == "regex" and b.get("pattern")
    ]

    def indexer_blacklisted(u: str) -> bool:
        if url_host(u) in ibl_hosts:
            return True
        return any(r.fullmatch(u) is not None for r in ibl_regex)

    def robots_blocked(u: str) -> bool:
        rb = robots.get(url_host(u))
        if not rb:
            return False
        rest = u.split("://", 1)[1]
        path = rest[rest.find("/") :] if "/" in rest else "/"
        return any(path.startswith(p) for p in rb.get("disallow", ()))

    # wave 0 input: the rootasset graph — one canonical link per seed
    # (CrawlStartService.java:186-191)
    wave_links: list[tuple[int, int, int, str]] = [
        (0, i, 0, s) for i, s in enumerate(seeds)
    ]  # (parent_batch_no, parent_batch_pos, span_offset, raw_url)

    depth = 0
    while True:
        m = {
            "crawl_id": crawl_id_,
            "depth": depth,
            "extracted": len(wave_links),
            "parsed_ok": 0,
            "deduped_session": 0,
            "deduped_persistent": 0,
            "rejected_filter": 0,
            "rejected_blacklist": 0,
            "rejected_robots": 0,
            "accepted": 0,
            "do_index": 0,
        }
        # --- per-link pipeline in canonical order ---
        survivors: list[tuple[str, str]] = []  # (url_id, url) insertion-ordered
        surv_ids: set[str] = set()
        for _pb, _pp, _off, raw in sorted(wave_links, key=lambda t: (t[0], t[1], t[2])):
            norm = canonicalize_url(raw)  # P2
            if norm is None:
                continue
            m["parsed_ok"] += 1
            if content_domain(norm) not in ("text", "all"):  # F1
                continue
            uid = url_id(norm)  # P3
            if uid in res.seen:  # D2 check…
                m["deduped_session"] += 1
                continue
            res.seen.add(uid)  # …add BEFORE the filters (:312-315)
            if not _full(mm, norm) or (mnm and mnm.pattern and _full(mnm, norm)):  # F2
                res.status[uid] = ("rejected", "filter")
                m["rejected_filter"] += 1
                continue
            if blacklisted(norm):  # F3
                res.status[uid] = ("rejected", "blacklist")
                m["rejected_blacklist"] += 1
                continue
            if robots_blocked(norm):  # RB (north rule)
                res.status[uid] = ("rejected", "robots")
                m["rejected_robots"] += 1
                continue
            if uid not in surv_ids:
                surv_ids.add(uid)
                survivors.append((uid, norm))
        # D3: persistent exist-check — silently drop
        kept: list[tuple[str, str]] = []
        for uid, u in survivors:
            if uid in preexisting:
                m["deduped_persistent"] += 1
            else:
                kept.append((uid, u))
        # F4 index/noindex split: crawl-profile constraint AND the
        # indexer blacklist (CrawlerListener.java:375-379 — both must
        # pass for the index lane)
        def do_index(u: str) -> bool:
            prof = _full(imm, u) and not (
                imnm and imnm.pattern and _full(imnm, u)
            )
            return prof and not indexer_blacklisted(u)

        idx = [(uid, u) for uid, u in kept if do_index(u)]
        noidx = [(uid, u) for uid, u in kept if not do_index(u)]
        # G2 (index pass before noindex) + G1 batches of 8 + politeness.
        # host_slot is PERSISTENT across waves (cross-wave politeness
        # budget — the engine's log-structured host_slots table).
        for ini, group in ((0, idx), (1, noidx)):
            for pos, (uid, u) in enumerate(group):
                h = url_host(u)
                slot = host_slot.get(h, 0)
                host_slot[h] = slot + 1
                delay = robots.get(h, {}).get("delay_ms", 0)
                res.status[uid] = ("accepted", "index" if ini == 0 else "noindex")
                res.frontier.append(
                    {
                        "crawl_id": crawl_id_,
                        "url": u,
                        "url_id": uid,
                        "depth": depth,
                        "lane": lane,
                        "do_index": ini == 0,
                        "batch_no": pos // BATCH_SIZE,
                        "batch_pos": pos % BATCH_SIZE,
                        "host": h,
                        "fetch_slot": slot,
                        "not_before_ms": wave_start_fn(depth) + slot * delay,
                    }
                )
                m["accepted"] += 1
                m["do_index"] += 1 if ini == 0 else 0
        res.metrics.append(m)
        # F5 depth gate: expand only if depth < max_depth
        if depth >= max_depth or not kept:
            break
        # next wave: links of fetched docs, canonical parent order
        ordered_parents = [
            r
            for r in res.frontier
            if r["depth"] == depth
        ]
        ordered_parents.sort(
            key=lambda r: (not r["do_index"], r["batch_no"], r["batch_pos"])
        )
        wave_links = []
        for p_ord, r in enumerate(ordered_parents):
            spans = docs.get(r["url"])
            if spans is None:
                continue  # loader found nothing — URL not in corpus
            for sp in spans:
                if sp["kind"] in LINK_KINDS and sp.get("text"):
                    wave_links.append((p_ord, 0, sp["offset"], sp["text"]))
        depth += 1
        if not wave_links:
            break
    return res
