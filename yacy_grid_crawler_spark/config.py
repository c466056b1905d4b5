"""Crawl-profile schema + defaults, mirroring the reference's public
config surface key-for-key (CrawlerDefaultValuesService.java:45-79) with
the REST layer's typed coercions (CrawlStartService.java:82-94) and the
depth clamp (CrawlStartService.java:98-99).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any

from .functions.urlnorm import canonicalize_url, smart_sld, url_host

MAX_DEPTH = 8  # hard clamp, CrawlStartService.java:99
BATCH_SIZE = 8  # loader fan-out partition size, CrawlerListener.java:406
SEEN_TTL_DAYS = 7  # double-cache TTL, CrawlerListener.java:84

ANONYMOUS_USER = "anonymous"

# key → default, in the reference's insertion order
# (CrawlerDefaultValuesService.java:47-78)
DEFAULT_PROFILE: dict[str, Any] = {
    "crawlingMode": "url",
    "crawlingURL": "",
    "sitemapURL": "",
    "crawlingFile": "",
    "crawlingDepth": 3,
    "crawlingDepthExtension": "",
    "range": "domain",
    "mustmatch": ".*",
    "mustnotmatch": r".*\.(js|css|jpg|jpeg|png|dmg|mpg|mpeg|zip|gz|exe|pkg)",
    "ipMustmatch": ".*",
    "ipMustnotmatch": "",
    "indexmustmatch": ".*",
    "indexmustnotmatch": "",
    "deleteold": "off",
    "deleteIfOlderNumber": 0,
    "deleteIfOlderUnit": "day",
    "recrawl": "nodoubles",
    "reloadIfOlderNumber": 0,
    "reloadIfOlderUnit": "day",
    "crawlingDomMaxCheck": "off",
    "crawlingDomMaxPages": 1000,
    "crawlingQ": "off",
    "cachePolicy": "if fresh",
    "collection": "user",
    "agentName": "",
    "priority": 0,
    "loaderHeadless": "false",
    "user_id": ANONYMOUS_USER,
    "storeAssets": "false",
    "archiveWARC": "false",
    "archiveIndex": "false",
    "archiveGraph": "false",
}

_INT_KEYS = {
    "crawlingDepth",
    "deleteIfOlderNumber",
    "reloadIfOlderNumber",
    "crawlingDomMaxPages",
    "priority",
}
_BOOL_KEYS = {"storeAssets", "archiveWARC", "archiveIndex", "archiveGraph", "loaderHeadless"}


def make_profile(overrides: dict[str, Any] | None = None) -> dict[str, Any]:
    """Clone of the defaults with per-key typed coercion
    (CrawlStartService.java:79-94) and the depth clamp (:98-99)."""
    p = dict(DEFAULT_PROFILE)
    for k, v in (overrides or {}).items():
        if k not in p:
            p[k] = v
            continue
        if k in _INT_KEYS:
            p[k] = int(v)
        elif k in _BOOL_KEYS:
            p[k] = str(v).lower() in ("true", "1", "on") if not isinstance(v, bool) else v
        else:
            p[k] = str(v)
    p["crawlingDepth"] = min(int(p["crawlingDepth"]), MAX_DEPTH)
    return p


def parse_collections(collection_str: str | None) -> dict[str, str]:
    """Collection parser (WebMapping.collectionParser, called at
    CrawlerListener.java:257-258 and CrawlStartService.java:102; the
    parser itself lives in the yacy_grid library — same public
    contract as YaCy's CrawlProfile.collectionParser): a
    comma-separated list of ``name`` or ``name:pattern`` entries →
    ordered name→pattern map; a bare name gets the catch-all ``.*``.
    Empty/blank input → empty map. The crawler stamps only the NAMES
    on status docs (keySet(), :322); the patterns are matched per-URL
    downstream (see operators.filters.collections_verdict)."""
    if not collection_str or not collection_str.strip():
        return {}
    out: dict[str, str] = {}
    for piece in collection_str.strip().split(","):
        p = piece.find(":")
        if p < 0:
            out[piece] = ".*"
        else:
            out[piece[:p]] = piece[p + 1 :]
    return out


def crawl_id(start_url_norm: str, date: datetime, count: int) -> str:
    """``host[:80](+hashCode)-yyyy-MM-dd-HH-mm-ss-count``
    (getCrawlID, CrawlerListener.java:142-147). Java's String.hashCode
    is reproduced exactly for the >80-char host branch."""
    host = url_host(start_url_norm)
    if len(host) > 80:
        h = 0
        for ch in host:
            h = (31 * h + ord(ch)) & 0xFFFFFFFF
        if h >= 0x80000000:
            h -= 0x100000000
        host = host[:80] + "-" + str(h)
    ts = date.strftime("%Y-%m-%d %H:%M:%S").replace(":", "-").replace(" ", "-")
    return f"{host}-{ts}-{count}"


def build_crawl_start(
    profile: dict[str, Any],
    seed_url: str,
    count: int = 0,
    now: datetime | None = None,
) -> dict[str, Any]:
    """Per-seed single-crawl profile clone: id, start_url (normal form),
    start_ssld (CrawlStartService.java:111-119)."""
    now = now or datetime(2020, 1, 1, tzinfo=timezone.utc)
    norm = canonicalize_url(seed_url)
    if norm is None:
        raise ValueError(f"malformed seed url: {seed_url!r}")
    single = dict(profile)
    single["id"] = crawl_id(norm, now, count)
    single["start_url"] = norm
    single["start_ssld"] = smart_sld(url_host(norm))
    single["init_date"] = now
    # plural user_ids (CrawlerListener.java:195-199): an action may
    # carry a user_ids array; the singular user_id is appended iff
    # absent. Rides the profile (our action envelope analogue) and is
    # persisted in profile_json for the export layer.
    uid = single.get("user_id") or ANONYMOUS_USER
    user_ids = list(single.get("user_ids") or [])
    if uid not in user_ids:
        user_ids.append(uid)
    single["user_ids"] = user_ids
    return single
