"""Deterministic seeded spans-corpus generator (FIXTURES.md §1).

Produces the engine input table
    documents(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)
per BASELINE.json input_hint, mirroring the reference's parsed-document
link graph (url_s/canonical_s/inboundlinks_sxt/outboundlinks_sxt/
frames_sxt/iframes_sxt; CrawlerListener.java:52-58, 274-295) recast as
ordered interleaved text+media spans.

Pure Python + stdlib random — no wall clock, no network; a single seed
fully determines the corpus, so the Spark engine and the pure-Python
oracle consume identical bytes.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

LINK_KINDS = ("canonical", "inbound", "outbound", "frame", "iframe")
MEDIA_EXTS = ("jpg", "png", "mp4", "mp3", "zip")
TEXT_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua".split()
)


@dataclass
class Corpus:
    docs: list[dict] = field(default_factory=list)  # {doc_id, spans:[{kind,text,media_ref,offset}]}
    hosts: list[str] = field(default_factory=list)
    seeds: list[str] = field(default_factory=list)
    blacklist_hosts: list[str] = field(default_factory=list)
    robots: dict[str, dict] = field(default_factory=dict)  # host -> {disallow:[...], delay_ms:int}


def _zipf_index(rng: random.Random, n: int, s: float) -> int:
    # inverse-CDF sampling over a finite Zipf(s) distribution
    weights = [1.0 / ((i + 1) ** s) for i in range(n)]
    total = sum(weights)
    x = rng.random() * total
    acc = 0.0
    for i, w in enumerate(weights):
        acc += w
        if acc >= x:
            return i
    return n - 1


def generate(
    seed: int = 42,
    n_docs: int = 500,
    n_hosts: int = 20,
    zipf_s: float = 1.2,
    links_per_doc: int = 8,
    media_ratio: float = 0.2,
    dup_ratio: float = 0.15,
    malformed_ratio: float = 0.05,
    variant_ratio: float = 0.10,
    n_blacklist_hosts: int = 2,
) -> Corpus:
    """Host-skewed page graph: intra-host links ~80%, cross-host ~20%;
    injected duplicates, malformed URLs, fragment/%7C/case variants,
    blacklisted hosts, media-extension URLs (FIXTURES.md §1)."""
    rng = random.Random(seed)
    hosts = [f"host{h:03d}.example.org" for h in range(n_hosts)]
    blacklist_hosts = [f"evil{h}.example.net" for h in range(n_blacklist_hosts)]

    # assign docs to hosts by Zipf
    doc_host = [_zipf_index(rng, n_hosts, zipf_s) for _ in range(n_docs)]
    # page URL per doc (canonical form by construction)
    doc_url = [
        f"http://{hosts[doc_host[i]]}/page/{i:05d}.html" for i in range(n_docs)
    ]
    by_host: dict[int, list[int]] = {}
    for i, h in enumerate(doc_host):
        by_host.setdefault(h, []).append(i)

    robots = {
        h: {
            "disallow": ["/private/"] if rng.random() < 0.5 else [],
            "delay_ms": rng.choice([0, 100, 250, 500]),
        }
        for h in hosts
    }

    docs: list[dict] = []
    for i in range(n_docs):
        spans: list[dict] = []
        off = 0

        def add(kind: str, text: str | None, media_ref: str | None = None):
            nonlocal off
            spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
            off += 1

        add("text", " ".join(rng.choices(TEXT_WORDS, k=rng.randint(3, 12))))
        add("canonical", doc_url[i])
        n_links = rng.randint(max(1, links_per_doc // 2), links_per_doc)
        emitted: list[str] = []
        for _ in range(n_links):
            r = rng.random()
            if emitted and r < dup_ratio:
                target = rng.choice(emitted)  # exact duplicate link
            elif r < dup_ratio + malformed_ratio:
                target = rng.choice(
                    [
                        "http://",
                        "notaurl",
                        "javascript:void(0)",
                        "http://bad host/with space",
                        "mailto:user@example.org",
                    ]
                )
            elif r < dup_ratio + malformed_ratio + variant_ratio and emitted:
                base = rng.choice(emitted)
                target = rng.choice(
                    [
                        base + "#frag",
                        base.replace("http://", "HTTP://"),
                        base.replace(".example.org", ".EXAMPLE.org"),
                        base.replace("/page/", "/page/../page/"),
                    ]
                )
            elif r < dup_ratio + malformed_ratio + variant_ratio + 0.05:
                target = f"http://{rng.choice(blacklist_hosts)}/x/{rng.randint(0, 99)}"
            else:
                same_host = rng.random() < 0.8
                if same_host:
                    j = rng.choice(by_host[doc_host[i]])
                else:
                    j = rng.randrange(n_docs)
                target = doc_url[j]
                if rng.random() < 0.1:
                    target = f"http://{hosts[doc_host[j]]}/private/{j:05d}.html"
            kind = rng.choice(("inbound", "outbound", "outbound", "frame", "iframe"))
            # interleave a text span sometimes
            if rng.random() < 0.3:
                add("text", " ".join(rng.choices(TEXT_WORDS, k=rng.randint(2, 6))))
            add(kind, target)
            emitted.append(target)
        # media spans — never expanded into frontier URLs
        # (images_sxt commented out, CrawlerListener.java:55)
        if rng.random() < media_ratio * 2:
            ext = rng.choice(MEDIA_EXTS)
            ref = f"http://{hosts[doc_host[i]]}/asset/{i:05d}.{ext}"
            add("media", None, ref)
        # media-extension URL as a *link* (default-mustnotmatch test)
        if rng.random() < 0.15:
            ext = rng.choice(MEDIA_EXTS)
            add("outbound", f"http://{hosts[doc_host[i]]}/dl/{i:05d}.{ext}")
        docs.append({"doc_id": doc_url[i], "spans": spans})

    # seeds: a few '|'-separated multi-URL strings over hot hosts
    seeds = [
        doc_url[by_host[0][0]],
        doc_url[by_host[min(1, n_hosts - 1)][0]] + "|" + doc_url[by_host[0][1 % len(by_host[0])]],
        "HTTP://" + hosts[0] + "/page/00000.html#top",  # canonicalization seed
    ]
    return Corpus(
        docs=docs,
        hosts=hosts,
        seeds=seeds,
        blacklist_hosts=blacklist_hosts,
        robots=robots,
    )


def blacklist_lines(corpus: Corpus) -> list[str]:
    """Blacklist file lines in the reference's format
    (Blacklist.java:57-90): 'host <h>' lines + raw regex lines,
    '#' comments and ' #' inline info supported."""
    lines = ["# synthetic blacklist", ""]
    for h in corpus.blacklist_hosts:
        lines.append(f"host {h} # seeded bad host")
    lines.append(r".*?//.*\.internal\.example/.* # regex rule")
    return lines
