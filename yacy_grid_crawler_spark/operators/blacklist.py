"""F3 — crawler/indexer blacklist: file loader + distributed apply.

Reference format (Blacklist.java:57-90; conf/config.properties:16-29):
one rule per line; ``# …`` full-line comments; `` #`` inline info;
``host <h>`` lines compile to ``.*?//<h>/.*+`` but short-circuit on
exact host equality when a parsed URL is supplied (Blacklist.java:
105-118); all other lines are full-match regexes (:119-125). First
match wins — for a boolean verdict that is any-match.

Spark-first replacement for the reference's ARC caches + per-thread
instances (Blacklist.java:40-54; CrawlerListener.java:158-189): the
seen-set dedup (D2) already guarantees each URL is checked exactly
once, so memo caches are unnecessary (SURVEY.md §4). Host rules become
a broadcast semi-join on the exact host (JVM-side, no regex at all);
regex rules in the dialect-safe subset (see `jvm_safe_pattern`) run as
a single anchored JVM `rlike` inside whole-stage codegen; only the
(few) dialect-sensitive patterns run in the Arrow UDF kernel with
per-task-compiled patterns.
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import make_regex_full_match_udf

_LOG = logging.getLogger(__name__)


@dataclass(frozen=True)
class BlacklistRule:
    rule_kind: str  # 'host' | 'regex'
    host: str | None
    pattern: str
    source: str
    info: str


def _compilable(pattern: str) -> bool:
    """Reference parity (Blacklist.java:75-84): a line whose regex
    fails to compile is warn-logged and skipped, never a crash. The
    gate compiles with Python `re` — the oracle's evaluator and the
    Arrow kernel's dialect — so every surviving rule is guaranteed
    evaluable on both the engine and the oracle side. (A pattern valid
    in exactly one dialect, e.g. Java-only ``\\p{L}``, is dropped
    here where the reference would keep it; documented divergence.)"""
    try:
        re.compile(pattern)
        return True
    except re.error:
        return False


def parse_lines(lines: list[str], source: str = "inline") -> list[BlacklistRule]:
    """Parse the reference file format (Blacklist.java:59-88)."""
    rules: list[BlacklistRule] = []
    for line in lines:
        line = line.strip()
        info = ""
        p = line.find(" #")
        if p >= 0:
            info = line[p + 1 :].strip()
            line = line[:p].strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("host "):
            host = line[5:].strip()
            pattern = f".*?//{host}/.*+"
            if not _compilable(pattern):
                _LOG.warning(
                    "regex for host in %s cannot be compiled: %s", source, host
                )
                continue
            rules.append(BlacklistRule("host", host, pattern, source, info))
        else:
            if not _compilable(line):
                _LOG.warning(
                    "regex for url in %s cannot be compiled: %s", source, line
                )
                continue
            rules.append(BlacklistRule("regex", None, line, source, info))
    return rules


def load_files(paths: list[str]) -> list[BlacklistRule]:
    rules: list[BlacklistRule] = []
    for path in paths:
        with open(path, encoding="utf-8") as fh:
            rules.extend(parse_lines(fh.read().splitlines(), source=path))
    return rules


def default_indexer_rules() -> list[BlacklistRule]:
    """The reference's default indexer blacklist
    (``grid.indexer.blacklist = indexer_blacklist_filetypes.txt``,
    conf/config.properties:30): markup/style/script file types and
    robots.txt are crawled and link-expanded but never enter the
    search index. Expressed here as equivalent anchored full-match
    regexes rather than a shipped copy of the conf file."""
    return parse_lines(
        [
            r".*\.xml",
            r".*\.css",
            r".*\.js",
            r".*/robots\.txt",
        ],
        source="default_indexer_rules",
    )


def rules_df(spark: SparkSession, rules: list[BlacklistRule]) -> DataFrame:
    """FIXTURES.md §4 blacklist_rules shape."""
    return spark.createDataFrame(
        [(r.rule_kind, r.host, r.pattern, r.source, r.info) for r in rules],
        "rule_kind string, host string, pattern string, source string, info string",
    )


_ISIN_MAX = 64  # above this, a literal In-list bloats every plan copy

# The shipped host list is 13k rows; building its DataFrame costs a
# driver-side py4j transfer per call — a parallelism-independent term
# that lands in EVERY wave's fixed floor. The list is immutable for a
# crawl's lifetime, so memoize per (session, host-set) and persist the
# tiny result (its logical plan then stays one LocalRelation node
# instead of re-shipping 13k literals into each wave's analysis).
_HOSTS_DF_CACHE: dict[tuple[int, str, int], DataFrame] = {}


def _hosts_df(spark: SparkSession, hosts: list[str], host_col: str) -> DataFrame:
    key = (id(spark._jsparkSession), host_col, hash(tuple(hosts)))
    df = _HOSTS_DF_CACHE.get(key)
    if df is None:
        if len(_HOSTS_DF_CACHE) >= 8:  # bound driver-side cache growth
            for stale in _HOSTS_DF_CACHE.values():
                try:
                    stale.unpersist()
                except Exception:
                    pass
            _HOSTS_DF_CACHE.clear()
        df = (
            spark.createDataFrame([(h,) for h in hosts], f"{host_col} string")
            .withColumn("_bl_host_hit", F.lit(True))
            .persist()
        )
        _HOSTS_DF_CACHE[key] = df
    return df


# Dialect-safe regex subset: patterns built ONLY from tokens whose
# meaning is identical in Python `re` (the oracle's evaluator) and
# Java `Pattern` (Spark's regexp_like). Safe patterns can run JVM-side
# inside whole-stage codegen — keeping the wave's post-D3 segment
# zero-Python when the rule list is simple (the shipped default
# indexer rules, filetype rules) — without risking engine/oracle
# dialect drift. Deliberately EXCLUDED (ride the Arrow kernel, exact
# Python-re semantics): \d/\w/\s/\b (ASCII in Java, Unicode in
# Python), anchors ^/$ (line-terminator quirks), backreferences,
# lookarounds, inline flags. Possessive quantifiers (``.*+``, used
# throughout the reference's shipped lists) ARE safe: Python ≥3.11
# implements them with Java's exact no-backtracking semantics (the
# Arrow kernel already depends on that).
_JVM_SAFE_GRAMMAR = re.compile(
    r"""\A(?:
        (?: \(\?:                            # non-capturing group open
          | \((?!\?)                         # capturing group (no (?… extensions)
          | \|                               # alternation
        )                                    # …openers: NOT quantifiable — a
                                             # quantifier here is "Illegal
                                             # repetition" in Java but a literal
                                             # '{'/compile error in Python
      | (?: [A-Za-z0-9\ _~%:;,=&@!/-]        # plain literals
          | \\[.\\/+*?()\[\]{}|-]            # escaped metachars
          | \[\^?[A-Za-z0-9_.\ /-]+\]        # simple char classes
          | [.)]                             # any-char / group close
        )                                    # …atoms, each takes at most ONE
        (?: [*+?][?+]?                       # greedy / lazy / possessive
          | \{\d+(?:,\d*)?\}[?+]?            # counted repetition
        )?
        (?![*+?{])                           # no stacked quantifiers, no
                                             # dangling unescaped '{'
    )*\Z""",
    re.VERBOSE,
)


def jvm_safe_pattern(pattern: str) -> bool:
    """True iff `pattern` parses under the dialect-safe grammar above
    (then Java `Pattern` and Python `re` agree on every input)."""
    return _JVM_SAFE_GRAMMAR.fullmatch(pattern) is not None


def apply_blacklist(
    df: DataFrame,
    rules: list[BlacklistRule],
    url_col: str = "url",
    host_col: str = "host",
    out_col: str = "blacklisted",
) -> DataFrame:
    """Adds boolean `out_col`. Host rules: exact-host membership —
    small lists inline as `isin`; large lists (the shipped
    13,434-host file) become a BROADCAST LEFT JOIN against a hosts
    DataFrame, because a 13k-literal In-expression replicates into
    every downstream plan copy and blows up Catalyst planning/codegen
    time (measured: >10× wave slowdown). Regex rules: dialect-safe
    patterns (see `jvm_safe_pattern`) run as ONE anchored JVM
    `rlike` inside codegen — zero Python for simple lists like the
    default indexer rules; everything else runs in the vectorized
    Arrow UDF, anchored full-match (Python `re` ≥3.11 supports Java's
    possessive quantifiers used by the shipped lists, e.g. ``.*+``)."""
    hosts = sorted({r.host for r in rules if r.rule_kind == "host" and r.host})
    regexes = [r.pattern for r in rules if r.rule_kind == "regex"]

    verdict = F.lit(False)
    if hosts and len(hosts) <= _ISIN_MAX:
        verdict = F.col(host_col).isin(hosts)
    elif hosts:
        df = df.join(
            F.broadcast(_hosts_df(df.sparkSession, hosts, host_col)),
            host_col,
            "left",
        )
        verdict = F.coalesce(F.col("_bl_host_hit"), F.lit(False))
    jvm_safe = [p for p in regexes if jvm_safe_pattern(p)]
    py_only = [p for p in regexes if not jvm_safe_pattern(p)]
    if jvm_safe:
        # one combined anchored alternation, evaluated JVM-side inside
        # codegen (\A..\z = Matcher.matches, no $-newline quirk); no
        # backreferences in the safe grammar, so group renumbering in
        # the union is harmless for a boolean verdict
        union = "|".join(f"(?:{p})" for p in jvm_safe)
        verdict = verdict | F.coalesce(
            F.col(url_col).rlike(f"\\A(?:{union})\\z"), F.lit(False)
        )
    if py_only:
        regex_hit = make_regex_full_match_udf(py_only)
        verdict = verdict | F.coalesce(regex_hit(F.col(url_col)), F.lit(False))
    out = df.withColumn(out_col, verdict)
    return out.drop("_bl_host_hit") if "_bl_host_hit" in out.columns else out
