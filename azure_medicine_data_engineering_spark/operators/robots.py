"""robots.txt (Robots Exclusion Protocol) evaluation — the crawl
POLITENESS stage between URL canonicalization (`operators/urls.py`) and
WARC fetch ingest (`sources/warc.py`): a compliant crawler must evaluate
every candidate URL against its host's robots rules before fetching.

Parser/evaluator semantics follow the REP as published by Google (the
de-facto standard and RFC 9309):

* Group structure: consecutive ``User-agent:`` lines open a group whose
  ``Allow:`` / ``Disallow:`` rules apply to all listed agents; matching
  picks the group for the crawler's token, falling back to ``*``.
* Rule matching: a rule matches a path if its pattern matches a PREFIX,
  with ``*`` matching any char run and ``$`` anchoring the end.
* Decision: the LONGEST matched pattern wins (specificity); on a
  length tie ``Allow`` wins. No matching rule → allowed. An empty
  ``Disallow:`` matches nothing (classic allow-all idiom).
* Lines are case-insensitive on field names; comments (``#``) strip;
  unknown fields ignore.

The Spark stage is one Arrow ``mapInPandas`` pass over (host rules ×
doc URLs) pairs pre-joined by host — map-only, no shuffle beyond the
host join. The fixture writer emits wildcard-free PREFIX rules so the
DuckDB oracle can replay the longest-prefix decision in pure SQL while
the DECODER's wildcard/anchor support is pinned by unit tests.

No counterpart in the reference (crawl-scale extension, same family as
WARC/HTML/URL)."""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def parse_robots(text: str, agent: str = "amde-bot") -> list[tuple[bool, str]]:
    """Parse robots.txt into the rule list applying to ``agent``:
    ``[(is_allow, pattern), ...]``. Group selection: the most specific
    user-agent token match (longest token that is a prefix of ``agent``,
    case-insensitive), else the ``*`` group."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    saw_rule = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if saw_rule:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, saw_rule = [], [], False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            saw_rule = True
            cur_rules.append((field == "allow", value))
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))
    agent_l = agent.lower()
    best: list[tuple[bool, str]] | None = None
    best_len = -1
    star: list[tuple[bool, str]] | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = rules
            elif agent_l.startswith(a) and len(a) > best_len:
                best, best_len = rules, len(a)
    chosen = best if best is not None else (star or [])
    return [(al, pat) for al, pat in chosen if pat != "" or not al]


def _pattern_matches(pattern: str, path: str) -> bool:
    """REP pattern prefix-match with ``*`` (any run) and ``$`` (end)."""
    if pattern == "":
        return False  # empty Disallow matches nothing
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in pattern)
    rx = "^" + rx + ("$" if anchored else "")
    return re.match(rx, path) is not None


def match_decision(rules: list[tuple[bool, str]], path: str) -> tuple[int, bool]:
    """Longest-match REP decision: ``(winning_rule_len, allowed)``, with
    ``(-1, True)`` when no rule matches. Allow wins length ties (the
    max over ``(length, is_allow)`` tuples — True > False). The single
    implementation behind :func:`robots_allowed`, :func:`robots_gate`
    and :func:`robots_gate_urls`."""
    cands = [
        (len(p.rstrip("$")), al)
        for al, p in rules
        if _pattern_matches(p, path)
    ]
    if not cands:
        return -1, True
    return max(cands)


def robots_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Longest-match decision over parsed rules; Allow wins length ties;
    no match → allowed."""
    return match_decision(rules, path)[1]


def _compiled_rules(
    rules: list[tuple[bool, str]],
) -> list[tuple[int, bool, str, object]]:
    """Precompile a parsed rule list for vectorized matching
    (optimization round 16, guide §4.2): ``(rule_len, is_allow, kind,
    matcher)`` per rule, where kind is ``pre`` (plain prefix — the
    wildcard-free common case, a C-speed ``str.startswith``), ``eq``
    (anchored wildcard-free — exact equality) or ``rx`` (a compiled
    regex, built ONCE instead of re-built per (rule, path) call the way
    ``_pattern_matches`` does). Empty patterns match nothing and are
    dropped (same as ``_pattern_matches('')``)."""
    comp: list[tuple[int, bool, str, object]] = []
    for al, pat in rules:
        if pat == "":
            continue
        rule_len = len(pat.rstrip("$"))
        anchored = pat.endswith("$")
        core = pat[:-1] if anchored else pat
        if "*" not in core:
            comp.append((rule_len, al, "eq" if anchored else "pre", core))
        else:
            rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in core)
            rx = "^" + rx + ("$" if anchored else "")
            comp.append((rule_len, al, "rx", re.compile(rx)))
    return comp


def _vector_decisions(comp, paths):
    """Vectorized :func:`match_decision` over a pandas Series of paths:
    returns ``(rule_len int64[n], allowed bool[n])``. Exactly the
    sequential fold of the lexicographic max over matching
    ``(rule_len, is_allow)`` candidates, seeded with the no-match
    sentinel ``(-1, True)`` (every real rule_len >= 0, so any match
    replaces the sentinel — identical to ``max(cands)`` / empty-cands
    semantics)."""
    import numpy as np

    n = len(paths)
    best_len = np.full(n, -1, dtype=np.int64)
    best_allow = np.ones(n, dtype=bool)
    for rule_len, al, kind, m in comp:
        if kind == "pre":
            mask = paths.str.startswith(m).to_numpy()
        elif kind == "eq":
            mask = (paths == m).to_numpy()
        else:
            mask = paths.str.match(m).to_numpy()
        upd = mask & (
            (rule_len > best_len)
            | ((rule_len == best_len) & al & ~best_allow)
        )
        best_len = np.where(upd, rule_len, best_len)
        best_allow = np.where(upd, al, best_allow)
    return best_len, best_allow


# ---------------------------------------------------------------------------
# Deterministic fixture + Spark plumbing
# ---------------------------------------------------------------------------

#: md5-driven per-host rule set, wildcard-free so the oracle replays the
#: longest-prefix decision in SQL. Hosts are ``hN.example.com`` for
#: N = doc_id % n_hosts; paths come from the doc's md5 hex.
N_HOSTS = 7


def host_rules_text(host_idx: int) -> str:
    """robots.txt for fixture host ``h<idx>``: a '*' group with three
    prefix rules derived from the host index (deterministic), plus a
    decoy group for another agent and comment/blank noise."""
    return (
        "# fixture robots for h%d\n"
        "User-agent: other-bot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /p%d\n"
        "Allow: /p%d/open\n"
        "Disallow: /q%d/deep\n"
        % (host_idx, host_idx % 4, host_idx % 4, (host_idx + 1) % 4)
    )


def doc_path(hex32: str) -> str:
    """Deterministic URL path from a doc's md5 hex: /p<k>[/open][/deep]
    segments chosen by digest nibbles — collides with every rule class."""
    a = int(hex32[0], 16) % 4
    b = int(hex32[1], 16) % 3
    seg = "/p%d" % a if b != 2 else "/q%d" % a
    tail = {0: "", 1: "/open", 2: "/deep"}[int(hex32[2], 16) % 3]
    return seg + tail + "/page" + hex32[3]


ROBOTS_GATE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("host", StringType()),
        StructField("path", StringType()),
        StructField("allowed", BooleanType()),
        StructField("rule_len", IntegerType()),
    ]
)


def robots_gate(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Evaluate every document's fixture URL against its host's robots
    rules in ONE Arrow pass (rules are parsed once per host per batch —
    |hosts| is small; at crawl scale the host-rules table is a broadcast
    dimension). Emits ``(doc_id, host, path, allowed, rule_len)`` where
    ``rule_len`` is the winning pattern length (-1 = no rule matched)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        # vectorized decisions (optimization round 16, guide §4.2 — see
        # robots_gate_urls); the md5 path derivation stays a per-row loop
        # (hashlib has no vector form) but the rule matching is C-speed
        comp_cache = {
            k: _compiled_rules(parse_robots(host_rules_text(k)))
            for k in range(N_HOSTS)
        }
        for pdf in batches:
            dids = pdf[id_col].to_numpy()
            paths = pd.Series(
                [
                    doc_path(
                        hashlib.md5(str(t).encode("utf-8")).hexdigest()
                    )
                    for t in pdf[text_col]
                ]
            )
            ks = (dids % N_HOSTS).astype(np.int64)
            n = len(pdf)
            lens = np.full(n, -1, dtype=np.int64)
            allowed = np.ones(n, dtype=bool)
            for k in range(N_HOSTS):
                sel = ks == k
                if not sel.any():
                    continue
                ln_k, al_k = _vector_decisions(
                    comp_cache[k], paths[sel]
                )
                lens[sel] = ln_k
                allowed[sel] = al_k
            yield pd.DataFrame(
                {
                    "doc_id": dids.astype(np.int64),
                    "host": np.array(
                        ["h%d.example.com" % k for k in ks], dtype=object
                    ),
                    "path": paths.to_numpy(),
                    "allowed": allowed,
                    "rule_len": lens.astype("int32"),
                }
            )

    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    return ensure_parallelism(
        df.select(F.col(id_col).cast("long").alias(id_col), F.col(text_col))
    ).mapInPandas(run, ROBOTS_GATE_SCHEMA)


URL_GATE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("pos", IntegerType()),
        StructField("host_idx", IntegerType()),
        StructField("path", StringType()),
        StructField("allowed", BooleanType()),
        StructField("rule_len", IntegerType()),
    ]
)


def robots_gate_urls(df: DataFrame) -> DataFrame:
    """URL-grain REP gate (round 12): evaluate FRONTIER rows
    ``(media_id, pos, host_idx, path)`` — e.g. sitemap-discovered URLs —
    against each host's robots rules in one Arrow pass, the composable
    sibling of :func:`robots_gate` (which manufactures its own per-doc
    URL). Rules parse once per host per batch; at crawl scale the
    host-rules table is a broadcast dimension. Map-only."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np

        # Optimization round 16 (guide §4.2): the decision loop is now
        # VECTORIZED — rules compile once per task, each batch is sliced
        # per host (<= N_HOSTS groups) and matched with C-speed
        # startswith/equality/compiled-regex over the whole slice,
        # replacing the per-URL Python match_decision calls (which
        # re-built a regex string per (rule, path)). Bit-identical
        # semantics: tests/test_robots.py pins _vector_decisions ==
        # match_decision on wildcard/anchor/tie/empty rule sets.
        comp_cache = {
            k: _compiled_rules(parse_robots(host_rules_text(k)))
            for k in range(N_HOSTS)
        }
        for pdf in batches:
            n = len(pdf)
            lens = np.full(n, -1, dtype=np.int64)
            allowed = np.ones(n, dtype=bool)
            hosts = pdf["host_idx"].to_numpy()
            # round-12 advice: bad host_idx must RAISE, never wrap or
            # fall through to the no-match sentinel
            if n and ((hosts < 0) | (hosts >= N_HOSTS)).any():
                bad = hosts[(hosts < 0) | (hosts >= N_HOSTS)][0]
                raise KeyError(int(bad))
            for k in range(N_HOSTS):
                sel = hosts == k
                if not sel.any():
                    continue
                ln_k, al_k = _vector_decisions(
                    comp_cache[k], pdf.loc[sel, "path"]
                )
                lens[sel] = ln_k
                allowed[sel] = al_k
            out = pdf[["media_id", "pos", "host_idx", "path"]].copy()
            out["allowed"] = allowed
            out["rule_len"] = lens.astype("int32")
            yield out

    return df.select("media_id", "pos", "host_idx", "path").mapInPandas(
        run, URL_GATE_SCHEMA
    )
