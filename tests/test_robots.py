"""robots.txt REP evaluator tests (`operators/robots.py`)."""

from __future__ import annotations

from azure_medicine_data_engineering_spark.operators.robots import (
    _pattern_matches,
    doc_path,
    host_rules_text,
    parse_robots,
    robots_allowed,
)


def test_longest_match_and_allow_tie():
    rules = parse_robots(
        "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
    )
    assert robots_allowed(rules, "/private/x") is False
    assert robots_allowed(rules, "/private/ok/y") is True
    assert robots_allowed(rules, "/public") is True
    # exact tie: Allow wins
    tie = parse_robots("User-agent: *\nDisallow: /abc\nAllow: /abc\n")
    assert robots_allowed(tie, "/abcd") is True


def test_wildcards_and_anchor():
    rules = parse_robots("User-agent: *\nDisallow: /*.pdf$\n")
    assert robots_allowed(rules, "/docs/x.pdf") is False
    assert robots_allowed(rules, "/docs/x.pdfx") is True
    assert _pattern_matches("/a*b", "/aXXXb-tail")
    assert not _pattern_matches("/a*b$", "/aXXXb-tail")
    assert _pattern_matches("/a*b$", "/aXXXb")


def test_agent_group_selection():
    txt = (
        "User-agent: amde\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    mine = parse_robots(txt, agent="amde-bot")
    assert robots_allowed(mine, "/b") is True
    assert robots_allowed(mine, "/a1") is False
    other = parse_robots(txt, agent="zzz")
    assert robots_allowed(other, "/anything") is False
    # longest agent token wins over a shorter prefix group
    txt2 = (
        "User-agent: amde\nDisallow: /x\n"
        "User-agent: amde-bot\nDisallow: /y\n"
    )
    both = parse_robots(txt2, agent="amde-bot")
    assert robots_allowed(both, "/x1") is True
    assert robots_allowed(both, "/y1") is False


def test_empty_disallow_and_comments():
    rules = parse_robots(
        "# all welcome\nUser-agent: *\nDisallow:  # nothing\n"
    )
    assert robots_allowed(rules, "/anything") is True
    # comment-only / malformed lines skip
    rules2 = parse_robots("garbage\n# c\nUser-agent: *\nDisallow: /z\n")
    assert robots_allowed(rules2, "/z9") is False


def test_multi_agent_group_and_rule_separated_groups():
    txt = (
        "User-agent: a\nUser-agent: b\nDisallow: /g\n"
        "User-agent: *\nAllow: /\n"
    )
    ra = parse_robots(txt, agent="a")
    rb = parse_robots(txt, agent="b")
    assert robots_allowed(ra, "/g0") is False
    assert robots_allowed(rb, "/g0") is False
    rz = parse_robots(txt, agent="z")
    assert robots_allowed(rz, "/g0") is True


def test_fixture_contract_matches_sql_shapes():
    # the fixture rules stay wildcard-free prefixes (the oracle contract)
    for k in range(7):
        rules = parse_robots(host_rules_text(k))
        assert all("*" not in p and not p.endswith("$") for _al, p in rules)
        assert len(rules) == 3
    # doc_path hits every rule class across nibbles
    paths = {doc_path(f"{a:x}{b:x}{c:x}0" + "0" * 28)
             for a in range(16) for b in range(16) for c in range(16)}
    assert any("/open" in p for p in paths)
    assert any("/deep" in p for p in paths)
    assert any(p.startswith("/q") for p in paths)


def test_vector_decisions_match_scalar_decision():
    """Optimization round 16: the vectorized REP decision
    (_compiled_rules + _vector_decisions) must equal match_decision on
    every rule class — plain prefix, anchored, wildcard, anchored
    wildcard, empty Disallow, allow-wins-length-ties — including the
    no-match sentinel (-1, True)."""
    import pandas as pd

    from azure_medicine_data_engineering_spark.operators.robots import (
        _compiled_rules,
        _vector_decisions,
        match_decision,
    )

    rules = [
        (False, "/private"),          # prefix disallow
        (True, "/private/ok"),        # longer allow overrides
        (False, "/exact$"),           # anchored
        (False, "/w*card"),           # wildcard
        (True, "/w*card$"),           # anchored wildcard, same core len
        (False, ""),                  # empty disallow: matches nothing
        (True, "/tie"),               # length tie vs next
        (False, "/tie"),              # allow must win the tie
    ]
    paths = [
        "/private/x", "/private/ok/y", "/public", "/exact", "/exactly",
        "/wXcard", "/wXcardY", "/w_longer_card", "/tie", "/tiebreak",
        "", "/", "/exact$", "/w*card",
    ]
    comp = _compiled_rules(rules)
    lens, allowed = _vector_decisions(comp, pd.Series(paths))
    for i, p in enumerate(paths):
        ln, al = match_decision(rules, p)
        assert (int(lens[i]), bool(allowed[i])) == (ln, al), p
