"""robots.txt policy (ops/robots.py): RFC 9309 parse, group selection,
longest-match precedence, wildcard/anchor patterns."""

import pytest

from chug_spark.ops.robots import (
    parse_robots,
    robots_filter,
    select_agent_rules,
)

ROBOTS_MAIN = """\
# crawl policy
User-Agent: *
Disallow: /private
Allow: /private/ok
Disallow:
DISALLOW: /*.pdf$

User-agent: chugbot
User-agent: otherbot
Disallow: /p/7*
Allow: /p/77
"""


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_parse_groups_and_directives(spark):
    rules = parse_robots(_robots(spark, [("h", ROBOTS_MAIN)]))
    got = {(r.agent, r.allow, r.prefix) for r in rules.collect()}
    # empty Disallow: dropped; comments/case handled; the consecutive
    # User-agent run shares one group (both agents get both rules)
    assert got == {
        ("*", False, "/private"),
        ("*", True, "/private/ok"),
        ("*", False, "/*.pdf$"),
        ("chugbot", False, "/p/7*"),
        ("chugbot", True, "/p/77"),
        ("otherbot", False, "/p/7*"),
        ("otherbot", True, "/p/77"),
    }


def test_agent_group_is_exclusive_not_merged(spark):
    rules = parse_robots(_robots(spark, [("h", ROBOTS_MAIN)]))
    sel = select_agent_rules(rules, "ChugBot")
    got = {(r.allow, r.prefix) for r in sel.collect()}
    # RFC 9309: only the most specific group applies — the * group's
    # /private rules must NOT leak into chugbot's rule set
    assert got == {(False, "/p/7*"), (True, "/p/77")}
    # unknown agent falls back to the * group
    fall = {(r.allow, r.prefix) for r in select_agent_rules(rules, "nobody").collect()}
    assert fall == {(False, "/private"), (True, "/private/ok"), (False, "/*.pdf$")}


def test_longest_match_allow_ties_and_default(spark):
    robots = _robots(spark, [("ex.com", ROBOTS_MAIN)])
    urls = _urls(
        spark,
        [
            (1, "https://ex.com/private/x"),       # /private -> deny
            (2, "https://ex.com/private/ok/x"),    # longer allow wins
            (3, "https://ex.com/open"),            # no rule -> allow
            (4, "https://ex.com/a/b.pdf"),         # wildcard+anchor -> deny
            (5, "https://ex.com/a/b.pdfx"),        # $ anchor: no match
            (6, "https://other.com/private/x"),    # host without robots
        ],
    )
    got = {r.doc_id: (r.allow, r.rule_prefix) for r in robots_filter(urls, robots).collect()}
    assert got == {
        1: (False, "/private"),
        2: (True, "/private/ok"),
        3: (True, None),
        4: (False, "/*.pdf$"),
        5: (True, None),
        6: (True, None),
    }


def test_agent_specific_verdicts_and_query_match(spark):
    robots = _robots(spark, [("ex.com", ROBOTS_MAIN)])
    urls = _urls(
        spark,
        [
            (1, "https://ex.com/p/71"),   # chugbot: /p/7* deny
            (2, "https://ex.com/p/77"),   # equal-length tie -> allow wins
            (3, "https://ex.com/private/x"),  # * group does not apply
        ],
    )
    got = {r.doc_id: r.allow for r in robots_filter(urls, robots, agent="chugbot").collect()}
    assert got == {1: False, 2: True, 3: True}
    # tie detail: /p/77 matched by deny /p/7* (len 5) and allow /p/77
    # (len 5, after '*' counts as written) -> allow


def test_match_target_includes_query_and_root_path(spark):
    robots = _robots(spark, [("ex.com", "User-agent: *\nDisallow: /s?q=x\nDisallow: /$")])
    urls = _urls(
        spark,
        [
            (1, "https://ex.com/s?q=x1"),  # query participates in the match
            (2, "https://ex.com/s?q=y"),
            (3, "https://ex.com"),         # no path -> '/' ; '/$' denies root only
            (4, "https://ex.com/deep"),
        ],
    )
    got = {r.doc_id: r.allow for r in robots_filter(urls, robots).collect()}
    assert got == {1: False, 2: True, 3: False, 4: True}


def test_hostile_inputs_never_throw(spark):
    robots = _robots(
        spark,
        [
            ("a.com", None),                           # NULL robots body
            ("b.com", "Disallow: /x\nUser-agent: *"),  # rule before any group
            ("c.com", "User-agent: *\nDisallow: /(["), # regex metachars, literal
        ],
    )
    urls = _urls(
        spark,
        [(1, "https://a.com/x"), (2, "https://b.com/x"), (3, "https://c.com/([y")],
    )
    got = {r.doc_id: r.allow for r in robots_filter(urls, robots).collect()}
    # a: NULL body -> allow; b: orphan rule has no group -> dropped -> allow;
    # c: metachars matched literally via the escape -> deny
    assert got == {1: True, 2: True, 3: False}
