"""robots.txt crawl-policy evaluation (RFC 9309) — the gate every web
pipeline applies before a fetched page may enter the corpus: parse each
host's robots.txt into agent-grouped Allow/Disallow rules, pick the rule
group for the crawler's user-agent (exact group if one exists, else the
``*`` group), and judge each URL by the longest-matching rule, allow
winning ties, default allow when nothing matches.

Scale shapes:

- :func:`parse_robots` is pure Column work over the robots corpus — one
  split/posexplode per file plus two per-host line windows.  robots.txt
  is capped at 500 KiB by RFC 9309, so per-host line counts are bounded
  and the windows never see crawl-scale partitions.
- :func:`robots_filter` joins URLs to the selected rules on ``host``; the
  fan-out per URL is the host's rule count (bounded by the file-size
  cap), and the rules side is tiny next to the crawl, so AQE broadcasts
  it.  The longest-match verdict is a per-URL ``min(struct)`` aggregate —
  a partial-aggregable reduction, NOT a row_number window, so a host with
  10^9 crawled URLs never funnels through one sorting task.
- Matching stays in codegen for the common case: rules without
  wildcards compile to ``startswith`` / equality; only ``*``/``$``
  patterns (rare in real files) fall back to a regex built from the rule.

Semantics implemented (and mirrored by the driver's DuckDB oracle):
directives are case-insensitive; ``#`` comments strip; consecutive
``User-agent`` lines share one group; an empty ``Disallow:`` is a no-op;
``*`` matches any octets and a trailing ``$`` anchors the pattern end;
precedence is longest pattern (as written), allow beating disallow on
equal length.  Percent-encoding normalization is NOT applied — callers
canonicalize URLs first (``functions.canonical_url``).

No counterpart in the reference (extraction-focused); part of the
beyond-reference web-curation suite alongside url_filter/linkgraph/warc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .urlfilter import url_host

#: regex metacharacters escaped in rule patterns ('*' excluded — wildcard)
_ESC_RE = r"([.^$+?(){}\[\]\\|])"


def url_path_query(url: Column) -> Column:
    """path+query of a URL (the RFC 9309 match target), fragment stripped,
    '/' when the URL has no path."""
    rest = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    return F.when(rest == "", F.lit("/")).otherwise(rest)


def parse_robots(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, agent, allow, prefix, rule_no) — every Allow/Disallow rule
    fanned out to each user-agent of its group.

    Group structure per RFC 9309: a run of consecutive ``User-agent``
    lines (after dropping blanks/comments/unknown directives) opens one
    group; the Allow/Disallow lines that follow belong to every agent in
    that run.  Empty-path rules (the "allow everything" idiom) drop."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.coalesce(F.col(txt_col), F.lit("")), "\n")).alias(
            "line_no", "raw"
        ),
    )
    line = F.trim(F.regexp_replace(F.col("raw"), r"#.*$", ""))
    parsed = lines.select(
        "host",
        "line_no",
        F.lower(F.trim(F.regexp_extract(line, r"^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract(line, r"^[^:]*:(.*)$", 1)).alias("value"),
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("key") == "user-agent"
    boundary = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    grouped = parsed.withColumn(
        "group_id", F.sum(boundary.cast("int")).over(w)
    )
    agents = grouped.filter(is_ua).select(
        "host", "group_id", F.lower(F.col("value")).alias("agent")
    )
    rules = grouped.filter(~is_ua & (F.col("value") != "")).select(
        "host",
        "group_id",
        (F.col("key") == "allow").alias("allow"),
        F.col("value").alias("prefix"),
        F.col("line_no").cast("int").alias("rule_no"),
    )
    return agents.join(rules, ["host", "group_id"]).select(
        "host", "agent", "allow", "prefix", "rule_no"
    )


def select_agent_rules(rules: DataFrame, agent: str) -> DataFrame:
    """The single rule group that governs ``agent`` per host: the exact
    agent's rules when that group exists, else the ``*`` group (RFC 9309:
    only the most specific matching group applies — never a merge)."""
    a = agent.lower()
    spec = F.when(F.col("agent") == a, 2).when(F.col("agent") == "*", 1)
    cand = rules.withColumn("spec", spec).filter(F.col("spec").isNotNull())
    best = cand.groupBy("host").agg(F.max("spec").alias("best_spec"))
    return (
        cand.join(best, "host")
        .filter(F.col("spec") == F.col("best_spec"))
        .select("host", "agent", "allow", "prefix")
    )


def _rule_match(path: Column, prefix: Column) -> Column:
    """Does ``path`` match the robots rule ``prefix`` (with */$ support)?
    Non-wildcard rules stay in codegen (startswith / equality); wildcard
    rules compile the pattern to a regex per row."""
    anchor = F.endswith(prefix, F.lit("$"))
    body = F.when(
        anchor, prefix.substr(F.lit(1), F.length(prefix) - 1)
    ).otherwise(prefix)
    has_wild = body.contains("*")
    esc = F.regexp_replace(body, _ESC_RE, r"\\$1")
    regex = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchor, F.lit("$")).otherwise(F.lit("")),
    )
    return (
        F.when(~has_wild & ~anchor, path.startswith(body))
        .when(~has_wild & anchor, path == body)
        .otherwise(F.regexp_like(path, regex))
    )


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, url, host, path, allow, rule_prefix) — RFC 9309 verdict per
    URL against the host's robots.txt for ``agent``.

    ``robots`` is (host, robots_txt).  A URL whose host publishes no
    robots.txt, selects no group, or matches no rule is allowed (RFC
    default).  Precedence: longest rule pattern wins, allow beats
    disallow on equal length — computed as a ``min_by`` aggregate over
    the matched rules (partial-aggregable; no per-host sort)."""
    rules = select_agent_rules(parse_robots(robots), agent).select(
        "host", "allow", "prefix"
    )
    u = urls.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        url_path_query(F.col(url_col)).alias("path"),
    )
    # left join keeps no-robots/no-match URLs; the verdict is then ONE
    # partial-aggregable groupBy on doc_id (min_by ignores rows whose
    # ordering struct is NULL, i.e. non-matching rules) — no join-back of
    # the matched set onto the URL table, so the only big-side shuffles
    # are the host join and the doc_id agg
    ok = _rule_match(F.col("path"), F.col("prefix")) & F.col("prefix").isNotNull()
    win = F.min_by(
        F.when(ok, F.struct("allow", "prefix")),
        # longest prefix wins; allow (sorts before disallow via the 0/1
        # flag) wins ties — encoded so MIN picks the winner
        F.when(
            ok,
            F.struct(
                (-F.length("prefix")).alias("neg_len"),
                (~F.col("allow")).cast("int").alias("deny_first"),
                F.col("prefix").alias("tiebreak"),
            ),
        ),
    )
    return (
        u.join(rules, "host", "left")
        .groupBy("doc_id", "url", "host", "path")
        .agg(win.alias("win"))
        .select(
            "doc_id",
            "url",
            "host",
            "path",
            F.coalesce(F.col("win.allow"), F.lit(True)).alias("allow"),
            F.col("win.prefix").alias("rule_prefix"),
        )
    )
