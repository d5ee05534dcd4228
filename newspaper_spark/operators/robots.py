"""robots.txt parsing + URL gating — the crawl-politeness stage every
web-scale corpus pipeline runs before (or while re-validating) a
fetch. The reference fetches pages without a robots check
(newspaper3k network.py issues plain GETs), so this is a
beyond-reference pipeline operator; the semantics mirrored are the
Python stdlib's ``urllib.robotparser`` — the original 1994 REP
prefix-match rules, verified against it in tests:

* groups: consecutive ``User-agent`` lines share the rule block that
  follows; a ``User-agent`` after rules opens a new group;
* group selection for an agent: the first group (file order) whose
  user-agent token is ``*`` or a substring of the agent name, with
  ``*`` groups considered only after every named group (robotparser's
  ``default_entry``-last behavior); a group listing ``*`` among its
  user-agents is DEMOTED to the default entry even when it also names
  the agent, and only the first such group counts (robotparser's
  ``_add_entry`` keeps one ``default_entry`` and discards later ones);
* rule evaluation INSIDE the group: **first rule in line order whose
  path is a prefix of the URL path wins** — a later, more specific
  ``Allow`` does NOT override an earlier ``Disallow`` (stdlib
  semantics, unlike Google's longest-match RFC 9309 extension — this
  is deliberate fidelity, documented divergence);
* an empty ``Disallow:`` is an allow-everything rule (path ``''``
  matches every URL), exactly as robotparser stores it;
* no rule matches → allowed.

Not mirrored (documented): robotparser URL-quotes rule paths and the
probe path before comparing, and ``%``-unquotes the probe first —
byte-level no-ops for ASCII paths; wildcard ``*``/``$`` patterns are
an RFC 9309 extension robotparser itself does not implement.

Scale shape: parsing is pure Catalyst (split + posexplode + regexes —
no UDF); group numbering uses ONE window partitioned by host and
bounded by lines-per-robots-file (tens — never corpus-wide); the gate
joins URLs to the per-host chosen group's rules (a few rows per host,
AQE-broadcast while small) with a prefix filter and a ``min_by`` line
aggregate. Raw pages never shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_gate", "robots_gate_stream"]

#: explicit horizontal-whitespace class — NEVER \\s cross-engine
#: (CLAUDE.md); robots directives are single-line so \\n can't occur
_HWS = "[ \\t\\r]"

_DIRECTIVE_RE = (
    "^(?i)(user-agent|allow|disallow)" + _HWS + "*:" + _HWS + "*(.*)$"
)


def parse_robots(
    df: DataFrame, robots_col: str = "robots", host_col: str = "host"
) -> DataFrame:
    """Parse robots.txt bodies into a rule relation: one row per
    recognized directive, ``(host, line_no, entry_id, directive,
    value)`` — ``directive`` in {'user-agent','allow','disallow'}
    lowercased, ``value`` comment-stripped and trimmed, ``entry_id``
    the 0-based group number per the grouping rule above. Unrecognized
    lines (comments, blanks, other directives) are dropped, exactly as
    robotparser ignores them."""
    from pyspark.sql import Window as W

    lines = F.split(F.coalesce(F.col(robots_col), F.lit("")), r"\n")
    parsed = df.select(
        F.col(host_col), F.posexplode(lines).alias("line_no", "raw")
    ).select(
        host_col,
        "line_no",
        # robotparser strips each line after comment removal, so an
        # INDENTED directive ('  Disallow: /x') still parses — strip
        # leading whitespace before the anchored directive match
        # (ADVICE r5)
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), "#.*$", ""),
            "^" + _HWS + "+",
            "",
        ).alias("clean"),
    ).select(
        host_col,
        "line_no",
        F.lower(F.regexp_extract("clean", _DIRECTIVE_RE, 1)).alias("directive"),
        F.regexp_replace(
            F.regexp_extract("clean", _DIRECTIVE_RE, 2),
            _HWS + "+$",
            "",
        ).alias("value"),
    ).filter(F.col("directive") != "")
    # group numbering: a user-agent line whose predecessor (among
    # recognized lines) is NOT a user-agent line opens a new entry;
    # window is per-host and bounded by lines-per-robots-file
    w = W.partitionBy(host_col).orderBy("line_no")
    is_ua = (F.col("directive") == "user-agent").cast("int")
    prev_ua = F.lag(is_ua, 1, 0).over(w)
    opens = ((is_ua == 1) & (prev_ua == 0)).cast("int")
    return parsed.withColumn(
        "entry_id",
        F.sum(opens).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ) - 1,
    )


def _chosen_rules(rules: DataFrame, agent: str, host_col: str) -> DataFrame:
    """The selected group's rules for ``agent``, per host:
    ``(host, line_no, rule_path, rule_allow)`` — group selection per
    the module-docstring semantics (named beats demoted-star, earlier
    beats later, mixed groups demoted)."""
    agent_norm = agent.split("/")[0].lower()

    ua = rules.filter(F.col("directive") == "user-agent").select(
        host_col, "entry_id", F.lower(F.col("value")).alias("ua")
    )
    # robotparser DEMOTES any entry listing '*' among its user-agents
    # to the default ('*') entry — even when it also names the agent —
    # and keeps only the FIRST such entry (ADVICE r5: the demotion is
    # per ENTRY, not per user-agent line, so flags aggregate per entry
    # before selection). Named groups beat the default; earlier groups
    # beat later ones; rule evaluation is first-match inside the group.
    entry_flags = ua.groupBy(host_col, "entry_id").agg(
        F.max((F.col("ua") == "*").cast("int")).alias("has_star"),
        F.max(
            (
                (F.col("ua") != "*")
                & F.lit(agent_norm).contains(F.col("ua"))
            ).cast("int")
        ).alias("named_match"),
    )
    pick = (
        entry_flags.filter(
            ((F.col("has_star") == 0) & (F.col("named_match") == 1))
            | (F.col("has_star") == 1)
        )
        .groupBy(host_col)
        .agg(
            F.min(
                F.struct(
                    F.col("has_star").alias("is_star"),
                    F.col("entry_id").alias("entry_id"),
                )
            ).alias("p")
        )
        .select(host_col, F.col("p.entry_id").alias("picked_entry"))
    )
    return rules.filter(F.col("directive") != "user-agent").join(
        pick,
        on=[host_col],
    ).filter(F.col("entry_id") == F.col("picked_entry")).select(
        host_col,
        "line_no",
        F.col("value").alias("rule_path"),
        # robotparser's RuleLine flips an EMPTY Disallow into an
        # allow-everything rule at construction ('' , True) — mirror it
        ((F.col("directive") == "allow") | (F.col("value") == "")).alias(
            "rule_allow"
        ),
    )


def _probe_path(url_col: str):
    """URL → probe path — everything from the first '/' after the
    authority, defaulting to '/' for path-less URLs (robotparser
    defaults the empty probe path to '/', so 'Disallow: /' matches —
    ADVICE r5). The synthetic-universe URLs are plain ASCII so
    robotparser's quoting round-trip is a byte no-op (module
    docstring)."""
    raw_path = F.regexp_extract(F.col(url_col), "^[a-z]+://[^/]*(/.*)?$", 1)
    return F.when(raw_path == "", F.lit("/")).otherwise(raw_path)


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    host_col: str = "host",
) -> DataFrame:
    """Gate ``urls`` (must carry ``host_col`` and ``url_col``) against
    a :func:`parse_robots` relation for ``agent``. Returns the input
    id/url/host plus ``allowed`` (boolean; hosts with no robots rules
    default to allowed) and ``matched_rule`` (the deciding rule's path
    prefix, NULL when no rule matched). ``agent`` is normalized the
    robotparser way: text before the first '/' lowercased."""
    grp = _chosen_rules(rules, agent, host_col)
    probe = urls.withColumn("_path", _probe_path(url_col))
    matched = (
        probe.join(grp, on=[host_col], how="left")
        .filter(
            F.col("rule_path").isNull()
            | F.col("_path").startswith(F.col("rule_path"))
        )
        .groupBy(id_col)
        .agg(
            F.min_by(
                F.struct(
                    F.col("rule_allow").alias("a"),
                    F.col("rule_path").alias("p"),
                ),
                F.coalesce(F.col("line_no"), F.lit(2147483647)),
            ).alias("m")
        )
        .select(
            id_col,
            F.coalesce(F.col("m.a"), F.lit(True)).alias("allowed"),
            F.col("m.p").alias("matched_rule"),
        )
    )
    out = urls.join(matched, id_col, "left")
    # a URL whose every group-rule prefix mismatches loses all its
    # join rows to the filter only when rules exist but none match —
    # the left join above still keeps it via the unmatched-side NULLs
    return out.select(
        id_col,
        url_col,
        host_col,
        F.coalesce(F.col("allowed"), F.lit(True)).alias("allowed"),
        "matched_rule",
    )


def robots_gate_stream(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    host_col: str = "host",
) -> DataFrame:
    """Map-only twin of :func:`robots_gate` for Structured Streaming:
    the batch gate's per-URL min_by aggregate is a stateful streaming
    aggregation, but first-match evaluation over a host's rules is a
    BOUNDED scan (tens of lines per robots.txt) — so this variant
    packs each host's chosen-group rules into one line-ordered array
    (batch side), stream-static broadcast-joins it onto the URLs, and
    takes the first prefix match with a Column filter. Zero
    aggregations on the stream, zero state: legal in append mode with
    no watermark (``urls`` may be streaming; ``rules`` is batch state,
    exactly how a crawl loop holds robots.txt snapshots).

    Same verdicts as robots_gate by construction (array order = line
    order = the batch min_by key) — proven by the batch-equivalence
    test. The HOF filter is interpreted per element (CLAUDE.md), but
    over ≤ rules-per-robots-file elements — bounded, not corpus-sized.
    """
    grp = _chosen_rules(rules, agent, host_col)
    per_host = grp.groupBy(host_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("line_no").alias("line_no"),
                    F.col("rule_path").alias("p"),
                    F.col("rule_allow").alias("a"),
                )
            )
        ).alias("_rules")
    )
    probe = urls.withColumn("_path", _probe_path(url_col)).join(
        F.broadcast(per_host), host_col, "left"
    )
    # try_element_at: a host WITH rules where none prefix-match yields
    # an EMPTY filtered array — ANSI element_at raises there; the
    # no-rules host yields NULL and both must fall through to allowed
    first = F.try_element_at(
        F.filter(
            F.col("_rules"),
            lambda r: F.col("_path").startswith(r["p"]),
        ),
        F.lit(1),
    )
    return probe.select(
        id_col,
        url_col,
        host_col,
        F.coalesce(first["a"], F.lit(True)).alias("allowed"),
        first["p"].alias("matched_rule"),
    )
