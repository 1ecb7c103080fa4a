"""robots.txt parsing and crawl-allow filtering.

A crawl corpus is only usable if it respects (or at least RECORDS)
robots policy; every production pipeline keeps a per-host rules table
and an allowed/disallowed verdict per URL.  Two operators:

- ``parse_robots_rules`` — robots.txt TEXT → one row per rule
  (host, rule_path, allow, rule_len), entirely relational: lines are
  ``posexploded``; user-agent lines open rule groups (consecutive UA
  lines share a group, per the REP grammar); a group applies when any
  of its UA lines is ``*`` or the requested agent; Allow/Disallow lines
  inside applying groups become rules.  Windows partition BY HOST, so
  state never crosses documents and the parse scales with hosts.
- ``robots_allowed`` — URLs × rules longest-match verdict per
  google's REP rules: most-specific (longest) rule wins, tie broken
  toward Allow, no matching rule ⇒ allowed.  Rules tables are tiny
  relative to URL tables → broadcast join on host; ``*`` wildcards and
  the ``$`` end anchor compile to per-rule regexes ONCE in the rules
  relation (never per URL row).

Scale: parse is narrow per-host window work over small documents; the
verdict join broadcasts the rules relation and keeps per-URL work to a
regex prefix test + one WindowGroupLimit-style top-1 per URL.

Reference parity note: the reference engine (MLnick/hive-udf) has no
web surface — this extends the mandated crawl-pipeline family
(SURVEY.md §2.3) using the public REP specification (RFC 9309).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["parse_robots_rules", "robots_allowed"]


def parse_robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """→ (host, rule_path, allow, rule_len) — one row per applicable
    Allow/Disallow rule for ``agent`` (group-matched per RFC 9309:
    a group applies if it names ``*`` or the agent, case-insensitive;
    comments ``#...`` stripped; blank Disallow lines — 'allow all' —
    are dropped as rule-less)."""
    applies = _applicable_directives(
        robots, host_col, text_col, agent, ("allow", "disallow")
    )
    return (
        applies.filter(
            F.col("field").isin("allow", "disallow") & (F.col("value") != "")
        )
        .select(
            "host",
            F.col("value").alias("rule_path"),
            (F.col("field") == "allow").alias("allow"),
            F.length("value").alias("rule_len"),
        )
        .distinct()
    )


def parse_crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
    default_delay: int = 1,
    max_delay: int = 60,
) -> DataFrame:
    """→ (host, crawl_delay_s) — the Crawl-delay directive of the
    groups applicable to ``agent`` (the de-facto extension most large
    crawlers honor; not in RFC 9309).  When several applicable groups
    declare one, the MAXIMUM wins — the schedule stays at least as
    polite as every applicable declaration.  Non-numeric and negative
    values are ignored; values above ``max_delay`` clamp (a 10-hour
    Crawl-delay is a de-facto ban better handled by quota policy);
    hosts with no directive get ``default_delay``."""
    applies = _applicable_directives(
        robots, host_col, text_col, agent, ("crawl-delay",)
    )
    declared = (
        applies.filter(
            (F.col("field") == "crawl-delay")
            & F.col("value").rlike(r"^[0-9]+$")
        )
        .select("host", F.col("value").cast("int").alias("d"))
        .groupBy("host")
        .agg(F.least(F.max("d"), F.lit(max_delay)).alias("crawl_delay_s"))
    )
    hosts = robots.select(F.col(host_col).alias("host")).distinct()
    return hosts.join(declared, "host", "left").select(
        "host",
        F.coalesce("crawl_delay_s", F.lit(default_delay)).alias("crawl_delay_s"),
    )


def _applicable_directives(
    robots: DataFrame,
    host_col: str,
    text_col: str,
    agent: str,
    fields: tuple[str, ...],
) -> DataFrame:
    """Shared REP group machinery: split lines, strip comments, detect
    user-agent groups (consecutive UA lines share one group), and keep
    only directives of ``fields`` inside groups naming ``*`` or
    ``agent`` (case-insensitive).  → (host, pos, field, value)."""
    a = agent.lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        # strip comments + whitespace
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    parts = lines.select(
        "host",
        "pos",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1))).alias("field"),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias("value"),
    ).filter(F.col("field").isin("user-agent", *fields))
    w = Window.partitionBy("host").orderBy("pos")
    grouped = parts.withColumn(
        "is_ua", (F.col("field") == "user-agent").cast("int")
    ).withColumn(
        "prev_ua", F.coalesce(F.lag("is_ua").over(w), F.lit(0))
    ).withColumn(
        # consecutive user-agent lines share one group: a group opens at
        # a UA line NOT preceded by another UA line
        "gid",
        F.sum(((F.col("is_ua") == 1) & (F.col("prev_ua") == 0)).cast("int")).over(
            Window.partitionBy("host").orderBy("pos").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    gw = Window.partitionBy("host", "gid")
    return grouped.withColumn(
        "group_applies",
        F.max(
            (
                (F.col("field") == "user-agent")
                & (F.lower("value").isin("*", a))
            ).cast("int")
        ).over(gw),
    ).filter(F.col("group_applies") == 1).select("host", "pos", "field", "value")


def _rule_regex(rule_path):
    """REP rule → anchored regex: '*' is a wildcard, trailing '$' an end
    anchor, everything else literal.  Computed once per RULE row."""
    esc = F.regexp_replace(rule_path, r"([.\[\]{}()+?^$\\|])", r"\\$1")
    # the escaped '$' at end (now '\$') becomes the anchor ('\$' -> '$';
    # the replacement needs its own escaping — bare '$' is a Java group
    # reference); '*' -> '.*'
    pat = F.regexp_replace(esc, r"\\\$$", "\\$")
    pat = F.regexp_replace(pat, r"\*", ".*")
    return F.concat(F.lit("^"), pat)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Append ``allowed`` (boolean) + ``matched_rule`` (string or NULL)
    to ``urls`` (one row per input row, keyed by ``id_col``): the
    longest matching rule decides, ties break toward Allow, no match ⇒
    allowed.  The rules relation is broadcast; the top-1-per-URL window
    partitions on the URL key, never a composite of payload columns."""
    # Rename the rule side up front: rules tables commonly DERIVE from
    # the URL table (per-domain generated policies), and a self-join on
    # shared lineage makes `host` ambiguous otherwise.
    r = (
        rules.withColumn("rule_regex", _rule_regex(F.col("rule_path")))
        .withColumnRenamed("host", "__rule_host")
        .select("__rule_host", "rule_path", "allow", "rule_len", "rule_regex")
    )
    joined = urls.join(
        F.broadcast(r),
        (F.col(host_col) == F.col("__rule_host"))
        & F.expr(f"{path_col} rlike rule_regex"),
        "left_outer",
    )
    w = Window.partitionBy(urls[id_col]).orderBy(
        F.col("rule_len").desc_nulls_last(),
        F.col("allow").desc_nulls_last(),
        # deterministic final key: equally-long same-verdict rules pick
        # the same representative in any engine
        F.col("rule_path").asc_nulls_last(),
    )
    ranked = joined.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") == 1)
    return ranked.select(
        *[urls[c] for c in urls.columns],
        F.coalesce(F.col("allow"), F.lit(True)).alias("allowed"),
        F.col("rule_path").alias("matched_rule"),
    )
