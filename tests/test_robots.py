"""robots.txt parsing + crawl-allow verdict (operators/robots.py, r8)."""

from __future__ import annotations

from pyspark.sql import functions as F

ROBOTS = """# global rules
User-agent: *
Disallow: /private/
Allow: /private/press/
Disallow: /tmp*.bak$

User-agent: badbot
Disallow: /

User-agent: goodbot
User-agent: fancybot
Disallow: /fancy-only/
"""


def _fixture(spark):
    return spark.createDataFrame(
        [("a.com", ROBOTS), ("b.com", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string",
    )


def test_parse_groups_comments_and_agents(spark):
    from hive_udf_spark.operators.robots import parse_robots_rules

    rules = {
        (r.rule_path, r.allow)
        for r in parse_robots_rules(_fixture(spark)).collect()
    }
    # the '*' group's three rules — and NOT badbot's or the shared
    # goodbot/fancybot group's
    assert rules == {
        ("/private/", False),
        ("/private/press/", True),
        ("/tmp*.bak$", False),
    }
    # a specific agent gets ITS group plus nothing from other groups;
    # consecutive User-agent lines share one rule group (RFC 9309)
    bad = {
        (r.rule_path, r.allow)
        for r in parse_robots_rules(_fixture(spark), agent="badbot").collect()
    }
    assert ("/", False) in bad and ("/fancy-only/", False) not in bad
    for a in ("goodbot", "FancyBot"):
        g = {
            (r.rule_path, r.allow)
            for r in parse_robots_rules(_fixture(spark), agent=a).collect()
        }
        assert ("/fancy-only/", False) in g and ("/", False) not in g


def test_longest_match_verdicts(spark):
    from hive_udf_spark.operators.robots import parse_robots_rules, robots_allowed

    rules = parse_robots_rules(_fixture(spark))
    urls = spark.createDataFrame(
        [
            (1, "a.com", "/public/x"),
            (2, "a.com", "/private/doc"),
            (3, "a.com", "/private/press/release"),
            (4, "a.com", "/tmp123.bak"),
            (5, "a.com", "/tmp123.bakx"),
            (6, "b.com", "/anything"),
            (7, "c.com", "/nohost"),
        ],
        "doc_id long, host string, path string",
    )
    got = {r.doc_id: (r.allowed, r.matched_rule) for r in robots_allowed(urls, rules).collect()}
    assert got == {
        1: (True, None),
        2: (False, "/private/"),  # prefix Disallow
        3: (True, "/private/press/"),  # longer Allow overrides
        4: (False, "/tmp*.bak$"),  # '*' wildcard + '$' anchor
        5: (True, None),  # the $ anchor must not match with a suffix
        6: (True, None),  # blank Disallow = no rule at all
        7: (True, None),  # unknown host: default allowed
    }


def test_allow_wins_ties_and_rules_broadcast(spark):
    from hive_udf_spark.operators.robots import robots_allowed

    rules = spark.createDataFrame(
        [("h", "/a/", True), ("h", "/a/", False)],
        "host string, rule_path string, allow boolean",
    ).withColumn("rule_len", F.length("rule_path"))
    urls = spark.createDataFrame([(1, "h", "/a/x")], "doc_id long, host string, path string")
    out = robots_allowed(urls, rules)
    row = out.first()
    assert row.allowed is True  # equal length: Allow wins (RFC 9309)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_parse_crawl_delays(spark):
    from hive_udf_spark.operators.robots import parse_crawl_delays

    txts = [
        # applicable group declares 4; decoy group declares 99
        ("a.org", "User-agent: *\nCrawl-delay: 4\n\nUser-agent: x\nCrawl-delay: 99"),
        # two applicable groups: maximum (most polite) wins
        ("b.org", "User-agent: *\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 6"),
        # no directive -> default
        ("c.org", "User-agent: *\nDisallow: /x"),
        # non-numeric ignored -> default; clamp above max_delay
        ("d.org", "User-agent: *\nCrawl-delay: soon"),
        ("e.org", "User-agent: *\nCrawl-delay: 100000"),
        # comment after value stripped
        ("f.org", "User-agent: *\nCrawl-delay: 7 # be nice"),
    ]
    df = spark.createDataFrame(txts, "host string, robots_txt string")
    got = {
        r.host: r.crawl_delay_s
        for r in parse_crawl_delays(df, default_delay=1, max_delay=60).collect()
    }
    assert got == {"a.org": 4, "b.org": 6, "c.org": 1, "d.org": 1,
                   "e.org": 60, "f.org": 7}
