"""robots.txt politeness filter (operators/robots.py) — RFC 9309."""

from __future__ import annotations

import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import robots as R


def test_reference_parser_rfc_semantics():
    text = (
        "# comment-only line\n"
        "Disallow: /ignored-no-group\n"      # before any UA: ignored
        "USER-AGENT: AlphaBot\n"             # case-insensitive key+agent
        "User-agent: BetaBot\n"              # stacked run
        "Disallow: /a # trailing comment\n"
        "Allow:\n"                           # empty value: no rule
        "allow: /a/ok\n"
        "User-agent: *\n"                    # new run after rules
        "Disallow: /b\n"
        "not-a-directive\n"
        "Crawl-delay: 10\n"                  # group directive (r12)
    )
    rows = R.parse_robots_text(text)
    assert rows == [
        ("alphabot", "disallow", "/a"),
        ("betabot", "disallow", "/a"),
        ("alphabot", "allow", "/a/ok"),
        ("betabot", "allow", "/a/ok"),
        ("*", "disallow", "/b"),
        ("*", "crawl-delay", "10"),
    ]


def test_unknown_directives_do_not_split_ua_runs(spark):
    """RFC 9309 §2.2.4: unsupported directives are ignored entirely —
    a User-agent line after one STACKS onto the same run.  Both
    parsers must agree (the local one once diverged here)."""
    text = (
        "User-agent: a\n"
        "Request-rate: 1/10\n"       # unknown: ignored, run continues
        "User-agent: b\n"
        "Disallow: /x\n"
        "Sitemap: http://h/s.xml\n"  # unknown after rules: ignored
        "User-agent: c\n"            # rules DID end the run -> new group
        "Disallow: /y\n"
        "User-agent: d\n"
        "Crawl-delay: 3\n"           # KNOWN since r12: ends the run
        "User-agent: e\n"            # -> new group, its own sentinel
    )
    local = R.parse_robots_text(text)
    assert local == [
        ("a", "disallow", "/x"),
        ("b", "disallow", "/x"),
        ("c", "disallow", "/y"),
        ("d", "crawl-delay", "3"),
        ("e", "group", ""),
    ]
    df = spark.createDataFrame([("h", text)], ["host", "robots_txt"])
    got = sorted(
        (r["agent"], r["rule"], r["pattern"])
        for r in R.parse_robots(df).collect()
    )
    assert got == sorted(local)


def test_distributed_parser_matches_reference(spark):
    hosts = sorted(R.ROBOTS_FIXTURE_TEXTS)
    got = {
        (r["host"], r["agent"], r["rule"], r["pattern"])
        for r in R.parse_robots(R.synthesize_robots(spark)).collect()
    }
    want = {
        (h, a, rule, pat)
        for h in hosts
        for a, rule, pat in R.parse_robots_text(R.ROBOTS_FIXTURE_TEXTS[h])
    }
    assert got == want


def _decide(spark, rules_rows, captures_rows, agent="databot"):
    rules = spark.createDataFrame(
        rules_rows, ["host", "agent", "rule", "pattern"]
    )
    caps = spark.createDataFrame(captures_rows, ["doc_id", "host", "path"])
    return {
        r["doc_id"]: (r["allowed"], r["rule"], r["pattern"])
        for r in R.robots_decisions(caps, rules, agent).collect()
    }


def test_match_precedence_and_defaults(spark):
    rules = [
        ("h", "*", "disallow", "/"),
        ("h", "*", "allow", "/public*"),
        ("h", "*", "disallow", "/public/secret*"),
    ]
    caps = [
        (0, "h", "/public/doc"),       # allow /public* (len 8) beats /
        (1, "h", "/private/doc"),      # only / matches -> disallowed
        (2, "h", "/public/secret/x"),  # longest disallow wins
        (3, "nowhere", "/anything"),   # no rules for host -> allowed
    ]
    got = _decide(spark, rules, caps)
    assert got[0] == (True, "allow", "/public*")
    assert got[1] == (False, "disallow", "/")
    assert got[2] == (False, "disallow", "/public/secret*")
    assert got[3] == (True, None, None)


def test_allow_wins_length_ties(spark):
    rules = [
        ("h", "*", "disallow", "/p/x*"),
        ("h", "*", "allow", "/p/x$"),  # same length (5)
    ]
    got = _decide(spark, rules, [(0, "h", "/p/x"), (1, "h", "/p/xy")])
    assert got[0] == (True, "allow", "/p/x$")
    assert got[1] == (False, "disallow", "/p/x*")  # $ leg doesn't match


def test_group_override_not_merge(spark):
    """A host with the agent's own group uses ONLY that group — the
    star group's rules do not merge in (RFC 9309 §2.2.1)."""
    rules = [
        ("h", "*", "disallow", "/private*"),
        ("h", "databot", "disallow", "/tmp*"),
    ]
    got = _decide(
        spark, rules,
        [(0, "h", "/private/x"), (1, "h", "/tmp/x")],
    )
    assert got[0] == (True, None, None)  # star rule ignored
    assert got[1] == (False, "disallow", "/tmp*")


def test_wildcard_anchor_and_like_escaping(spark):
    rules = [
        ("h", "*", "disallow", "/*.png$"),
        ("h", "*", "disallow", "/under_score"),
    ]
    caps = [
        (0, "h", "/a/b.png"),          # wildcard + anchor hit
        (1, "h", "/a/b.png?x=1"),      # anchor defeated by query
        (2, "h", "/under_score/x"),    # literal underscore prefix
        (3, "h", "/underXscore/x"),    # _ must NOT behave as LIKE _
    ]
    got = _decide(spark, rules, caps)
    assert got[0][0] is False
    assert got[1][0] is True
    assert got[2][0] is False
    assert got[3][0] is True


def test_robots_filter_keeps_original_columns(spark):
    rules = [("h", "*", "disallow", "/no*")]
    caps = spark.createDataFrame(
        [(0, "h", "/ok", "keep-me"), (1, "h", "/no/x", "drop-me")],
        ["doc_id", "host", "path", "payload"],
    )
    rdf = spark.createDataFrame(rules, ["host", "agent", "rule", "pattern"])
    out = R.robots_filter(caps, rdf, "databot").collect()
    assert [(r["doc_id"], r["payload"]) for r in out] == [(0, "keep-me")]


def test_decisions_plan_broadcasts_rules(spark):
    """The capture-side plan must broadcast the (small) rules table —
    no shuffle of the capture stream for the join."""
    from pyspark.sql import functions as F

    rules = R.parse_robots(R.synthesize_robots(spark))
    caps = (
        spark.range(2000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("h"), (F.col("id") % 5).cast("string"),
                F.lit(".example.com"),
            ).alias("host"),
            F.concat(F.lit("/private/doc/"), F.col("id")).alias("path"),
        )
    )
    plan = R.robots_decisions(caps, rules, "databot")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_sitemap_parse_and_index_children(spark):
    """Sitemap subset extraction: url entries with/without lastmod,
    whitespace tolerance, index files yielding children (and zero url
    rows)."""
    import datetime as dt

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import (
        sitemap as S,
    )

    urlset = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> http://h/a </loc><lastmod>2024-03-05T10:00:00Z"
        "</lastmod></url>"
        "<url>\n<loc>http://h/b</loc>\n</url>"
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>http://h/maps/1.xml</loc>"
        "</sitemap><sitemap><loc>http://h/maps/2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [("h", urlset), ("h2", index)], ["host", "xml"]
    )
    rows = {
        (r["host"], r["loc"]): r["lastmod"]
        for r in S.parse_sitemaps(df).collect()
    }
    assert rows == {
        ("h", "http://h/a"): dt.date(2024, 3, 5),
        ("h", "http://h/b"): None,
    }
    kids = sorted(
        r["child_loc"] for r in S.sitemap_index_children(df).collect()
    )
    assert kids == ["http://h/maps/1.xml", "http://h/maps/2.xml"]


def test_coverage_report_counts_both_gap_directions(spark):
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import (
        sitemap as S,
    )

    sm = spark.createDataFrame(
        [
            ("h", "http://h/a", None),
            ("h", "http://h/b", None),
            ("h", "http://h/phantom", None),
        ],
        "host STRING, loc STRING, lastmod DATE",
    )
    caps = spark.createDataFrame(
        [(0, "h", "/a"), (1, "h", "/b"), (2, "h", "/off")],
        ["doc_id", "host", "path"],
    )
    [r] = S.crawl_coverage_report(sm, caps).collect()
    assert (
        r["n_sitemap"],
        r["n_captured"],
        r["n_matched"],
        r["n_uncaptured"],
        r["n_off_sitemap"],
    ) == (3, 3, 2, 1, 1)


def test_empty_group_emits_existence_sentinel():
    """ADVICE r11: an explicit rule-less group (RFC 9309 §2.2.1
    allow-everything) must be VISIBLE — both parsers emit an
    (agent, 'group', '') sentinel for it, for a bare UA run at EOF
    and for a group whose only rules are empty-valued."""
    text = (
        "User-agent: *\n"
        "Disallow: /\n"
        "User-agent: databot\n"
        "Disallow:\n"            # empty value: no rule, group exists
        "User-agent: tailbot\n"  # bare run at EOF: group exists
    )
    rows = R.parse_robots_text(text)
    assert rows == [
        ("*", "disallow", "/"),
        ("databot", "group", ""),
        ("tailbot", "group", ""),
    ]


def test_empty_group_distributed_matches_local(spark):
    text = (
        "User-agent: a\nUser-agent: b\n"  # stacked empty group
        "Allow:\n"
        "User-agent: *\nDisallow: /x\n"
    )
    local = sorted(R.parse_robots_text(text))
    df = spark.createDataFrame([("h", text)], ["host", "robots_txt"])
    got = sorted(
        (r["agent"], r["rule"], r["pattern"])
        for r in R.parse_robots(df).collect()
    )
    assert got == local == [
        ("*", "disallow", "/x"),
        ("a", "group", ""),
        ("b", "group", ""),
    ]


def test_explicit_empty_group_beats_star(spark):
    """The ADVICE scenario end-to-end: 'User-agent: databot' +
    'Disallow:' means allow-everything for databot even when the *
    group disallows everything — previously the * group incorrectly
    applied (over-blocking)."""
    text = (
        "User-agent: *\n"
        "Disallow: /\n"
        "User-agent: databot\n"
        "Disallow:\n"
    )
    rules = R.parse_robots(
        spark.createDataFrame([("h", text)], ["host", "robots_txt"])
    )
    caps = spark.createDataFrame(
        [(0, "h", "/anything"), (1, "h", "/deep/path")],
        ["doc_id", "host", "path"],
    )
    got = {
        r["doc_id"]: (r["allowed"], r["rule"], r["pattern"])
        for r in R.robots_decisions(caps, rules, "databot").collect()
    }
    assert got[0] == (True, None, None)
    assert got[1] == (True, None, None)
    # a generic agent still falls through to * and is blocked
    other = {
        r["doc_id"]: r["allowed"]
        for r in R.robots_decisions(caps, rules, "otherbot").collect()
    }
    assert other == {0: False, 1: False}


def test_sitemap_directives_and_gz_payloads(spark):
    """r12: Sitemap: directives extract host-statelessly (local twin
    == distributed), and gz/plain sitemap wire bytes decode to the
    same parse."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import (
        sitemap as S,
    )

    text = (
        "User-agent: *\n"
        "Disallow: /x\n"
        "Sitemap: http://h/sitemap.xml\n"
        "sitemap: http://h/other.xml  # case-insensitive + comment\n"
        "Sitemap:\n"                    # empty value: no directive
    )
    assert S.sitemap_directives_text(text) == [
        "http://h/sitemap.xml",
        "http://h/other.xml",
    ]
    df = spark.createDataFrame([("h", text)], ["host", "robots_txt"])
    got = sorted(
        (r["host"], r["sitemap_url"])
        for r in S.parse_sitemap_directives(df).collect()
    )
    assert got == [("h", "http://h/other.xml"), ("h", "http://h/sitemap.xml")]
    # and the rule parse still ignores the directive lines entirely
    rules = R.parse_robots(df.withColumnRenamed("robots_txt", "robots_txt"))
    assert sorted(
        (r["agent"], r["rule"], r["pattern"]) for r in rules.collect()
    ) == [("*", "disallow", "/x")]

    import gzip

    xml = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://h/a</loc></url></urlset>"
    )
    payloads = spark.createDataFrame(
        [("h", xml.encode()), ("g", gzip.compress(xml.encode(), mtime=0))],
        ["host", "payload"],
    )
    decoded = {
        r["host"]: r["xml"]
        for r in S.sitemaps_from_bytes(payloads).collect()
    }
    assert decoded == {"h": xml, "g": xml}


def test_coverage_discovered_only_counts_declared_hosts(spark, sf_dir):
    """h1's sitemap exists but is undeclared; h3 has no robots.txt —
    in the discovered report both have n_sitemap=0 and all their
    captures off-sitemap, while declared hosts match the full
    report's rows exactly."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import (
        sitemap as S,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers

    docs = readers.read_documents(spark, sf_dir)
    robots = R.synthesize_robots(spark)
    declared = {
        r["host"].split("//")[1].split("/")[0]
        for r in S.parse_sitemap_directives(robots)
        .selectExpr("sitemap_url as host")
        .collect()
    }
    assert declared == {
        "h0.example.com", "h2.example.com", "h4.example.com",
        "h5.example.com",
    }
    caps = R.with_capture_paths(docs)
    full = {
        r["host"]: r.asDict()
        for r in S.crawl_coverage_report(
            S.parse_sitemaps(S.fixture_sitemaps(docs)), caps
        ).collect()
    }
    disc = {
        r["host"]: r.asDict()
        for r in S.coverage_report_discovered(
            robots, S.fixture_sitemap_payloads(docs), caps
        ).collect()
    }
    assert set(disc) == set(full)
    for h, row in disc.items():
        if h in declared:
            assert row == full[h]
        else:
            assert row["n_sitemap"] == 0 and row["n_matched"] == 0
            assert row["n_off_sitemap"] == row["n_captured"] > 0


def test_index_walk_fetches_only_named_children(spark, sf_dir):
    """r12: the expansion parses exactly the children the index names
    — an unnamed extra child body must not leak into the output, and
    the named-children walk reproduces the flat parse."""
    from pyspark.sql import functions as F

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import (
        sitemap as S,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers

    docs = readers.read_documents(spark, sf_dir)
    index, children = S.fixture_sitemap_index(docs)
    rogue = spark.createDataFrame(
        [(
            "h0.example.com",
            "/sitemap-rogue.xml",
            '<urlset><url><loc>http://h0.example.com/rogue</loc></url>'
            "</urlset>",
        )],
        ["host", "child", "xml"],
    )
    got = sorted(
        map(tuple, S.expand_sitemap_index(index, children.union(rogue)).collect())
    )
    want = sorted(
        map(tuple, S.parse_sitemaps(S.fixture_sitemaps(docs)).collect())
    )
    assert got == want
    assert not any("/rogue" in r[1] for r in got)


def test_recrawl_candidates_semantics(spark):
    from datetime import date

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import (
        sitemap as S,
    )

    sm = spark.createDataFrame(
        [
            ("h", "http://h/stale", date(2024, 1, 20)),
            ("h", "http://h/fresh", date(2024, 1, 2)),
            ("h", "http://h/same-day", date(2024, 1, 5)),
            ("h", "http://h/no-lastmod", None),
            ("h", "http://h/uncaptured", date(2024, 1, 28)),
        ],
        ["host", "loc", "lastmod"],
    )
    caps = spark.createDataFrame(
        [
            ("h", "/stale", date(2024, 1, 5)),
            ("h", "/fresh", date(2024, 1, 10)),
            ("h", "/same-day", date(2024, 1, 5)),
            ("h", "/no-lastmod", date(2024, 1, 1)),
        ],
        ["host", "path", "captured_date"],
    )
    got = S.recrawl_candidates(sm, caps).collect()
    assert [(r["path"], r["lastmod"], r["captured_date"]) for r in got] == [
        ("/stale", date(2024, 1, 20), date(2024, 1, 5))
    ]


def test_crawl_delay_parse_and_precedence(spark):
    """Crawl-delay rows parse in both parsers; delay lookup follows
    GROUP selection (an exact group without a delay means default,
    not *'s delay); malformed values are ignored; multiple valid
    lines take the max."""
    texts = [
        ("a.ex", "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n"),
        # bot's own group exists but carries no delay -> no delay row
        ("b.ex", "User-agent: bot\nDisallow: /y\n"
                 "User-agent: *\nCrawl-delay: 9\n"),
        # malformed + valid: max of the valid lines
        ("c.ex", "User-agent: bot\nCrawl-delay: fast\n"
                 "Crawl-delay: 3\nCrawl-delay: 7\n"),
    ]
    local = {
        (h, a, r, p)
        for h, t in texts
        for a, r, p in R.parse_robots_text(t)
    }
    assert ("a.ex", "*", "crawl-delay", "5") in local
    assert ("c.ex", "bot", "crawl-delay", "fast") in local
    rules = R.parse_robots(
        spark.createDataFrame(texts, ["host", "robots_txt"])
    )
    dist = {
        (r["host"], r["agent"], r["rule"], r["pattern"])
        for r in rules.collect()
    }
    assert dist == local
    delays = {
        r["host"]: r["delay_s"]
        for r in R.crawl_delays(rules, "bot").collect()
    }
    assert delays == {"a.ex": 5, "c.ex": 7}


def test_polite_fetch_plan_slots(spark):
    """Admitted URLs queue per host at delay spacing; disallowed
    captures never occupy a slot."""
    rules = R.parse_robots(
        spark.createDataFrame(
            [("h.ex", "User-agent: *\nDisallow: /no*\nCrawl-delay: 3\n")],
            ["host", "robots_txt"],
        )
    )
    captures = spark.createDataFrame(
        [
            (1, "h.ex", "/a"),
            (2, "h.ex", "/no/skip"),
            (3, "h.ex", "/b"),
            (4, "other.ex", "/c"),
        ],
        ["doc_id", "host", "path"],
    )
    plan = {
        r["doc_id"]: (r["delay_s"], r["fetch_at_s"])
        for r in R.polite_fetch_plan(
            captures, rules, "bot"
        ).collect()
    }
    # h.ex: /a then /b at 3s spacing; other.ex: default delay 1
    assert plan == {1: (3, 0), 3: (3, 3), 4: (1, 0)}
