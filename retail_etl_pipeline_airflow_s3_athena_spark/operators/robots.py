"""robots.txt politeness filter (RFC 9309) — the crawl tier's
admission control, upstream of URL-canonical dedup.

A crawl-processing pipeline must not TRAIN on what the crawler was
not allowed to FETCH: re-checking captures against each host's
robots.txt is the standard provenance hygiene step (CommonCrawl
re-filters the same way).  This module implements the RFC 9309
matching core as pure relational operators:

- ``parse_robots``: (host, robots_txt) rows -> (host, agent, rule,
  pattern) rows, distributed.  Group semantics per RFC 9309 §2.1:
  consecutive ``User-agent:`` lines stack onto the following rule
  block; comments (#) strip; keys are case-insensitive; empty
  Allow/Disallow values carry no rule.  The stateful group
  association is two window functions over (host, line_no) — robots
  files are KB-scale, so the per-host window is bounded and the
  parse shuffles one exchange on host.
- ``robots_decisions`` / ``robots_filter``: captures (host, path)
  against the parsed rules for one user agent.  RFC matching:
  a rule pattern is a path prefix with ``*`` wildcards and an
  optional ``$`` end anchor; the applicable group is the agent's own
  if the host has one, else the ``*`` group; the winning rule is the
  LONGEST matching pattern (octet length), Allow beating Disallow on
  ties; no matching rule means allowed.  The match compiles each
  pattern to a SQL LIKE pattern (``*``->``%``, specials escaped,
  ``$`` dropping the implicit trailing ``%``) evaluated JVM-side
  with ``LIKE ... ESCAPE`` — no regex, no UDF, and the DuckDB twin
  evaluates the IDENTICAL pattern column, so the gate hashes the
  full match + precedence semantics.

Scale (100 TB of captures): rules are small data (one robots.txt per
host) — ``robots_decisions`` broadcasts the applicable rules and the
only shuffle over captures is the per-capture winner aggregation,
keyed by the capture id (no skew: one group per capture row ×
matched rules, bounded by rules-per-host).  The parse side never
touches the capture table.

Reference scope: none (the reference ingests CSVs) — extension
coverage for the crawl tier, composing with operators/url.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Local (driver-side) reference parser — shared by tests and the
# VALUES-literal oracle builders, the png_stats/wav_stats discipline:
# the distributed parser must reproduce THIS bit-for-bit.
# ---------------------------------------------------------------------------


def parse_robots_text(text: str) -> list[tuple[str, str, str]]:
    """One robots.txt body -> [(agent, rule, pattern)] per RFC 9309:
    consecutive User-agent lines stack; rules before any User-agent
    line are ignored; empty values carry no rule; agents lowercase
    (case-insensitive product tokens), patterns verbatim.

    r12 (ADVICE r11): a group whose rule block carries NO rules (no
    Allow/Disallow lines, or only empty-valued ones — RFC 9309 §2.2.1
    allow-everything groups) emits a ``(agent, 'group', '')``
    GROUP-EXISTENCE sentinel per agent, so downstream precedence can
    see that the agent HAS a group (its own empty group beats the
    ``*`` group) even though it has no rules.  Sentinels never match
    paths — ``applicable_rules`` keys group existence off them and
    drops them from the match side."""
    rows: list[tuple[str, str, str]] = []
    agents: list[str] = []
    in_ua_run = False
    group_has_rule = False
    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_ua_run:
                if agents and not group_has_rule:
                    rows.extend((a, "group", "") for a in agents)
                agents = []
                group_has_rule = False
            in_ua_run = True
            if val:
                agents.append(val.lower())
            continue
        if key == "crawl-delay":
            # de-facto group directive (r12): emitted verbatim as a
            # ('crawl-delay', value) row — it belongs to the group
            # (terminates the UA run) and marks the group non-empty,
            # but never matches paths (applicable_rules keeps the
            # match side allow/disallow only).  Value validation is
            # the CONSUMER's job (crawl_delays try-casts).
            in_ua_run = False
            if val and agents:
                rows.extend((a, "crawl-delay", val) for a in agents)
                group_has_rule = True
            continue
        if key not in ("allow", "disallow"):
            # unsupported directives (Crawl-delay, Sitemap, ...) are
            # ignored ENTIRELY per RFC 9309 §2.2.4 — they neither
            # carry rules nor terminate a User-agent run (a UA line
            # after one still stacks onto the same group, matching
            # the distributed parser, which filters them out before
            # the grouping window)
            continue
        in_ua_run = False
        if val and agents:
            rows.extend((a, key, val) for a in agents)
            group_has_rule = True
    if agents and not group_has_rule:
        rows.extend((a, "group", "") for a in agents)
    return rows


# ---------------------------------------------------------------------------
# Distributed parser
# ---------------------------------------------------------------------------

def parse_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, agent, rule, pattern), the
    distributed twin of parse_robots_text.  Plan: one posexplode of
    the line split (robots files are KB-scale), two windows over
    (host, line_no) — a running group counter that increments where a
    User-agent run starts, and a last-group forward fill for rule
    lines — then an equi-join of rule lines to their group's agent
    lines.  Everything is JVM string expressions; one exchange on
    host."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "line_no", "raw"
        ),
    ).select(
        "host",
        "line_no",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    parsed = lines.filter(F.col("line").contains(":")).select(
        "host",
        "line_no",
        F.lower(
            F.trim(F.substring_index("line", ":", 1))
        ).alias("key"),
        F.trim(
            F.expr("substring(line, instr(line, ':') + 1)")
        ).alias("val"),
    ).filter(
        F.col("key").isin("user-agent", "allow", "disallow", "crawl-delay")
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = (F.col("key") == "user-agent").cast("int")
    prev_ua = F.coalesce(F.lag(is_ua).over(w), F.lit(0))
    staged = parsed.withColumn(
        "grp",
        F.sum(
            ((is_ua == 1) & (prev_ua == 0)).cast("int")
        ).over(w),
    )
    ua = staged.filter(
        (F.col("key") == "user-agent") & (F.col("val") != "")
    ).select(
        "host", "grp", F.lower("val").alias("agent")
    )
    rules = staged.filter(
        (F.col("key") != "user-agent") & (F.col("val") != "")
    ).select(
        "host",
        "grp",
        F.col("key").alias("rule"),
        F.col("val").alias("pattern"),
        "line_no",
    )
    # LEFT join from the agent side (r12, ADVICE r11): a group whose
    # rule block is empty still EXISTS for its agents — RFC 9309
    # §2.2.1's allow-everything group.  Such agents surface as
    # (agent, 'group', '') existence sentinels, exactly like the
    # local reference parser
    return (
        ua.join(rules, ["host", "grp"], "left")
        .select(
            "host",
            "agent",
            F.coalesce("rule", F.lit("group")).alias("rule"),
            F.coalesce("pattern", F.lit("")).alias("pattern"),
            "line_no",
        )
        .orderBy("host", "line_no", "agent")
        .drop("line_no")
    )


# ---------------------------------------------------------------------------
# Matching + precedence
# ---------------------------------------------------------------------------

def like_pattern(pattern: F.Column) -> F.Column:
    """robots path pattern -> SQL LIKE pattern (column expression):
    escape LIKE specials (backslash first), map ``*`` to ``%``, and
    either drop a trailing ``$`` (end-anchored: LIKE is already
    fully anchored) or append ``%`` (prefix match).  Pure literal
    ``replace`` chains — no regex."""
    esc = pattern
    for ch in ("\\", "%", "_"):
        esc = F.replace(esc, F.lit(ch), F.lit("\\" + ch))
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(
        pattern.endswith("$"),
        esc.substr(F.lit(1), F.length(esc) - 1),
    ).otherwise(F.concat(esc, F.lit("%")))


def sql_like_pattern(pattern: str) -> str:
    """DuckDB twin of like_pattern over a column reference."""
    esc = (
        f"replace(replace(replace(replace({pattern}, '\\', '\\\\'),"
        f" '%', '\\%'), '_', '\\_'), '*', '%')"
    )
    return (
        f"CASE WHEN {pattern} LIKE '%$' "
        f"THEN substring({esc}, 1, length({esc}) - 1) "
        f"ELSE {esc} || '%' END"
    )


def applicable_rules(rules: DataFrame, agent: str) -> DataFrame:
    """Per host: the agent's own group if it exists, else the ``*``
    group (RFC 9309 §2.2.1).  Group existence is keyed off ANY row
    for the agent — including the ``(agent, 'group', '')`` existence
    sentinels the parsers emit for rule-less groups (ADVICE r11: an
    explicit empty group means allow-everything for that agent, NOT
    fall-through to ``*``); sentinels are dropped from the returned
    match side.  Rules data is host-cardinality small — one tiny
    aggregation + a re-join on host."""
    agent = agent.lower()
    scoped = rules.filter(F.col("agent").isin(agent, "*"))
    has_exact = scoped.groupBy("host").agg(
        F.max((F.col("agent") == agent).cast("int")).alias("has_exact")
    )
    return (
        scoped.join(has_exact, "host")
        .filter(
            (F.col("agent") == agent)
            | ((F.col("agent") == "*") & (F.col("has_exact") == 0))
        )
        .filter(F.col("rule").isin("allow", "disallow"))
        .select("host", "rule", "pattern")
    )


def robots_decisions(
    captures: DataFrame,
    rules: DataFrame,
    agent: str,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Per-capture admission decision: (id, host, path, allowed,
    rule, pattern) where (rule, pattern) is the winning rule (NULL
    when no rule matched — allowed by default).  Precedence is the
    RFC's longest-match with Allow winning ties, computed as one
    max(struct) aggregation per capture over its broadcast-joined
    matching rules."""
    app = applicable_rules(rules, agent).select(
        F.col("host").alias("__rhost"),
        "rule",
        "pattern",
        like_pattern(F.col("pattern")).alias("__like"),
    )
    joined = captures.join(
        F.broadcast(app),
        (F.col(host_col) == F.col("__rhost"))
        & F.expr(f"{path_col} LIKE __like ESCAPE '\\\\'"),
        "left",
    )
    win = F.max(
        F.when(
            F.col("pattern").isNotNull(),
            F.struct(
                F.octet_length("pattern").alias("len"),
                (F.col("rule") == "allow").cast("int").alias("is_allow"),
                F.col("rule").alias("rule"),
                F.col("pattern").alias("pattern"),
            ),
        )
    ).alias("w")
    agg = joined.groupBy(id_col, host_col, path_col).agg(win)
    return agg.select(
        id_col,
        host_col,
        path_col,
        F.coalesce(F.col("w.is_allow") == 1, F.lit(True)).alias(
            "allowed"
        ),
        F.col("w.rule").alias("rule"),
        F.col("w.pattern").alias("pattern"),
    )


def robots_filter(
    captures: DataFrame,
    rules: DataFrame,
    agent: str,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Admission filter: captures whose decision is allowed, original
    columns preserved (the form the crawl pipeline composes)."""
    dec = robots_decisions(
        captures, rules, agent, id_col, host_col, path_col
    ).select(id_col, "allowed")
    return (
        captures.join(dec, id_col)
        .filter(F.col("allowed"))
        .drop("allowed")
    )


def crawl_delays(rules: DataFrame, agent: str) -> DataFrame:
    """Per host: the Crawl-delay (seconds) of the APPLICABLE group —
    the agent's own group if it exists (even when that group carries
    no delay: group selection happens FIRST, so an exact group
    without a delay means no delay, not fall-through to ``*``'s),
    else the ``*`` group's.  Values try-cast to BIGINT (malformed
    delays are ignored); multiple valid delay lines take the MAX
    (the conservative politeness reading).  Hosts with no applicable
    delay are absent — consumers coalesce their own default."""
    agent = agent.lower()
    scoped = rules.filter(F.col("agent").isin(agent, "*"))
    has_exact = scoped.groupBy("host").agg(
        F.max((F.col("agent") == agent).cast("int")).alias("has_exact")
    )
    return (
        scoped.join(has_exact, "host")
        .filter(
            (F.col("agent") == agent)
            | ((F.col("agent") == "*") & (F.col("has_exact") == 0))
        )
        .filter(F.col("rule") == "crawl-delay")
        .withColumn(
            "delay_s", F.expr("try_cast(pattern AS BIGINT)")
        )
        .filter(F.col("delay_s").isNotNull())
        .groupBy("host")
        .agg(F.max("delay_s").alias("delay_s"))
    )


def polite_fetch_plan(
    captures: DataFrame,
    rules: DataFrame,
    agent: str,
    default_delay_s: int = 1,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """The politeness schedule a fetcher executes: robots-admitted
    captures, one per-host queue ordered by (path, id), each URL
    slotted at ``(position - 1) x the host's Crawl-delay`` seconds
    (declared delay per ``crawl_delays``, else the default).  The
    window is PARTITIONED by host — per-host fetch order is
    inherently sequential (that is the politeness constraint), and
    hosts parallelize freely, so the plan scales with host count,
    not URL count."""
    from pyspark.sql import Window

    admitted = robots_filter(
        captures, rules, agent, id_col, host_col, path_col
    )
    delays = crawl_delays(rules, agent).withColumnRenamed(
        "host", "__dhost"
    )
    w = Window.partitionBy(host_col).orderBy(path_col, id_col)
    return (
        admitted.join(
            F.broadcast(delays),
            F.col(host_col) == F.col("__dhost"),
            "left",
        )
        .withColumn(
            "delay_s",
            F.coalesce(
                F.col("delay_s"), F.lit(default_delay_s)
            ).cast("long"),
        )
        .select(
            id_col,
            host_col,
            path_col,
            "delay_s",
            (
                (F.row_number().over(w) - F.lit(1))
                * F.col("delay_s")
            ).cast("long").alias("fetch_at_s"),
        )
    )


def oracle_fetch_plan_sql(
    rule_rows: list[tuple[str, str, str, str]],
    captures_sql: str,
    agent: str,
    default_delay_s: int = 1,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of polite_fetch_plan: the admission decisions
    oracle as a nested CTE, the delay derivation re-derived over the
    same VALUES rules (group precedence -> try-cast -> max), and the
    per-host slot window."""
    agent_l = agent.lower()
    dec = oracle_decisions_sql(rule_rows, captures_sql, agent, id_col)
    if rule_rows:
        vals = ", ".join(
            "('{}', '{}', '{}', '{}')".format(
                h.replace("'", "''"),
                a.replace("'", "''"),
                r,
                p.replace("'", "''"),
            )
            for h, a, r, p in rule_rows
        )
        rules_cte = f"(VALUES {vals})"
    else:
        rules_cte = "(SELECT NULL, NULL, NULL, NULL WHERE FALSE)"
    return f"""
        WITH dec AS ({dec}),
        admitted AS (
            SELECT {id_col}, host, path FROM dec WHERE allowed
        ),
        drules(host, agent, rule, pattern) AS (
            SELECT * FROM {rules_cte}
        ),
        dscoped AS (
            SELECT r.* FROM drules r JOIN (
                SELECT host,
                       MAX(CASE WHEN agent = '{agent_l}' THEN 1
                           ELSE 0 END) AS has_exact
                FROM drules WHERE agent IN ('{agent_l}', '*')
                GROUP BY host
            ) mh USING (host)
            WHERE r.agent = '{agent_l}'
               OR (r.agent = '*' AND mh.has_exact = 0)
        ),
        delays AS (
            SELECT host,
                   MAX(TRY_CAST(pattern AS BIGINT)) AS delay_s
            FROM dscoped
            WHERE rule = 'crawl-delay'
              AND TRY_CAST(pattern AS BIGINT) IS NOT NULL
            GROUP BY host
        )
        SELECT a.{id_col}, a.host, a.path,
               COALESCE(d.delay_s, {default_delay_s}) AS delay_s,
               (ROW_NUMBER() OVER (
                    PARTITION BY a.host ORDER BY a.path, a.{id_col}
                ) - 1) * COALESCE(d.delay_s, {default_delay_s})
                   AS fetch_at_s
        FROM admitted a LEFT JOIN delays d USING (host)"""


def oracle_decisions_sql(
    rule_rows: list[tuple[str, str, str, str]],
    captures_sql: str,
    agent: str,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of robots_decisions: the parsed rules as a VALUES
    literal (locally recomputed via parse_robots_text — the codec
    oracle discipline), the match + precedence as REAL SQL over the
    identical LIKE patterns."""
    agent = agent.lower()
    if rule_rows:
        vals = ", ".join(
            "('{}', '{}', '{}', '{}')".format(
                h.replace("'", "''"),
                a.replace("'", "''"),
                r,
                p.replace("'", "''"),
            )
            for h, a, r, p in rule_rows
        )
        rules_cte = f"(VALUES {vals})"
    else:
        rules_cte = (
            "(SELECT NULL, NULL, NULL, NULL WHERE FALSE)"
        )
    return f"""
        WITH rules(host, agent, rule, pattern) AS (
            SELECT * FROM {rules_cte}
        ),
        scoped AS (
            SELECT r.*, mh.has_exact FROM rules r JOIN (
                SELECT host,
                       MAX(CASE WHEN agent = '{agent}' THEN 1
                           ELSE 0 END) AS has_exact
                FROM rules WHERE agent IN ('{agent}', '*')
                GROUP BY host
            ) mh USING (host)
            WHERE r.agent = '{agent}'
               OR (r.agent = '*' AND mh.has_exact = 0)
        ),
        app AS (
            -- group-existence sentinels (rule = 'group') feed
            -- has_exact above but never match paths
            SELECT host, rule, pattern,
                   {sql_like_pattern('pattern')} AS like_pat
            FROM scoped WHERE rule IN ('allow', 'disallow')
        ),
        caps AS ({captures_sql}),
        matched AS (
            SELECT c.{id_col}, c.host, c.path,
                   a.rule, a.pattern,
                   strlen(a.pattern) AS plen
            FROM caps c LEFT JOIN app a
              ON c.host = a.host
             AND c.path LIKE a.like_pat ESCAPE '\\'
        ),
        ranked AS (
            SELECT {id_col}, host, path, rule, pattern,
                   -- mirrors Spark's max(struct(len, is_allow, rule,
                   -- pattern)): longest pattern, then allow over
                   -- disallow, then the string fields break exact
                   -- ties deterministically
                   ROW_NUMBER() OVER (
                       PARTITION BY {id_col}
                       ORDER BY plen DESC NULLS LAST,
                                CASE WHEN rule = 'allow' THEN 0
                                     ELSE 1 END,
                                rule DESC, pattern DESC
                   ) AS rn
            FROM matched
        )
        SELECT {id_col}, host, path,
               COALESCE(rule = 'allow', TRUE) AS allowed,
               rule, pattern
        FROM ranked WHERE rn = 1"""


# ---------------------------------------------------------------------------
# Deterministic fixture: five hosts' admission policies + capture
# paths derived from doc_id, exercising every RFC 9309 semantic the
# operators implement (group override, stacked agents, wildcard, $
# anchor, longest-match precedence, allow-beats-disallow, empty
# value, missing robots.txt).  The SQL twins re-derive the capture
# construction so the gate hashes fixture + parse + match together.
# ---------------------------------------------------------------------------

FIXTURE_AGENT = "databot"

ROBOTS_FIXTURE_TEXTS: dict[str, str] = {
    # group override: databot's own group wins over *; Sitemap
    # directive mid-file (r12 — ignored by the RULE parse, feeds
    # discovery)
    "h0.example.com": (
        "# admission policy\n"
        "Sitemap: http://h0.example.com/sitemap.xml\n"
        "User-agent: *\n"
        "Disallow: /private*\n"
        "Allow: /private/ok*\n"
        "\n"
        "User-agent: databot\n"
        "Disallow: /tmp*\n"
        "Crawl-delay: 2\n"
    ),
    # longest-match: Allow /public* beats Disallow /; NO Sitemap
    # directive — its sitemap exists but is undeclared (the robots-
    # level discovery gap coverage_report_discovered measures)
    "h1.example.com": (
        "User-agent: *\n"
        "Disallow: /\n"
        "Allow: /public*\n"
        "Crawl-delay: 5\n"
    ),
    # stacked agents + $ anchor + literal-underscore pattern +
    # empty Disallow (carries no rule)
    # the * group carries a Crawl-delay databot must NOT inherit —
    # databot's own group exists (group selection precedes delay
    # lookup), so databot's delay is the default
    "h2.example.com": (
        "User-agent: databot\n"
        "User-agent: otherbot\n"
        "Disallow: /*.png$\n"
        "Disallow: /*_*\n"
        "User-agent: *\n"
        "Disallow:\n"
        "Crawl-delay: 9\n"
        "Sitemap: http://h2.example.com/sitemap.xml\n"
    ),
    # h3.example.com has no robots.txt at all -> everything allowed
    # $ anchor negative: the query string defeats the end anchor
    # malformed delay value must be ignored by the try-cast consumer;
    # the valid 10 survives (max of valid lines)
    "h4.example.com": (
        "Sitemap: http://h4.example.com/sitemap.xml\n"
        "User-agent: *\n"
        "Disallow: /cgi-bin*\n"
        "Allow: /cgi-bin/run$\n"
        "Crawl-delay: fast\n"
        "Crawl-delay: 10\n"
    ),
    # r12 (ADVICE r11): explicit EMPTY group for the specific agent —
    # RFC 9309 §2.2.1 allow-everything — must beat the blanket *
    # disallow (group existence via the 'group' sentinel)
    "h5.example.com": (
        "User-agent: *\n"
        "Disallow: /\n"
        "User-agent: databot\n"
        "Disallow:\n"
        "Sitemap: http://h5.example.com/sitemap.xml\n"
    ),
}


def fixture_rule_rows() -> list[tuple[str, str, str, str]]:
    """(host, agent, rule, pattern) rows via the LOCAL reference
    parser — the VALUES side of both gate oracles."""
    return [
        (host, agent, rule, pattern)
        for host, text in sorted(ROBOTS_FIXTURE_TEXTS.items())
        for agent, rule, pattern in parse_robots_text(text)
    ]


def synthesize_robots(spark) -> DataFrame:
    rows = sorted(ROBOTS_FIXTURE_TEXTS.items())
    return spark.createDataFrame(rows, ["host", "robots_txt"])


def with_capture_paths(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, host, path) captures: host cycles six
    fixture hosts (h3 has no robots.txt; h5 has the empty-group
    override), path cycles six shapes (public/private/ok/tmp/
    query-string/underscore-png) so every rule family sees matching
    and non-matching traffic."""
    did = F.col("doc_id")
    host = F.concat(
        F.lit("h"), (did % 6).cast("string"), F.lit(".example.com")
    )
    ds = did.cast("string")
    # path shape keyed on the NEXT senary digit (doc_id div 6) so
    # host and shape stay decorrelated — every host sees every shape
    pk = F.expr("(doc_id div 6) % 6")
    path = (
        F.when(pk == 0, F.concat(F.lit("/public/doc/"), ds))
        .when(pk == 1, F.concat(F.lit("/private/doc/"), ds))
        .when(pk == 2, F.concat(F.lit("/private/ok/"), ds))
        .when(pk == 3, F.concat(F.lit("/tmp/"), ds, F.lit(".html")))
        .when(pk == 4, F.concat(F.lit("/cgi-bin/run?q="), ds))
        .otherwise(F.concat(F.lit("/public/img_"), ds, F.lit(".png")))
    )
    return docs.select(
        "doc_id", host.alias("host"), path.alias("path")
    )


def sql_capture_paths(table: str = "documents") -> str:
    """DuckDB twin of with_capture_paths."""
    return f"""
        SELECT doc_id,
               'h' || CAST(doc_id % 6 AS VARCHAR) || '.example.com'
                   AS host,
               CASE (doc_id // 6) % 6
                   WHEN 0 THEN '/public/doc/' || CAST(doc_id AS VARCHAR)
                   WHEN 1 THEN '/private/doc/' || CAST(doc_id AS VARCHAR)
                   WHEN 2 THEN '/private/ok/' || CAST(doc_id AS VARCHAR)
                   WHEN 3 THEN '/tmp/' || CAST(doc_id AS VARCHAR)
                        || '.html'
                   WHEN 4 THEN '/cgi-bin/run?q=' || CAST(doc_id AS VARCHAR)
                   ELSE '/public/img_' || CAST(doc_id AS VARCHAR)
                        || '.png'
               END AS path
        FROM {table}"""
