"""RFC 9309 robots.txt parsing + longest-match admission.

Edge semantics pinned here; engine-exactness is the robots_filter
oracle gate's job."""

from __future__ import annotations

from pyspark.sql import functions as F

from webextract import corpus

BODY = """# comment line
User-agent: FooBot
Disallow: /foo

User-agent: WebExtract
User-agent: BarBot
Disallow: /private
Allow: /private/pub
disallow: /case
Disallow:

User-agent: *
Disallow: /
"""


def _robots(spark, body=BODY, host="a.example.com"):
    return spark.createDataFrame([(host, body)],
                                 "host string, robots_txt string")


def test_robots_rules_named_group(spark):
    """The agent's named group wins over `*`; consecutive UA lines
    share one group; lowercase field names parse; the EMPTY Disallow
    is dropped (RFC 9309: no restriction)."""
    rules = corpus.robots_rules(_robots(spark)).collect()
    got = sorted((r["allow"], r["prefix"]) for r in rules)
    assert got == [(False, "/case"), (False, "/private"),
                   (True, "/private/pub")]


def test_robots_rules_star_fallback(spark):
    """With no group naming the agent, the `*` group applies."""
    body = "User-agent: FooBot\nDisallow: /foo\n\n" \
           "User-agent: *\nDisallow: /all\n"
    rules = corpus.robots_rules(_robots(spark, body)).collect()
    assert [(r["allow"], r["prefix"]) for r in rules] == \
        [(False, "/all")]


def test_robots_filter_precedence(spark):
    """Longest prefix wins; Allow beats Disallow on a length tie;
    unmatched paths and hosts with no robots.txt are allowed."""
    body = ("User-agent: *\n"
            "Disallow: /a\n"
            "Allow: /a/pub\n"
            "Allow: /tie\n"
            "Disallow: /tie\n")
    pages = spark.createDataFrame(
        [(1, "http://a.example.com/a/x"),        # /a disallow
         (2, "http://a.example.com/a/pub/x"),    # longer allow wins
         (3, "http://a.example.com/tie/x"),      # tie -> allow
         (4, "http://a.example.com/other"),      # unmatched -> allowed
         (5, "http://norobots.example.com/a/x"), # no robots -> allowed
         ], "doc_id long, url string")
    out = {r["doc_id"]: r["blocked"]
           for r in corpus.robots_filter(
               pages, _robots(spark, body)).collect()}
    assert out == {1: True, 2: False, 3: False, 4: False, 5: False}


def test_robots_ua_value_case_insensitive(spark):
    """`User-agent: WEBEXTRACT` selects the named group (UA values
    compare case-insensitively; rule PREFIXES stay case-sensitive)."""
    body = ("User-agent: WEBEXTRACT\nDisallow: /x\n\n"
            "User-agent: *\nDisallow: /\n")
    pages = spark.createDataFrame(
        [(1, "http://a.example.com/y")], "doc_id long, url string")
    out = corpus.robots_filter(pages, _robots(spark, body)).collect()
    assert out[0]["blocked"] is False   # named group has only /x


def test_robots_filter_admission_has_no_window(spark):
    """Scale shape: the per-url precedence fold is a hash aggregate
    with map-side partial max (order-independent), never a sort-based
    window over the corpus."""
    pages = spark.createDataFrame(
        [(1, "http://a.example.com/a/x")], "doc_id long, url string")
    out = corpus.robots_filter(pages, _robots(spark))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "partial_max" in plan


def test_robots_blank_line_does_not_split_ua_group(spark):
    """RFC 9309 ABNF: group = startgroupline *(startgroupline /
    emptyline) *(rule / emptyline) — a blank (or comment-only, or
    unknown-field) line between consecutive User-agent lines stays
    INSIDE the group, so the named agent keeps the group's rules
    (round-4 review)."""
    body = ("User-agent: WebExtract\n"
            "\n"
            "# interleaved comment\n"
            "Sitemap: http://e.com/s.xml\n"
            "User-agent: OtherBot\n"
            "Disallow: /private\n\n"
            "User-agent: *\nAllow: /\n")
    rules = corpus.robots_rules(_robots(spark, body)).collect()
    assert [(r["allow"], r["prefix"]) for r in rules] == \
        [(False, "/private")]


def test_robots_wildcard_and_anchor(spark):
    """RFC 9309 §2.2.3 MUST-level special characters: '*' spans any
    octets, trailing '$' anchors end-of-path; regex metachars in
    rule paths stay literal; longest-PATTERN precedence includes
    wildcard rules."""
    body = ("User-agent: *\n"
            "Disallow: /*.zip$\n"
            "Allow: /dl/*.zip$\n"
            "Disallow: /lit.x\n")
    pages = spark.createDataFrame(
        [(1, "http://a.example.com/x.zip"),        # wildcard hit
         (2, "http://a.example.com/x.zip.html"),   # $ anchors -> miss
         (3, "http://a.example.com/dl/y.zip"),     # longer allow wins
         (4, "http://a.example.com/litAx"),        # '.' stays literal
         ], "doc_id long, url string")
    out = {r["doc_id"]: r["blocked"] for r in
           corpus.robots_filter(pages, _robots(spark, body)).collect()}
    assert out == {1: True, 2: False, 3: False, 4: False}


def test_robots_crlf_body(spark):
    """HTTP-served robots bodies are CRLF: values must not carry a
    trailing carriage return (round-4 review — Java and RE2 disagree
    on '.' vs \\r, so the parse strips \\r up front)."""
    body = "User-agent: *\r\nDisallow: /private\r\n"
    rules = corpus.robots_rules(_robots(spark, body)).collect()
    assert [(r["allow"], r["prefix"]) for r in rules] == \
        [(False, "/private")]


def test_robots_sitemaps_extraction(spark):
    """Sitemap lines are group-INDEPENDENT (collected from inside or
    outside UA groups), field name case-insensitive, comment-only and
    value-less lines dropped, CRLF and padding trimmed, one row per
    occurrence."""
    body = ("Sitemap: http://a.com/top.xml\r\n"
            "User-agent: *\r\n"
            "Disallow: /private\n"
            "sitemap:   http://a.com/in-group.xml   \n"
            "# Sitemap: http://a.com/commented.xml\n"
            "Sitemap:\n"
            "SITEMAP: http://a.com/caps.xml\n")
    robots = spark.createDataFrame([("a.com", body), ("b.com", "ok\n")],
                                   "host string, robots_txt string")
    rows = sorted((r["host"], r["sitemap_url"])
                  for r in corpus.robots_sitemaps(robots).collect())
    assert rows == [("a.com", "http://a.com/caps.xml"),
                    ("a.com", "http://a.com/in-group.xml"),
                    ("a.com", "http://a.com/top.xml")]


def test_parse_feeds_hand_reference(spark):
    """RSS element-text vs Atom non-self-href link rules, entity
    decode amp-last, empty-link drop, NULL title/date."""
    rss = ('<rss version="2.0"><channel><title>C</title>'
           '<item><title> A &amp;&amp;lt; t </title>'
           '<link> http://a.example/p?x=1&amp;y=2 </link>'
           '<pubDate>Mon, 05 Jan 2026 00:00:00 GMT</pubDate></item>'
           '<item><link>http://a.example/q</link></item>'
           '<item><title>drop</title><link> </link></item>'
           '</channel></rss>')
    atom = ('<feed><title>F</title>'
            '<entry><title>E1</title>'
            '<link rel="self" href="http://b.example/feed.xml"/>'
            '<link rel="alternate" href="http://b.example/e?a=1&amp;b=2"/>'
            '<updated>2026-02-03T00:00:00Z</updated></entry>'
            '<entry><link rel="self" href="http://b.example/feed.xml"/>'
            '</entry></feed>')
    df = spark.createDataFrame(
        [("a.example", rss), ("b.example", atom)],
        "host string, feed_xml string")
    got = sorted(tuple(r) for r in corpus.parse_feeds(df).collect())
    assert got == [
        # &amp;&amp;lt; decodes amp-LAST to '&&lt;', never '<'
        ("a.example", "rss", "http://a.example/p?x=1&y=2",
         "A &&lt; t", "Mon, 05 Jan 2026 00:00:00 GMT"),
        ("a.example", "rss", "http://a.example/q", None, None),
        ("b.example", "atom", "http://b.example/e?a=1&b=2",
         "E1", "2026-02-03T00:00:00Z"),
    ]


def test_crawl_delay_named_group_wins(spark):
    """The agent's named group supplies the delay even when `*`
    carries one; decimal seconds land exactly (1.25 s = 1250 ms);
    field and value case are both insensitive."""
    body = ("User-Agent: WebExtract\nCrawl-delay: 1.25\n"
            "Disallow: /x\n\n"
            "User-agent: *\nCrawl-delay: 9\n")
    out = corpus.robots_crawl_delay(_robots(spark, body)).collect()
    assert [(r["host"], r["delay_ms"]) for r in out] == \
        [("a.example.com", 1250)]


def test_crawl_delay_invalid_line_dropped_first_valid_wins(spark):
    """A malformed value drops the LINE only; among the valid lines
    of the chosen group the FIRST wins (lowest line_no)."""
    body = ("User-agent: *\nCrawl-delay: fast\n"
            "crawl-delay: 2.5\r\nCrawl-delay: 1\n")
    out = corpus.robots_crawl_delay(_robots(spark, body)).collect()
    assert [(r["host"], r["delay_ms"]) for r in out] == \
        [("a.example.com", 2500)]


def test_crawl_delay_foreign_group_ignored(spark):
    """A delay in a group that does not apply to the agent yields no
    row — the consumer's default applies, not another bot's ask."""
    body = ("User-agent: otherbot\nCrawl-delay: 7\n\n"
            "User-agent: *\nDisallow: /x\n")
    assert corpus.robots_crawl_delay(_robots(spark, body)).count() == 0


def test_fetch_plan_hand_reference(spark):
    """Domain queue slots × per-HOST delays: site1.com's three hosts
    share ONE budget queue (shallow-first, url tiebreak) but each
    host dispatches at its own robots interval; hosts without a
    directive run at the 1000 ms default; slot 4 drops at budget 3."""
    pages = spark.createDataFrame(
        [(1, "http://www.site1.com/a"), (2, "http://site1.com/"),
         (3, "http://cdn.site1.com/x/y"), (4, "http://site1.com/b/c/d"),
         (5, "http://other.org/p")],
        "doc_id long, url string")
    robots = spark.createDataFrame(
        [("www.site1.com", "User-agent: *\nCrawl-delay: 2\n")],
        "host string, robots_txt string")
    got = sorted(tuple(r) for r in
                 corpus.fetch_plan(pages, robots, budget=3).collect())
    assert got == [
        ("http://cdn.site1.com/x/y", "site1.com", "cdn.site1.com",
         2, 3, 1000, 2000),
        ("http://other.org/p", "other.org", "other.org", 1, 1, 1000, 0),
        ("http://site1.com/", "site1.com", "site1.com", 1, 1, 1000, 0),
        ("http://www.site1.com/a", "site1.com", "www.site1.com",
         1, 2, 2000, 2000),
    ]
