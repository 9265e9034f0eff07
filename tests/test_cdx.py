"""CDXJ capture-index parsing + latest-capture selection: line-shape
edge semantics (CRLF, malformed, blanks), NULL surfacing for absent
optional JSON fields, deterministic top-1 under same-second recaptures,
and the plan shapes (parse narrow, latest exactly one exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webextract.corpus import cdx_latest, cdx_revisit, parse_cdx

LINE_A = ('com,ex)/a 20260101000001 {"url": "https://ex.com/a", '
          '"status": "200", "mime": "text/html", "digest": "sha1:A1", '
          '"length": "512", "offset": "0", "filename": "f.warc.gz"}')
LINE_A2 = ('com,ex)/a 20260102000001 {"url": "https://ex.com/a", '
           '"status": "301", "digest": "sha1:A2"}')
LINE_B = 'com,ex)/b 20260101000002 {"url": "https://ex.com/b"}'


def _shard(spark, text):
    return spark.createDataFrame([("s0", text)],
                                 "shard string, cdx_text string")


def test_parse_cdx_fields_and_line_filter(spark):
    body = "\r\n".join([LINE_A, "", "# comment-ish junk",
                        "surtonly 2026", LINE_B, LINE_A2]) + "\r\n"
    rows = {(r["surt"], r["ts"]): r
            for r in parse_cdx(_shard(spark, body)).collect()}
    # malformed/blank lines dropped, CRLF never leaks into fields
    assert len(rows) == 3
    a = rows[("com,ex)/a", "20260101000001")]
    assert (a["url"], a["status"], a["mime"], a["digest"],
            a["length"], a["offset"], a["filename"]) == (
        "https://ex.com/a", 200, "text/html", "sha1:A1",
        512, 0, "f.warc.gz")
    b = rows[("com,ex)/b", "20260101000002")]
    assert b["url"] == "https://ex.com/b"
    assert (b["status"], b["mime"], b["digest"], b["length"],
            b["offset"], b["filename"]) == (None,) * 6
    a2 = rows[("com,ex)/a", "20260102000001")]
    assert a2["status"] == 301 and a2["mime"] is None


def test_cdx_latest_picks_max_ts_and_counts(spark):
    body = "\n".join([LINE_A, LINE_A2, LINE_B])
    out = {r["surt"]: r
           for r in cdx_latest(parse_cdx(_shard(spark, body))).collect()}
    assert out["com,ex)/a"]["ts"] == "20260102000001"
    assert out["com,ex)/a"]["digest"] == "sha1:A2"
    assert out["com,ex)/a"]["n_captures"] == 2
    assert out["com,ex)/b"]["n_captures"] == 1


def test_cdx_latest_same_second_tiebreak(spark):
    """Two captures in the same second: the digest tie-break must make
    the winner deterministic regardless of input order."""
    ln1 = 'com,ex)/t 20260101000009 {"url": "u1", "digest": "sha1:X"}'
    ln2 = 'com,ex)/t 20260101000009 {"url": "u2", "digest": "sha1:B"}'
    for body in (ln1 + "\n" + ln2, ln2 + "\n" + ln1):
        out = cdx_latest(parse_cdx(_shard(spark, body))).collect()
        assert len(out) == 1
        assert out[0]["digest"] == "sha1:B" and out[0]["url"] == "u2"


def test_cdx_latest_null_digest_tiebreak(spark):
    """digest is an OPTIONAL field: same-second captures where one or
    both digests are NULL must still pick a deterministic winner —
    NULLS LAST (the SQL engines' default, NOT Spark's ascending
    default), with url totalizing the order when digests tie."""
    with_d = 'com,ex)/n 20260101000009 {"url": "ud", "digest": "sha1:Z"}'
    no_d = 'com,ex)/n 20260101000009 {"url": "un"}'
    for body in (with_d + "\n" + no_d, no_d + "\n" + with_d):
        out = cdx_latest(parse_cdx(_shard(spark, body))).collect()
        assert len(out) == 1
        assert out[0]["digest"] == "sha1:Z"   # non-NULL beats NULL
    both = ('com,ex)/n 20260101000009 {"url": "u2"}\n'
            'com,ex)/n 20260101000009 {"url": "u1"}')
    out = cdx_latest(parse_cdx(_shard(spark, both))).collect()
    assert len(out) == 1 and out[0]["url"] == "u1"  # url totalizes


def _captures(spark, rows):
    return spark.createDataFrame(
        rows, "surt string, ts string, digest string")


def test_cdx_revisit_change_rates(spark):
    """Every change-rate branch: fully-changing key (10000 bp),
    never-changing key (0 bp), half-changing key (integer-exact
    partial rate), singleton (0 — no evidence), digestless captures
    (NULL digests carry no version evidence, never a negative rate),
    and a mixed key where NULL digests pad n_captures but not
    n_versions."""
    rows = [
        ("a", "20260101000000", "d1"), ("a", "20260102000000", "d2"),
        ("a", "20260103000000", "d3"),                # every visit new
        ("b", "20260101000000", "s"), ("b", "20260105000000", "s"),
        ("b", "20260109000000", "s"),                 # static
        ("c", "20260101000000", "x"), ("c", "20260102000000", "x"),
        ("c", "20260103000000", "y"),                 # 1 change / 2
        ("d", "20260101000000", "only"),              # singleton
        ("e", "20260101000000", None),
        ("e", "20260102000000", None),                # no digests
        ("f", "20260101000000", "v"),
        ("f", "20260102000000", None),                # mixed
    ]
    got = {r["surt"]: r for r in
           cdx_revisit(_captures(spark, rows)).collect()}
    def t(r):  # noqa: E306
        return (r["n_captures"], r["n_versions"],
                r["first_ts"], r["last_ts"], r["change_bp"])
    assert t(got["a"]) == (3, 3, "20260101000000", "20260103000000",
                           10000)
    assert t(got["b"]) == (3, 1, "20260101000000", "20260109000000", 0)
    assert t(got["c"]) == (3, 2, "20260101000000", "20260103000000",
                           5000)
    assert t(got["d"]) == (1, 1, "20260101000000", "20260101000000", 0)
    assert t(got["e"]) == (2, 0, "20260101000000", "20260102000000", 0)
    assert t(got["f"]) == (2, 1, "20260101000000", "20260102000000", 0)


def test_cdx_revisit_on_parsed_feed(spark):
    """Composes with parse_cdx: recrawled /p/ keys show full change
    (every synthetic capture has a fresh digest), one-shot keys 0."""
    body = "\n".join([LINE_A, LINE_A2, LINE_B])
    got = {r["surt"]: r for r in
           cdx_revisit(parse_cdx(_shard(spark, body))).collect()}
    a = got["com,ex)/a"]
    assert (a["n_captures"], a["n_versions"], a["change_bp"]) == (
        2, 2, 10000)
    assert got["com,ex)/b"]["change_bp"] == 0


def test_cdx_plan_shapes(spark):
    """parse_cdx is a pure narrow projection (zero exchanges — the
    shard is the parallelism unit); cdx_latest adds exactly ONE
    exchange for both window functions."""
    from tests.test_plans import _plan
    shard = _shard(spark, LINE_A + "\n" + LINE_A2)
    assert "Exchange" not in _plan(parse_cdx(shard))
    # formatted explain repeats each node in the details section —
    # count in the tree half only
    tree = _plan(cdx_latest(parse_cdx(shard))).split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    # revisit: two-level agg = exactly two exchanges, no Window/Expand
    rtree = _plan(cdx_revisit(parse_cdx(shard))).split("\n\n")[0]
    assert rtree.count("Exchange") == 2, rtree
    assert "Window" not in rtree and "Expand" not in rtree


# --- property-based parity: parse_cdx vs a pure-Python reference ----------

import json as _json
import re as _re

from hypothesis import given, settings, strategies as st

# re.ASCII pins \S/\d to Java's (ASCII-scoped) semantics — Python's
# default unicode-aware classes would admit lines (e.g. Arabic-Indic
# digit timestamps) the engine's Java regex rejects
_PAT = _re.compile(r"^(\S+) (\d{14}) (\{.*\})\s*$", _re.ASCII)
_FIELDS = ("url", "status", "mime", "digest", "length", "offset",
           "filename")
# the operator's portable admission rule: signed ASCII digits
# surrounded only by ASCII whitespace (bare try_cast diverges between
# engines on control chars / NBSP — see corpus._ascii_int)
_INT_RE = _re.compile(
    r"[ \t\n\x0B\f\r]*[+-]?[0-9]+[ \t\n\x0B\f\r]*", _re.ASCII)


def _ref_cast_int(v, bits=32):
    """corpus._ascii_int's semantics: admission-regex gate, then
    try_cast (which NULLs out-of-range values rather than aborting —
    the ANSI-mode job-kill this fuzz originally caught)."""
    if v is None or not _INT_RE.fullmatch(v):
        return None
    n = int(v)
    return n if -(1 << (bits - 1)) <= n < (1 << (bits - 1)) else None


def _ref_parse(shard, text):
    out = []
    for ln in text.replace("\r", "").split("\n"):
        if not _PAT.match(ln):
            continue
        surt, ts, j = ln.split(" ", 2)
        try:
            d = _json.loads(j)
        except ValueError:
            d = {}
        if not isinstance(d, dict):
            d = {}
        g = {k: (d.get(k) if isinstance(d.get(k), str) else None)
             for k in _FIELDS}
        out.append((shard, surt, ts, g["url"],
                    _ref_cast_int(g["status"], 32), g["mime"],
                    g["digest"], _ref_cast_int(g["length"], 64),
                    _ref_cast_int(g["offset"], 64),
                    g["filename"]))
    return out


# printable-ASCII surt (upstream SURTs are ASCII)
_surt = st.text(st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1, max_size=12)
_digits14 = st.text("0123456789", min_size=14, max_size=14)
_val = st.one_of(
    st.text(max_size=12),                  # any unicode (json-escaped)
    st.text("0123456789 +-", max_size=6))  # int-castable-ish strings


@st.composite
def _cdx_line(draw):
    kind = draw(st.integers(0, 9))
    if kind == 0:
        return draw(st.text(st.characters(blacklist_characters="\n\r"),
                            max_size=30))          # garbage line
    if kind == 1:
        return ""                                  # blank line
    surt, ts = draw(_surt), draw(_digits14)
    if kind == 2:
        return f"{surt} {ts[:13]} {{}}"            # short timestamp
    body = {k: draw(_val) for k in draw(st.sets(
        st.sampled_from(_FIELDS)))}
    j = _json.dumps(body)
    if kind == 3 and len(j) > 2:
        # corrupt the tail INSIDE the braces (drops the closing quote
        # of the last value) so the {...} line shape still admits it
        # but the JSON parser must reject it in both engines
        j = j[:-2] + "}"
    pad = " " * draw(st.integers(0, 2))
    return f"{surt} {ts} {j}{pad}"


@settings(max_examples=25, deadline=None)
@given(lines=st.lists(_cdx_line(), min_size=1, max_size=12))
def test_parse_cdx_matches_python_reference(spark, lines):
    """parse_cdx must agree with a line-by-line Python reference on
    garbage lines, blank lines, short timestamps, absent fields,
    unicode values, int-castable and garbage numerics, corrupted
    JSON, and trailing padding."""
    text = "\n".join(lines)
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    got = sorted((tuple(r) for r in parse_cdx(
        _shard(spark, text)).collect()), key=nullsafe)
    want = sorted(_ref_parse("s0", text), key=nullsafe)
    assert got == want


def test_surt_col_matches_surt_key(spark):
    """The Spark column SURT must equal the CDX writer's Python rule
    byte-for-byte on every tricky form — ports (default http/https,
    non-default, https-default-on-http), query strings, bare hosts,
    uppercase, and non-http passthrough."""
    from webextract.corpus import surt_col
    from webextract.sources import surt_key

    urls = [
        "http://Example.COM/Path?q=1",
        "http://example.com:80/x",
        "https://example.com:443/x",
        "http://example.com:443/x",      # 443 is NOT http's default
        "https://example.com:8443/a/b?z=2",
        "http://example.com",            # bare host gains '/'
        "http://a.b.example.co.uk/deep/path",
        "http://example.com/x#frag",     # fragment dropped
        "doc://opaque/thing",            # non-http passthrough
        "HTTPS://UPPER.example/MiXeD",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in
           df.select(surt_col(F.col("url"))).collect()]
    assert got == [surt_key(u) for u in urls]


def test_sitemap_recrawl_decision_table(spark):
    """Hand decision table: never-captured -> new; lastmod strictly
    newer than the capture -> modified; equal instant, older, absent
    and offset-form lastmods -> not emitted."""
    from webextract import corpus

    entries = spark.createDataFrame(
        [("h", "http://h.example/new", "2026-01-01", -1),
         ("h", "http://h.example/mod", "2026-03-02", 700000),
         ("h", "http://h.example/modz", "2026-03-01T10:00:00.5Z", -1),
         ("h", "http://h.example/equal", "2026-03-01", -1),
         ("h", "http://h.example/old", "2025-01-01", -1),
         ("h", "http://h.example/nolm", None, -1),
         ("h", "http://h.example/offset", "2026-03-02T01:00:00+02:00",
          -1)],
        "host string, url string, lastmod string, priority_micro long")
    latest = spark.createDataFrame(
        [("example,h)/mod", "20260301000000"),
         ("example,h)/modz", "20260301095959"),
         ("example,h)/equal", "20260301000000"),
         ("example,h)/old", "20260301000000"),
         ("example,h)/nolm", "20260301000000"),
         ("example,h)/offset", "20260301000000")],
        "surt string, ts string")
    got = sorted((r["url"], r["reason"], r["lastmod14"],
                  r["last_capture_ts"]) for r in
                 corpus.sitemap_recrawl(entries, latest).collect())
    assert got == [
        ("http://h.example/mod", "modified", "20260302000000",
         "20260301000000"),
        ("http://h.example/modz", "modified", "20260301100000",
         "20260301095959"),
        ("http://h.example/new", "new", "20260101000000", None),
    ]
