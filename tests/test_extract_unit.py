"""Unit tests of the pure extraction kernel (the oracle itself).

Mirrors the reference's golden-content test strategy
(/root/reference/tests/test_1-url-all-outputs.py:74-127) with exact
assertions instead of prefixes — the kernel is deterministic, so we can
pin full behavior.
"""

import random

from webextract import pdfmini
from webextract.chunk import chunk_blocks_from_spans
from webextract.dom import parse_blocks, collapse_ws
from webextract.extract import (extract_document, select_main,
                                serialize_md, serialize_doctags,
                                serialize_html, serialize_json)
from webextract.options import DEFAULT_OPTIONS
from webextract.synth import gen_page


PAGE = b"""<!DOCTYPE html><html><head><title>t</title>
<script>var x = "<p>not content</p>";</script><style>p{color:red}</style></head>
<body>
<header><nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li>
<li><a href="/c">Contact</a></li><li><a href="/d">Docs</a></li></ul></nav></header>
<div class="cookie">We use cookies <a href="/ok">Accept</a></div>
<div id="page">
 <aside><ul><li><a href="/1">rel one</a></li><li><a href="/2">rel two</a></li>
 <li><a href="/3">rel three</a></li><li><a href="/4">rel four</a></li></ul></aside>
 <article>
  <h1>Deep   Learning &amp; Systems</h1>
  <p>First paragraph with an &#x2014; em dash and
     messy    whitespace that must collapse to single spaces exactly once.</p>
  <h2>Methods</h2>
  <p>Second paragraph has <b>bold</b> and <i>italics</i> and a
     <a href="/x">link inside</a> which stays because density is low here.</p>
  <ul><li>alpha item</li><li>beta item</li></ul>
  <ol><li>first ordered</li><li>second ordered</li></ol>
  <table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>
  <pre><code>def f(x):
    return x + 1</code></pre>
  <blockquote>quoted wisdom here</blockquote>
 </article>
</div>
<footer><ul><li><a href="/tos">Terms</a></li><li><a href="/p">Privacy</a></li></ul></footer>
</body></html>"""


def test_boilerplate_stripped_and_content_kept():
    r = extract_document(PAGE)
    assert r.status == "success"
    t = r.text
    assert "Deep Learning & Systems" in t          # entity decoded, ws collapsed
    assert "— em dash" in t.replace("  ", " ")
    assert "collapse to single spaces exactly once" in t
    assert "alpha item" in t and "second ordered" in t
    assert "quoted wisdom here" in t
    assert "def f(x):\n    return x + 1" in t      # code keeps raw whitespace
    # boilerplate gone
    for bad in ("Home", "cookies", "rel one", "Terms", "not content",
                "color:red"):
        assert bad not in t, bad


def test_whitespace_and_entity_normalization():
    blocks = parse_blocks(b"<body><article><p>a&amp;b   c\n\nd &#65; e</p></article></body>")
    assert blocks[0].text == "a&b c d A e"
    assert collapse_ws("  a \t b\n\nc ") == "a b c"


def test_markdown_serialization():
    r = extract_document(PAGE)
    md = r.text_md
    assert "# Deep Learning & Systems" in md
    assert "## Methods" in md
    assert "- alpha item\n- beta item" in md
    assert "1. first ordered\n2. second ordered" in md
    assert "| h1 | h2 |\n|---|---|\n| a | b |" in md
    assert "```\ndef f(x):\n    return x + 1\n```" in md
    assert "> quoted wisdom here" in md


def test_spans_offsets_are_exact():
    r = extract_document(PAGE)
    for (s, e, kind, path) in r.spans:
        seg = r.text[s:e]
        assert seg and "\n\n" not in seg or kind in ("code", "table", "quote")
    (s0, e0, k0, _) = r.spans[0]
    assert r.text[s0:e0] == "Deep Learning & Systems" and k0 == "heading"


def test_other_serializers():
    main = select_main(parse_blocks(PAGE), DEFAULT_OPTIONS)
    dt = serialize_doctags(main)
    assert dt.startswith("<doctag><section_header><loc_0>")
    assert dt.endswith("</doctag>")
    html = serialize_html(main)
    assert html.startswith("<!DOCTYPE html>\n<html>\n<head>")
    assert "<h1>Deep Learning &amp; Systems</h1>" in html
    js = serialize_json(main, "u")
    assert '"schema_name":"WebExtractDocument"' in js


def test_malformed_html_recovers():
    page = b"<body><article><h1>Title here now</h1><p>unclosed para one with enough words to count<p>second para also has plenty of words in it</article>"
    r = extract_document(page)
    assert r.status == "success"
    assert "unclosed para one" in r.text and "second para also" in r.text


def test_empty_and_oversize_and_format_admission():
    assert extract_document(b"").status == "skipped"
    assert extract_document(b"<body></body>").status == "skipped"
    opt = DEFAULT_OPTIONS.with_(max_file_size=10)
    assert extract_document(PAGE, opt).status == "skipped"
    opt2 = DEFAULT_OPTIONS.with_(from_formats=("pdf",))
    assert extract_document(PAGE, opt2).status == "skipped"


def test_non_utf8_fallback():
    page = "<body><article><p>caf\xe9 latin one text with many words here</p></article></body>".encode("latin-1")
    r = extract_document(page)
    assert r.status == "success" and "café" in r.text


def test_pdf_roundtrip_and_reading_order():
    rng = random.Random(7)
    pages = [[(50, 30, 24, "Title Run"),
              (50, 100, 11, "left col first"), (50, 140, 11, "left col second"),
              (400, 103, 11, "right col first"), (400, 141, 11, "right col second")]]
    rng.shuffle(pages[0])
    payload = pdfmini.write_pdf(pages)
    r = extract_document(payload)
    assert r.fmt == "pdf" and r.status == "success"
    assert r.text == ("Title Run\n\nleft col first\n\nleft col second"
                      "\n\nright col first\n\nright col second")
    assert r.text_md.startswith("# Title Run")


def test_pdf_page_range():
    pages = [[(50, 30, 11, "page one text")], [(50, 30, 11, "page two text")]]
    payload = pdfmini.write_pdf(pages)
    opt = DEFAULT_OPTIONS.with_(page_range=(2, 2))
    assert extract_document(payload, opt).text == "page two text"


def test_chunkers():
    text = " ".join(f"w{i}" for i in range(600))
    spans = [{"start": 0, "end": len(text), "kind": "para", "path": "p"}]
    chunks = chunk_blocks_from_spans(text, spans, "hybrid", 256)
    assert [c.n_tokens for c in chunks] == [256, 256, 88]
    assert chunks[0].text.split()[0] == "w0"
    assert chunks[1].text.split()[0] == "w256"
    # merge_peers: small blocks merge under a heading
    t2 = "Head\n\naaa bbb\n\nccc ddd"
    sp2 = [{"start": 0, "end": 4, "kind": "heading", "path": "h"},
           {"start": 6, "end": 13, "kind": "para", "path": "p1"},
           {"start": 15, "end": 22, "kind": "para", "path": "p2"}]
    ch2 = chunk_blocks_from_spans(t2, sp2, "hybrid", 256)
    assert len(ch2) == 1 and ch2[0].text == "aaa bbb ccc ddd"
    assert ch2[0].heading == "Head"
    ch3 = chunk_blocks_from_spans(t2, sp2, "hierarchical", 256)
    assert len(ch3) == 2 and ch3[1].heading == "Head"


def test_chunker_merge_peers_false():
    t2 = "Head\n\naaa bbb\n\nccc ddd"
    sp2 = [{"start": 0, "end": 4, "kind": "heading", "path": "h"},
           {"start": 6, "end": 13, "kind": "para", "path": "p1"},
           {"start": 15, "end": 22, "kind": "para", "path": "p2"}]
    ch = chunk_blocks_from_spans(t2, sp2, "hybrid", 256, merge_peers=False)
    assert [c.text for c in ch] == ["aaa bbb", "ccc ddd"]
    assert all(c.heading == "Head" for c in ch)


def test_chunker_subword_measure():
    from webextract.chunk import subword_count

    # real greedy-merge counts: "theth" = the+th = 2; "ingestion" =
    # ing+est+ion = 3; "jazz" has no merge table pieces = 4 singles
    assert subword_count("theth") == 2
    assert subword_count("ingestion") == 3
    assert subword_count("jazz") == 4
    # "theth" words cost 2 each -> budget 10 fits 5 words
    text = " ".join("theth" for _ in range(12))
    spans = [{"start": 0, "end": len(text), "kind": "para", "path": "p"}]
    ch = chunk_blocks_from_spans(text, spans, "hybrid", 10,
                                 tokenizer="subword")
    assert [len(c.text.split()) for c in ch] == [5, 5, 2]
    assert [c.n_tokens for c in ch] == [10, 10, 4]
    # mixed costs: greedy maximal prefix under the budget
    text2 = "the q theth on"              # costs 1,1,2,1
    sp = [{"start": 0, "end": len(text2), "kind": "para", "path": "p"}]
    ch2 = chunk_blocks_from_spans(text2, sp, "hybrid", 3,
                                  tokenizer="subword")
    assert [c.text for c in ch2] == ["the q", "theth on"]
    assert [c.n_tokens for c in ch2] == [2, 3]
    # a single over-budget word still emits (never drops content)
    ch3 = chunk_blocks_from_spans("jazzjazzjazzjazz", [
        {"start": 0, "end": 16, "kind": "para", "path": "p"}], "hybrid", 3,
        tokenizer="subword")
    assert [c.text for c in ch3] == ["jazzjazzjazzjazz"]


def test_chunker_boundary_estimate_vs_tokenizer():
    """Round-4 verdict item 2's required boundary case: the old
    ceil(len/4) estimate and the real tokenizer disagree on where the
    chunk boundary falls.  'jazz' estimates 1 piece but tokenizes to 4
    singles — two such words fit one chunk under the estimate (2 <= 4)
    yet must split under real tokenization (4 + 4 > 4)."""
    text = "jazz jazz"
    est = sum(max(1, -(-len(w) // 4)) for w in text.split())
    assert est == 2                       # estimator would pack one chunk
    sp = [{"start": 0, "end": len(text), "kind": "para", "path": "p"}]
    ch = chunk_blocks_from_spans(text, sp, "hybrid", 4,
                                 tokenizer="subword")
    assert [c.text for c in ch] == ["jazz", "jazz"]
    assert [c.n_tokens for c in ch] == [4, 4]


def test_generator_determinism_and_coverage():
    a, b = gen_page(123), gen_page(123)
    assert a == b
    langs, fmts = set(), set()
    for i in range(300):
        p = gen_page(i)
        langs.add(p["lang"])
        fmts.add("pdf" if p["html"].startswith(b"%PDF") else "html")
    assert langs == {"en", "de", "fr", "es", "zh"}
    assert fmts == {"pdf", "html"}
    assert len(gen_page(9)["html"]) > 3_000_000  # pinned skew bomb


def test_parse_metadata_edges():
    """Head scanner: first occurrence wins, rel list matching,
    body-stop, non-UTF8 bytes, totality on garbage, and the 64 KiB
    head bound."""
    from webextract.dom import META_HEAD_LIMIT, parse_metadata
    t, d, r, og, canon, lang = parse_metadata(
        '<html lang="de"><head>'
        '<title> A &amp; B </title><title>decoy</title>'
        '<meta name="description" content="first">'
        '<meta name="description" content="second">'
        '<link rel="alternate canonical" href="/c">'
        '<link rel="canonical" href="/late">'
        '</head><body><meta name="robots" content="nope"></body>')
    assert (t, d, r, og, canon, lang) == (
        "A & B", "first", None, None, "/c", "de")
    # non-UTF8 bytes go through decode_html's fallback, never raise
    assert parse_metadata(
        b"<head><title>caf\xe9</title></head>")[0] == "caf\xe9"
    # totality on garbage
    assert parse_metadata(b"\x00\xff<not html") == (None,) * 6
    assert parse_metadata("") == (None,) * 6
    # title fully beyond the head bound is not parsed (hard cost cap)
    far = " " * (META_HEAD_LIMIT + 10) + "<title>deep</title></head>"
    assert parse_metadata(far)[0] is None
    # unclosed <title> at the cut still yields the buffered text
    open_t = "<head><title>kept going"
    assert parse_metadata(open_t)[0] == "kept going"


def test_metadata_to_canonical_dedup_composition(spark):
    """The head pass feeds declared-canonical dedup end-to-end: two
    mirror pages declaring one canonical collapse to the min-id
    survivor with declared=true; an undeclared page falls back to its
    (normalized) fetch url."""
    from pyspark.sql import functions as F

    from webextract.corpus import canonical_dedup
    from webextract.pipeline import metadata_df

    def page(i, canon):
        link = (f'<link rel="canonical" href="{canon}">' if canon else "")
        return (f"doc://{i}",
                f"<html><head><title>t{i}</title>{link}"
                f"</head><body><p>x</p></body></html>".encode())

    pages = spark.createDataFrame(
        [page(1, "https://c.example/one"),
         page(2, "https://c.example/one"),
         page(3, None)],
        "url string, html binary")
    meta = metadata_df(pages).withColumn(
        "doc_id", F.substring("url", 7, 20).cast("bigint"))
    rows = {r["canon_key"]: r
            for r in canonical_dedup(meta).collect()}
    grp = rows["https://c.example/one"]
    assert (grp["doc_id"], grp["n_variants"], grp["declared"]) == (1, 2, True)
    solo = rows["doc://3/"]   # fallback key is NORMALIZED (root slash)
    assert (solo["doc_id"], solo["n_variants"], solo["declared"]) == (
        3, 1, False)


def test_canonical_dedup_resolves_declared_href(spark):
    """Declared hrefs are resolved against the fetch url before keying:
    root-relative canonicals on different hosts must NOT merge,
    protocol-relative takes the fetch scheme, dot-relative forms are
    unresolvable and fall back to the fetch url, and declared keys are
    normalized into the same space as fallback keys."""
    from webextract.corpus import canonical_dedup
    rows = [
        (1, "https://a.example/x", "/page"),          # root-relative
        (2, "https://b.example/y", "/page"),          # other host
        (3, "https://c.example/z", "//cdn.example/v"),  # proto-relative
        (4, "https://d.example/w", "sub/page"),       # unresolvable
        (5, "https://e.example/q", "HTTP://A.example:80/x"),  # normalize
        (6, "http://a.example/x", None),              # fallback twin of 5
    ]
    meta = spark.createDataFrame(
        rows, "doc_id long, url string, canonical_url string")
    out = {r["doc_id"]: r for r in canonical_dedup(meta).collect()}
    # root-relative resolved per host: two separate declared groups
    assert out[1]["canon_key"] == "https://a.example/page"
    assert out[2]["canon_key"] == "https://b.example/page"
    assert out[1]["declared"] and out[2]["declared"]
    # protocol-relative takes the fetch scheme
    assert out[3]["canon_key"] == "https://cdn.example/v"
    # dot-relative: treated as undeclared, falls back to fetch url
    assert out[4]["canon_key"] == "https://d.example/w"
    assert out[4]["declared"] is False
    # declared key normalizes into the fallback key space: 5 and 6
    # form ONE group keyed 'http://a.example/x', min-id survivor 5
    assert 6 not in out
    assert (out[5]["canon_key"], out[5]["n_variants"]) == (
        "http://a.example/x", 2)


def test_jsonld_extract_semantics(spark):
    """Hand-pinned JSON-LD lift: document-ordered blocks, NULL fields
    on malformed JSON (block still counted), one all-NULL row for a
    no-block page, nested whitespace tolerated."""
    from webextract.corpus import jsonld_extract
    rows = [
        (0, '<html><head>'
            '<script type="application/ld+json">'
            '{"@type":"Article","name":"A0","datePublished":"2026-01-02"}'
            '</script>'
            '<script type="application/ld+json"> {"@type":"Product",'
            '"name":"P0"} </script></head></html>'),
        (1, '<html><head><script type="application/ld+json">'
            '{"@type":"Article","name":</script></head></html>'),
        (2, "<html><body>nothing structured</body></html>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = sorted(
        (tuple(r) for r in jsonld_extract(df).collect()))
    assert got == [
        (0, 0, "Article", "A0", "2026-01-02"),
        (0, 1, "Product", "P0", None),
        (1, 0, None, None, None),
        (2, None, None, None, None),
    ]
