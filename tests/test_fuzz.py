"""Property-based robustness (SURVEY.md §5: hypothesis is available).

The extraction kernel must be TOTAL (never raises, always returns a
status) on arbitrary byte garbage, arbitrary HTML-ish text, and
truncated valid payloads; the fast tokenizer must agree with the
stdlib-parser reference on everything the generator can produce; and
serialization invariants (span offsets index into text) must hold."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from webextract.dom import parse_blocks
from webextract.extract import extract_document
from webextract.synth import gen_page

TAGS = ["p", "div", "li", "ul", "article", "nav", "table", "tr", "td",
        "h1", "h2", "pre", "blockquote", "a", "b", "img", "script"]

# structurally messy but tokenizable HTML: unclosed / mismatched /
# misnested tags, entities, comments, attributes.  Raw '<'/'>' inside
# text are excluded from the PARITY alphabet: on byte garbage
# html.parser's tolerant recovery is CPython implementation detail
# (e.g. '<a<p>' is swallowed but '<a/<p>' opens the tag) — the engine's
# contract there is totality (tests below), with the fast tokenizer as
# the defining semantics.
text_chunk = st.text(
    alphabet=st.characters(blacklist_characters="<>"), max_size=40)
html_chunk = st.one_of(
    text_chunk,
    st.sampled_from([f"<{t}>" for t in TAGS] + [f"</{t}>" for t in TAGS]
                    + ["&amp;", "&#x41;", "&bogus;", "<!-- c -->",
                       "<!doctype html>", "<p class='nav'>", '<img src="x">',
                       "<a href='/y'>", "<![CDATA[z]]>", "<?pi?>",
                       "<ol><li>", "</b>", "<table><tr><td>x</td>",
                       # startend + whitespace-end-tag + rawtext-close
                       # parity (round-4 review fixes)
                       "<script/>", "<a href=u/>", "<div/>", "<p/>",
                       "<br disabled/>", "<script src=/j/x/>",
                       "</ script>", "</ p>", "</SCRIPT>", "</STYLE >",
                       "</scripty>", "</script x>"]))


@settings(max_examples=200, deadline=None)
@given(st.lists(html_chunk, max_size=30).map("".join))
def test_parser_total_and_engines_agree(doc):
    fast = parse_blocks(doc, engine="fast")
    ref = parse_blocks(doc, engine="stdlib")
    assert fast == ref


def test_open_table_with_unterminated_skip_terminates():
    """Regression (found by fuzzing): an open <table> followed by an
    unterminated rawtext/skip element (<script>/<svg>/<style>) left
    skip>0 at EOF, and the finalize drain loop never terminated."""
    for doc in ("<table><script><ul><ul><pre>", "<table><svg><p>x",
                "<table><style>zzz", "<table><tr><td>x<script>y"):
        assert parse_blocks(doc, engine="fast") \
            == parse_blocks(doc, engine="stdlib")


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_extract_total_on_garbage(payload):
    r = extract_document(payload)
    assert r.status in ("success", "skipped", "failure")


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=200_000), st.integers(0, 3000))
def test_extract_total_on_truncated_pages(doc_id, cut):
    payload = gen_page(doc_id)["html"]
    r = extract_document(payload[:cut] if cut < len(payload) else payload)
    assert r.status in ("success", "skipped", "failure")


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=500_000))
def test_span_offsets_index_text(doc_id):
    r = extract_document(gen_page(doc_id)["html"])
    if r.status != "success":
        return
    for (s, e, kind, path) in r.spans:
        assert 0 <= s <= e <= len(r.text)
        seg = r.text[s:e]
        assert "\n\n" not in seg or kind == "code"


@settings(max_examples=200, deadline=None)
@given(st.lists(html_chunk, max_size=30).map("".join))
def test_seeded_split_parse_matches_one_shot(doc):
    """r3 html split tier: for ANY tokenizable document, cutting at
    every eligible tag and concatenating the seeded segment parses
    must reproduce the one-shot block list exactly (idx renumbered;
    a mid-feed raise stops both paths at the same point)."""
    from webextract.htmlsplit import _parse_seeded, scan_cuts
    want = parse_blocks(doc, engine="fast")
    try:
        cuts = scan_cuts(doc, 1)
    except Exception:
        cuts = []
    bounds = [(0, None)] + cuts + [(len(doc), None)]
    got = []
    for j in range(len(bounds) - 1):
        blocks, ok = _parse_seeded(doc[bounds[j][0]:bounds[j + 1][0]],
                                   bounds[j][1])
        got.extend(blocks)
        if not ok:
            break
    assert [(b.tag, b.kind, b.path, b.container_path, b.depth, b.text,
             b.link_chars, b.boiler, b.semantic, b.heading_level,
             b.li_index, b.cells, b.src) for b in got] \
        == [(b.tag, b.kind, b.path, b.container_path, b.depth, b.text,
             b.link_chars, b.boiler, b.semantic, b.heading_level,
             b.li_index, b.cells, b.src) for b in want]


# --- round-4 codec totality: decode paths never raise -----------------

@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_raster_decode_total_on_garbage(b):
    from webextract.media import decode_rgb, image_raster_stats, ocr_image
    for fn in (decode_rgb, image_raster_stats, ocr_image):
        fn(b)                       # totality is the whole contract —
        # no truthiness check: ocr_image legitimately returns '' for a
        # decodable all-blank glyph grid


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 600), st.integers(0, 7))
def test_jpeg_mutation_total(doc_id, pos, bit):
    """Single-bit corruption anywhere in a valid baseline JPEG either
    decodes (to the declared geometry) or returns None — never raises,
    never returns malformed rows."""
    from webextract.jpegmini import jpeg_decode_rgb
    from webextract.media import make_jpeg_raster_bytes
    b = bytearray(make_jpeg_raster_bytes(doc_id))
    b[pos % len(b)] ^= 1 << bit
    out = jpeg_decode_rgb(bytes(b))
    if out is not None:
        w, h, rows = out
        assert len(rows) == h and all(len(r) == 3 * w for r in rows)


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 400))
def test_png_truncation_total(doc_id, cut):
    """Every prefix of a valid PNG decodes to the full pixels or None —
    never an exception, never garbage pixels."""
    from webextract.media import make_png_bytes, png_decode_rgb
    b = make_png_bytes(doc_id)
    out = png_decode_rgb(b[:cut] if cut < len(b) else b)
    if cut >= len(b):
        assert out is not None
    # truncated: either None or (only when the cut is past all IDAT
    # bytes) the complete image — partial pixels are impossible because
    # zlib streams fail to decompress when cut
    if out is not None:
        w, h, rows = out
        assert len(rows) == h and all(len(r) == 3 * w for r in rows)


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 5000), st.binary(max_size=60), st.integers(0, 200))
def test_wav_pcm_mutation_total(doc_id, junk, cut):
    from webextract.media import (make_wav_pcm_bytes, parse_wav_pcm,
                                  wav_pcm_summary)
    b = make_wav_pcm_bytes(doc_id)
    for payload in (b[:cut], junk, b[:20] + junk + b[20:], junk + b):
        out = parse_wav_pcm(payload)       # must not raise
        if out is not None:
            rate, ch, nf, chans = out
            assert rate > 0 and len(chans) == ch
            assert all(len(c) == nf for c in chans)
        assert wav_pcm_summary(payload) is None or out is not None


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=30))
def test_subword_tokenizer_total_and_bounded(w):
    from webextract.chunk import subword_count
    if not w:
        return
    n = subword_count(w)
    assert 1 <= n <= len(w)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                        min_size=1, max_size=12),
                max_size=60),
       st.integers(1, 20),
       st.sampled_from(["word", "subword"]),
       st.booleans())
def test_chunker_partition_invariants(words, max_tokens, tokenizer,
                                      merge_peers):
    """Hybrid chunking is a PARTITION of the input: concatenating the
    chunks reproduces every word in order (nothing dropped or
    duplicated), every multi-word chunk respects the budget, and
    n_tokens equals the measure of the chunk's own words."""
    from webextract.chunk import chunk_blocks_from_spans, subword_count
    text = " ".join(words)
    spans = ([{"start": 0, "end": len(text), "kind": "para", "path": "p"}]
             if text else [])
    ch = chunk_blocks_from_spans(text, spans, "hybrid", max_tokens,
                                 tokenizer, merge_peers)
    got = [w for c in ch for w in c.text.split()]
    assert got == words
    for c in ch:
        toks = c.text.split()
        cost = (len(toks) if tokenizer == "word"
                else sum(subword_count(w) for w in toks))
        assert c.n_tokens == cost
        if len(toks) > 1:
            assert c.n_tokens <= max_tokens
