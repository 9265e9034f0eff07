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
                       "<ol><li>", "</b>", "<table><tr><td>x</td>"]))


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
