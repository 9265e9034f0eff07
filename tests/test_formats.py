"""Unit tests for the 15-format sniffer + the non-HTML parsers
(webextract/formats.py).  Reference format enum:
/root/reference/docs/usage.md:14; round-1 review required unknown
payloads to SKIP instead of parsing as HTML."""

from __future__ import annotations

import io
import zipfile

from hypothesis import given, settings, strategies as st

from webextract.extract import extract_document
from webextract.formats import (parse_csv_blocks, parse_md_blocks,
                                parse_vtt_blocks, sniff)
from webextract.options import DEFAULT_OPTIONS


def _zip(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, content in parts.items():
            z.writestr(name, content)
    return buf.getvalue()


SNIFF_CASES = [
    (b"%PDF-1.4 ...", "pdf"),
    (b"%PDF-MINI\n\x00\x00", "pdf"),
    (b"<!DOCTYPE html><html></html>", "html"),
    (b"  \n <html><body>x</body>", "html"),
    (b"plain prose with no markup at all", "html"),
    (b"# Heading\n\ntext", "md"),
    (b"= Title\n\ntext", "asciidoc"),
    (b"WEBVTT\n\n00:00:00.000 --> 00:00:01.000\nhi", "vtt"),
    (b"a,b,c\n1,2,3\n", "csv"),
    (b'{"schema_name":"WebExtractDocument","blocks":[]}', "json_docling"),
    (b"\x89PNG\r\n\x1a\nxxxx", "image"),
    (b"\xff\xd8\xff\xe0JFIF", "image"),
    (b"GIF89a\x01\x00", "image"),
    (b"RIFF\x00\x00\x00\x00WEBPVP8", "image"),
    (b"ID3\x04\x00tag", "audio"),
    (b"OggS\x00\x02", "audio"),
    (b"RIFF\x00\x00\x00\x00WAVEfmt", "audio"),
    (b'<?xml version="1.0"?><article><front/></article>', "xml_jats"),
    (b'<?xml version="1.0"?><us-patent-grant/>', "xml_uspto"),
    (b'<?xml version="1.0"?><mets xmlns="m"/>', "mets_gbs"),
    (b"\x00\x01\x02\x03junk", "unknown"),
    (b"PK\x03\x04 plain zip no parts", "unknown"),
]


def test_sniff_matrix():
    for payload, want in SNIFF_CASES:
        assert sniff(payload) == want, (payload[:20], sniff(payload), want)


def test_sniff_ooxml():
    assert sniff(_zip({"word/document.xml": "<w:document/>"})) == "docx"
    assert sniff(_zip({"ppt/slides/slide1.xml": "<p:sld/>"})) == "pptx"
    assert sniff(_zip({"xl/worksheets/sheet1.xml": "<ws/>"})) == "xlsx"


def test_md_parser_structure():
    bs = parse_md_blocks(
        "# T\n\npara one\nsame para\n\n- a\n- b\n\n1. c\n\n"
        "```\ncode  here\n```\n\n> q1\n> q2\n\n| h1 | h2 |\n|---|---|\n"
        "| x | y |\n\n![alt](img.png)\n")
    kinds = [(b.kind, b.text) for b in bs]
    assert kinds == [
        ("heading", "T"), ("para", "para one same para"),
        ("list_item", "a"), ("list_item", "b"), ("list_item", "c"),
        ("code", "code  here"), ("quote", "q1 q2"),
        ("table", "h1 | h2\nx | y"), ("image", "")]
    assert bs[0].heading_level == 1
    assert bs[4].li_index == 1
    assert bs[7].cells == (("h1", "h2"), ("x", "y"))
    assert bs[8].src == "img.png"


def test_md_roundtrip_through_serializer():
    """md source -> blocks -> serialize_md must reproduce the source
    (heading + paragraph shape)."""
    src = b"# Document 7\n\nsome plain words here\n"
    r = extract_document(src)
    assert r.status == "success" and r.fmt == "md"
    assert r.text_md.encode() + b"\n" == src


def test_csv_quoting_roundtrip():
    bs = parse_csv_blocks('a,"b,with comma",c\n"say ""hi""",2,3\n')
    assert bs[0].cells == (("a", "b,with comma", "c"),
                           ('say "hi"', "2", "3"))


def test_vtt_strips_ids_and_timestamps():
    bs = parse_vtt_blocks(
        "WEBVTT\n\nNOTE a comment\n\ncue-1\n00:00:00.000 --> 00:00:01.000\n"
        "first line\nsecond line\n\n00:00:01.000 --> 00:00:02.000\nbare cue\n")
    assert [b.text for b in bs] == ["first line second line", "bare cue"]


def test_docx_heading_and_runs():
    payload = _zip({"word/document.xml":
                    '<w:document><w:body>'
                    '<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr>'
                    '<w:r><w:t>Head</w:t></w:r></w:p>'
                    '<w:p><w:r><w:t>a </w:t></w:r><w:r><w:t>b</w:t></w:r>'
                    '</w:p></w:body></w:document>'})
    r = extract_document(payload)
    assert r.fmt == "docx" and r.text == "Head\n\na b"
    assert r.text_md == "## Head\n\na b"


def test_xlsx_shared_strings():
    payload = _zip({
        "xl/sharedStrings.xml":
            "<sst><si><t>alpha</t></si><si><t>beta</t></si></sst>",
        "xl/worksheets/sheet1.xml":
            '<worksheet><sheetData>'
            '<row r="1"><c t="s"><v>0</v></c><c><v>42</v></c></row>'
            '<row r="2"><c t="s"><v>1</v></c><c><v>7</v></c></row>'
            '</sheetData></worksheet>'})
    r = extract_document(payload)
    assert r.fmt == "xlsx" and r.text == "alpha | 42\nbeta | 7"


def test_unknown_skips_not_mangles():
    r = extract_document(b"\x00\xde\xad" * 30)
    assert r.status == "skipped" and r.fmt == "unknown"
    assert r.text == ""


def test_media_formats_route_away_from_text_kernel():
    r = extract_document(b"\x89PNG\r\n\x1a\n" + b"z" * 64)
    assert r.status == "skipped" and r.fmt == "image"
    r = extract_document(b"ID3\x04\x00" + b"z" * 64)
    assert r.status == "skipped" and r.fmt == "audio"


def test_from_formats_admission_still_filters():
    opt = DEFAULT_OPTIONS.with_(from_formats=("html", "pdf"))
    r = extract_document(b"# Heading\n\nbody", opt)
    assert r.status == "skipped" and r.fmt == "md"
    assert "not admitted" in r.error


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_sniff_total_and_extract_total(payload):
    fmt = sniff(payload)
    assert isinstance(fmt, str)
    r = extract_document(payload)
    assert r.status in ("success", "skipped", "failure")


def test_jats_parser_structure():
    from webextract.formats import parse_xml_jats_blocks
    xml = ('<?xml version="1.0"?>'
           '<article xmlns="https://jats.nlm.nih.gov">'
           '<front><article-meta><title-group>'
           '<article-title>Deep &amp; Wide</article-title></title-group>'
           '<abstract><p>the abstract text</p></abstract>'
           '</article-meta></front>'
           '<body><sec><title>Methods</title><p>body para one</p>'
           '<p>body para two</p></sec></body></article>')
    blocks = parse_xml_jats_blocks(xml)
    assert [(b.kind, b.text) for b in blocks] == [
        ("heading", "Deep & Wide"), ("para", "the abstract text"),
        ("heading", "Methods"), ("para", "body para one"),
        ("para", "body para two")]
    assert blocks[0].heading_level == 1 and blocks[2].heading_level == 2


def test_uspto_parser_structure():
    from webextract.formats import parse_xml_uspto_blocks
    xml = ('<us-patent-grant><invention-title>Widget</invention-title>'
           '<abstract><p>a widget</p></abstract>'
           '<claims><claim><claim-text>1. A widget comprising'
           '</claim-text></claim></claims></us-patent-grant>')
    blocks = parse_xml_uspto_blocks(xml)
    assert [(b.kind, b.text) for b in blocks] == [
        ("heading", "Widget"), ("para", "a widget"),
        ("para", "1. A widget comprising")]


def test_mets_parser_structure():
    from webextract.formats import parse_mets_gbs_blocks
    xml = ('<mets xmlns="http://www.loc.gov/METS/"><dmdSec><mdWrap>'
           '<xmlData><mods><titleInfo><title>Scanned Book</title>'
           '</titleInfo><abstract>about the book</abstract></mods>'
           '</xmlData></mdWrap></dmdSec></mets>')
    blocks = parse_mets_gbs_blocks(xml)
    assert [(b.kind, b.text) for b in blocks] == [
        ("heading", "Scanned Book"), ("para", "about the book")]


def test_xml_parsers_reject_wrong_roots():
    import pytest
    from webextract.formats import (parse_mets_gbs_blocks,
                                    parse_xml_jats_blocks,
                                    parse_xml_uspto_blocks)
    for fn in (parse_xml_jats_blocks, parse_xml_uspto_blocks,
               parse_mets_gbs_blocks):
        with pytest.raises(Exception):
            fn("<other>doc</other>")
    # malformed XML becomes status=failure through the kernel wrapper
    r = extract_document(b'<?xml version="1.0"?><article><unclosed</article>')
    assert r.status == "failure"


def test_rich_blocks_page_roundtrip():
    """C6/C8 gate anatomy: code, quote, ul, ol, table and trailing para
    survive boilerplate stripping byte-exactly (non-Spark twin of the
    extract_rich_blocks oracle gate)."""
    from webextract.docpages import build_rich_page
    txt = "aa bb cc dd ee ff gg hh ii jj kk ll"
    r = extract_document(build_rich_page(3, txt))
    assert r.status == "success"
    assert r.text == ("Document 3\n\naa bb\n\ncc dd\n\nee ff\n\ngg hh\n\n"
                      "ii | jj\n\nkk ll")
    assert r.text_md == ("# Document 3\n\n```\naa bb\n```\n\n> cc dd\n\n"
                         "- ee ff\n1. gg hh\n\n| ii | jj |\n|---|---|\n\n"
                         "kk ll")
    assert [s[2] for s in r.spans] == ["heading", "code", "quote",
                                       "list_item", "list_item", "table",
                                       "para"]


def test_review_regressions_sniff():
    """Round-2 review findings: XHTML with <article> is html, BOM'd
    WEBVTT is vtt, comma-bearing prose is NOT csv."""
    xhtml = (b'<?xml version="1.0"?><!DOCTYPE html><html xmlns="x">'
             b'<body><article><p>page body content</p></article>'
             b'</body></html>')
    assert sniff(xhtml) == "html"
    assert extract_document(xhtml).status == "success"
    bom_vtt = ("﻿WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n"
               "hello subtitle line\n").encode("utf-8")
    assert sniff(bom_vtt) == "vtt"
    r = extract_document(bom_vtt)
    assert r.status == "success" and "-->" not in r.text \
        and "WEBVTT" not in r.text
    prose = b"Hello there, dear reader\nWelcome back, old friend\n"
    assert sniff(prose) != "csv"
    # real csv still sniffs, including a ragged last row
    assert sniff(b"a,b,c\n1,2,3\n4,5\n") == "csv"
    assert sniff(b"a,b,c\n1,2,3\n") == "csv"


def test_two_column_csv_still_sniffs():
    assert sniff(b"name,age\nalice,30\nbob,25\n") == "csv"
    # prose couplet with one comma per line: still NOT csv
    assert sniff(b"Hello there, dear reader\nWelcome back, old friend\n") \
        != "csv"


def test_binary_junk_guard_precedes_text_sniffing():
    """ADVICE r2 (low): NUL/control-byte junk must sniff 'unknown' even
    when it contains commas ('csv'-shaped) or '<' ('html'-shaped) —
    the guard runs before every text-format heuristic."""
    assert sniff(b"\x00a,b,c\nd,e,f\n") == "unknown"
    assert sniff(b"\x00<html><body>x</body></html>") == "unknown"
    assert sniff(b"\x00# heading\n") == "unknown"
    assert sniff(b"\x00= title\n") == "unknown"
    assert sniff(b"\x00{\"schema_name\": \"x\"}") == "unknown"
    # high-control-ratio junk with csv shape
    assert sniff(b"\x01\x02\x03\x04\x05\x06,a\n\x01\x02\x03\x04\x05\x06,b\n"
                 ) == "unknown"
    # NUL-free real text formats are untouched
    assert sniff(b"a,b,c\n1,2,3\n") == "csv"
    assert sniff(b"# heading\n\nbody\n") == "md"


def test_mets_embedded_alto():
    """Embedded ALTO TextBlocks parse as paragraphs; metadata-only
    packages keep the subset behavior (r2 item 6)."""
    from webextract.formats import parse_mets_gbs_blocks
    m = ('<mets xmlns="http://www.loc.gov/METS/"><dmdSec><mdWrap><xmlData>'
         '<mods><titleInfo><title>T</title></titleInfo></mods>'
         '</xmlData></mdWrap></dmdSec><dmdSec><mdWrap><xmlData>'
         '<alto xmlns="http://www.loc.gov/standards/alto/ns-v2#">'
         '<Layout><Page><PrintSpace>'
         '<TextBlock><TextLine><String CONTENT="hello"/>'
         '<String CONTENT="world"/></TextLine></TextBlock>'
         '<TextBlock><TextLine><String CONTENT="again"/></TextLine>'
         '</TextBlock></PrintSpace></Page></Layout></alto>'
         '</xmlData></mdWrap></dmdSec></mets>')
    blocks = parse_mets_gbs_blocks(m)
    assert [(b.kind, b.text) for b in blocks] == [
        ("heading", "T"), ("para", "hello world"), ("para", "again")]
    meta_only = ('<mets><dmdSec><mdWrap><xmlData><mods>'
                 '<titleInfo><title>T</title></titleInfo>'
                 '<abstract>a b</abstract></mods>'
                 '</xmlData></mdWrap></dmdSec></mets>')
    assert [(b.kind, b.text) for b in parse_mets_gbs_blocks(meta_only)] == [
        ("heading", "T"), ("para", "a b")]
