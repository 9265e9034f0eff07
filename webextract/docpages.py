"""Deterministic documents→pages adapter for the driver's testdata.

The driver's correctness gate runs queries over the testdata tables
(`documents` et al.).  The extraction engine's input is the
BASELINE.json input_hint page table `(url, warc_ts, html, text, lang)`,
so this module wraps each `documents` row into a boilerplate-laden HTML
page as a PURE function of (doc_id, text) — no RNG, no clock.  Because
`documents.text` is already whitespace-normalized and the wrapper
escapes/unescapes losslessly, the expected extraction output is exactly
expressible in SQL → the flagship extraction operators become
DuckDB-oracle-checkable end-to-end (boilerplate must vanish, main text
must survive byte-identically).

Page anatomy mirrors the synthetic corpus (synth.py): header/nav link
farm, cookie banner, aside link list, <article> main content, footer —
the parts the density scorer must strip.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

_LINKS = "".join(
    f'<li><a href="/l{i}">menu item {i} with label</a></li>' for i in range(8))
_HEADER = (f"<header><div>Example Site banner</div><nav><ul>{_LINKS}</ul>"
           "</nav></header>")
_COOKIE = ('<div class="cookie">We use cookies to improve your experience '
           '<a href="/accept">Accept</a> <a href="/reject">Reject</a></div>')
_ASIDE = f"<aside><h3>Related</h3><ul>{_LINKS}</ul></aside>"
_FOOTER = f"<footer><ul>{_LINKS}</ul></footer>"

# Parse-order block count of the constant boilerplate BEFORE the article
# (1 header banner + 8 nav links + 1 cookie div + 1 aside heading +
# 8 aside links).  The extract_json oracle (queries.py) derives the
# article's h1/p block indices from this — if the page anatomy above
# changes, this constant (and nothing else) must change with it.
N_BOILER_BLOCKS = 19


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_page(doc_id: int, text: str, para_tokens: int = 0,
               article_links: int = 0) -> bytes:
    """One Common-Crawl-style page wrapping `text` as the main content.
    para_tokens=0 → a single <p>; >0 → paragraphs of that many tokens
    (multi-block variant for span/chunk operators).  article_links>0
    appends that many per-doc IN-CONTENT anchors after the content
    (href/anchor derived from doc_id — the link-extraction gate's
    oracle-reproducible out-link signal, distinct from the constant
    boilerplate link farm)."""
    if para_tokens > 0:
        toks = text.split(" ")
        paras = ["<p>%s</p>" % _esc(" ".join(toks[i:i + para_tokens]))
                 for i in range(0, len(toks), para_tokens)]
        content = "".join(paras)
    else:
        content = f"<p>{_esc(text)}</p>"
    refs = "".join(
        f'<p>see <a href="/d{doc_id}x{j}">ref {doc_id} {j}</a></p>'
        for j in range(article_links))
    article = (f"<article><h1>Document {doc_id}</h1>{content}{refs}"
               "</article>")
    return (
        f"<!DOCTYPE html><html><head><title>Doc {doc_id}</title>"
        f"<script>var t={doc_id};</script><style>body{{margin:0}}</style></head>"
        f"<body>{_HEADER}{_COOKIE}"
        f'<div id="page">{_ASIDE}{article}</div>{_FOOTER}</body></html>'
    ).encode("utf-8")


def docs_to_pages(docs: DataFrame, para_tokens: int = 0,
                  empty_mod: int = 0, article_links: int = 0) -> DataFrame:
    """documents(doc_id, text, lang, ...) → input_hint page frame.

    empty_mod>0 injects empty payloads for doc_id % empty_mod == 3
    (admission/counter operators need skipped rows).  mapInArrow keeps
    the adapter vectorized and executor-side (north_rule: no per-row
    Python)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("doc_id").to_pylist()
            texts = b.column("text").to_pylist()
            langs = b.column("lang").to_pylist()
            html = [b"" if empty_mod and i % empty_mod == 3
                    else build_page(i, t, para_tokens, article_links)
                    for i, t in zip(ids, texts)]
            yield pa.RecordBatch.from_pydict({
                "url": pa.array([f"doc://{i}" for i in ids], pa.large_string()),
                "warc_ts": pa.array([None] * len(ids), pa.timestamp("us")),
                "html": pa.array(html, pa.large_binary()),
                "text": pa.array(texts, pa.large_string()),
                "lang": pa.array(langs, pa.string()),
            })

    return _spread(docs.select("doc_id", "text", "lang")).mapInArrow(
        gen, PAGES_SCHEMA)


def _spread(docs: DataFrame) -> DataFrame:
    """Round-robin repartition of the (tiny) doc rows so the page-build +
    extraction kernels parallelize: the testdata tables are single
    parquet files → one scan split → one core for the whole mapInArrow
    chain otherwise.  The exchange moves ~400-byte rows, the kernel does
    ~10^4× that work per row; at production scale the input layout
    (many files / Iceberg splits) provides this for free and the
    exchange is skipped for already-parallel inputs.  Plan-stats probe
    (session.est_scan_partitions), not .rdd — no RDD conversion at
    build time (round-2 review item 10)."""
    from .session import est_scan_partitions
    p = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(p) if est_scan_partitions(docs) < p else docs


# ---------------------------------------------------------------------------
# non-HTML format payloads (md / csv / json_docling / mixed) — drive the
# 15-format sniff routing (webextract/formats.py) through the same
# oracle-checkable documents wrapper
# ---------------------------------------------------------------------------

CSV_COLS = 5


def build_md_page(doc_id: int, text: str) -> bytes:
    """Markdown source: heading + one paragraph (text is single-line,
    md-metachar-free — asserted by test_synth_charset)."""
    return f"# Document {doc_id}\n\n{text}\n".encode("utf-8")


def build_csv_page(doc_id: int, text: str) -> bytes:
    """CSV source: fixed header + token rows of CSV_COLS cells."""
    import csv as _csv
    import io as _io
    toks = text.split(" ")
    buf = _io.StringIO()
    w = _csv.writer(buf, lineterminator="\n")
    w.writerow([f"c{i}" for i in range(CSV_COLS)])
    for i in range(0, len(toks), CSV_COLS):
        w.writerow(toks[i:i + CSV_COLS])
    return buf.getvalue().encode("utf-8")


def build_json_page(doc_id: int, text: str) -> bytes:
    """json_docling source: our serialized document IR (heading + para),
    re-ingested losslessly by formats.parse_json_docling_blocks."""
    import json as _json
    return _json.dumps({
        "schema_name": "WebExtractDocument", "version": "1.0.0",
        "origin": f"doc://{doc_id}",
        "blocks": [
            {"idx": 0, "tag": "h1", "kind": "heading", "path": "jd/h[0]",
             "text": f"Document {doc_id}", "heading_level": 1},
            {"idx": 1, "tag": "p", "kind": "para", "path": "jd/p[1]",
             "text": text, "heading_level": 0}],
    }, ensure_ascii=False, separators=(",", ":")).encode("utf-8")


def build_rich_page(doc_id: int, text: str) -> bytes:
    """Article exercising the non-para block kinds (C6 tables, C8 code,
    quotes, both list flavors) with deterministic token slices:
    code=toks[0:2] quote=[2:4] ul-item=[4:6] ol-item=[6:8]
    table=1×2 cells [8:10], para=rest (docs have ≥10 tokens)."""
    t = text.split(" ")
    para = " ".join(t[10:])
    body = (f"<pre><code>{_esc(' '.join(t[0:2]))}</code></pre>"
            f"<blockquote>{_esc(' '.join(t[2:4]))}</blockquote>"
            f"<ul><li>{_esc(' '.join(t[4:6]))}</li></ul>"
            f"<ol><li>{_esc(' '.join(t[6:8]))}</li></ol>"
            f"<table><tr><td>{_esc(t[8])}</td><td>{_esc(t[9])}</td></tr>"
            f"</table>")
    if para:
        body += f"<p>{_esc(para)}</p>"
    article = f"<article><h1>Document {doc_id}</h1>{body}</article>"
    return (
        f"<!DOCTYPE html><html><head><title>Doc {doc_id}</title></head>"
        f"<body>{_HEADER}{_COOKIE}"
        f'<div id="page">{_ASIDE}{article}</div>{_FOOTER}</body></html>'
    ).encode("utf-8")


def build_jats_page(doc_id: int, text: str) -> bytes:
    """JATS article: title + one abstract paragraph (text is
    XML-metachar-free — asserted by test_synth_charset)."""
    return (f'<?xml version="1.0"?>\n'
            f'<article xmlns:x="https://jats.nlm.nih.gov">'
            f'<front><article-meta><title-group>'
            f'<article-title>Document {doc_id}</article-title>'
            f'</title-group><abstract><p>{text}</p></abstract>'
            f'</article-meta></front></article>').encode("utf-8")


def build_uspto_page(doc_id: int, text: str) -> bytes:
    """USPTO grant: invention-title + abstract paragraph + one claim."""
    toks = text.split(" ")
    claim = " ".join(toks[:12])
    body = " ".join(toks[12:])
    parts = [f'<?xml version="1.0"?>\n<us-patent-grant>'
             f'<invention-title>Document {doc_id}</invention-title>'
             f'<abstract><p>{claim}</p></abstract>']
    if body:
        parts.append(f'<description><p>{body}</p></description>')
    parts.append('</us-patent-grant>')
    return "".join(parts).encode("utf-8")


METS_ALTO_BLOCK_TOKENS = 8


def build_mets_page(doc_id: int, text: str) -> bytes:
    """METS/MODS package: title + abstract (first 12 tokens) + an
    embedded ALTO section carrying the remaining tokens as OCR
    TextBlocks of METS_ALTO_BLOCK_TOKENS words each."""
    toks = text.split(" ")
    abstract, rest = " ".join(toks[:12]), toks[12:]
    alto = ""
    if rest:
        tb = []
        for i in range(0, len(rest), METS_ALTO_BLOCK_TOKENS):
            words = "".join(f'<String CONTENT="{w}"/>'
                            for w in rest[i:i + METS_ALTO_BLOCK_TOKENS])
            tb.append(f"<TextBlock><TextLine>{words}</TextLine>"
                      "</TextBlock>")
        alto = ('<dmdSec><mdWrap><xmlData>'
                '<alto xmlns="http://www.loc.gov/standards/alto/ns-v2#">'
                '<Layout><Page><PrintSpace>' + "".join(tb)
                + '</PrintSpace></Page></Layout></alto>'
                '</xmlData></mdWrap></dmdSec>')
    return (f'<?xml version="1.0"?>\n'
            f'<mets xmlns="http://www.loc.gov/METS/"><dmdSec><mdWrap>'
            f'<xmlData><mods><titleInfo><title>Document {doc_id}</title>'
            f'</titleInfo><abstract>{abstract}</abstract></mods>'
            f'</xmlData></mdWrap></dmdSec>{alto}</mets>').encode("utf-8")


def build_asciidoc_page(doc_id: int, text: str) -> bytes:
    """AsciiDoc source exercising title, * list items, ---- literal
    block, and a paragraph with deterministic token slices:
    li1=toks[0:2] li2=[2:4] code=[4:6] para=rest (docs have ≥10
    tokens)."""
    t = text.split(" ")
    return (f"= Document {doc_id}\n\n"
            f"* {' '.join(t[0:2])}\n"
            f"* {' '.join(t[2:4])}\n\n"
            f"----\n{' '.join(t[4:6])}\n----\n\n"
            f"{' '.join(t[6:])}\n").encode("utf-8")


VTT_CUE_TOKENS = 8


def build_vtt_page(doc_id: int, text: str) -> bytes:
    """WebVTT source: one cue per VTT_CUE_TOKENS tokens, with id +
    timestamp lines and a NOTE block the parser must strip."""
    toks = text.split(" ")
    cues = []
    for n, i in enumerate(range(0, len(toks), VTT_CUE_TOKENS)):
        cues.append(f"{n + 1}\n00:{n // 60:02d}:{n % 60:02d}.000 --> "
                    f"00:{(n + 1) // 60:02d}:{(n + 1) % 60:02d}.000\n"
                    + " ".join(toks[i:i + VTT_CUE_TOKENS]))
    return ("WEBVTT\n\nNOTE synthetic cue file\n\n"
            + "\n\n".join(cues) + "\n").encode("utf-8")


def _zip_bytes(parts: dict[str, str]) -> bytes:
    """Deterministic OOXML container: STORED entries with the ZipInfo
    default (fixed 1980) timestamp so payloads are pure functions of
    (doc_id, text); sniff reads part names from the local headers."""
    import io as _io
    import zipfile as _zip
    buf = _io.BytesIO()
    with _zip.ZipFile(buf, "w", _zip.ZIP_STORED) as z:
        for name, data in parts.items():
            z.writestr(_zip.ZipInfo(name), data)
    return buf.getvalue()


def build_docx_page(doc_id: int, text: str) -> bytes:
    """DOCX source: Heading1 title paragraph + body paragraph split
    across TWO <w:t> runs (the parser must concatenate runs) + a second
    paragraph, mirroring the uspto 12-token split."""
    toks = text.split(" ")
    head, rest = " ".join(toks[:12]), " ".join(toks[12:])
    paras = [('<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
              f'<w:r><w:t>Document {doc_id}</w:t></w:r></w:p>'),
             (f'<w:p><w:r><w:t>{toks[0]}</w:t></w:r>'
              f'<w:r><w:t> {" ".join(toks[1:12])}</w:t></w:r></w:p>')]
    if rest:
        paras.append(f'<w:p><w:r><w:t>{rest}</w:t></w:r></w:p>')
    xml = ('<?xml version="1.0"?><w:document><w:body>'
           + "".join(paras) + "</w:body></w:document>")
    return _zip_bytes({"word/document.xml": xml})


def build_pptx_page(doc_id: int, text: str) -> bytes:
    """PPTX source: two slides (part-name sort order = slide order),
    first 12 tokens on slide1, the rest on slide2."""
    toks = text.split(" ")
    head, rest = " ".join(toks[:12]), " ".join(toks[12:])
    parts = {"ppt/slides/slide1.xml":
             f'<p:sld><a:p><a:r><a:t>{head}</a:t></a:r></a:p></p:sld>'}
    if rest:
        parts["ppt/slides/slide2.xml"] = \
            f'<p:sld><a:p><a:r><a:t>{rest}</a:t></a:r></a:p></p:sld>'
    return _zip_bytes(parts)


def build_xlsx_page(doc_id: int, text: str) -> bytes:
    """XLSX source: header row + CSV_COLS-token rows via sharedStrings
    (t="s" indirection) plus one final NUMERIC cell row (doc_id) so
    both cell branches of the parser are exercised."""
    toks = text.split(" ")
    shared = [f"c{i}" for i in range(CSV_COLS)] + toks
    ss = ('<sst>' + "".join(f"<si><t>{s}</t></si>" for s in shared)
          + "</sst>")
    rows = ["<row r=\"1\">"
            + "".join(f'<c t="s"><v>{i}</v></c>' for i in range(CSV_COLS))
            + "</row>"]
    for rn, i in enumerate(range(0, len(toks), CSV_COLS), start=2):
        cells = "".join(f'<c t="s"><v>{CSV_COLS + j}</v></c>'
                        for j in range(i, min(i + CSV_COLS, len(toks))))
        rows.append(f'<row r="{rn}">{cells}</row>')
    rows.append(f'<row r="{len(rows) + 1}"><c t="n"><v>{doc_id}</v></c>'
                '</row>')
    sheet = ('<worksheet><sheetData>' + "".join(rows)
             + "</sheetData></worksheet>")
    return _zip_bytes({"xl/sharedStrings.xml": ss,
                       "xl/worksheets/sheet1.xml": sheet})


def build_mixed_page(doc_id: int, text: str) -> bytes:
    """Round-robin format mix incl. binary junk (doc_id % 4 == 2) — the
    admission gate proving unknown payloads SKIP instead of parsing as
    HTML."""
    r = doc_id % 4
    if r == 0:
        return build_page(doc_id, text)
    if r == 1:
        return build_md_page(doc_id, text)
    if r == 2:
        return b"\x00\xfe\xfd" + text.encode("utf-8")[:64]
    return build_csv_page(doc_id, text)


def docs_to_format_pages(docs: DataFrame, kind: str) -> DataFrame:
    """documents → input_hint page frame with kind ∈ {md, csv, json,
    mixed} payloads (same vectorized mapInArrow shape as
    docs_to_pages)."""
    build = {"md": build_md_page, "csv": build_csv_page,
             "json": build_json_page, "mixed": build_mixed_page,
             "jats": build_jats_page, "uspto": build_uspto_page,
             "mets": build_mets_page, "rich": build_rich_page,
             "asciidoc": build_asciidoc_page, "vtt": build_vtt_page,
             "docx": build_docx_page, "pptx": build_pptx_page,
             "xlsx": build_xlsx_page}[kind]

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("doc_id").to_pylist()
            texts = b.column("text").to_pylist()
            langs = b.column("lang").to_pylist()
            yield pa.RecordBatch.from_pydict({
                "url": pa.array([f"doc://{i}" for i in ids],
                                pa.large_string()),
                "warc_ts": pa.array([None] * len(ids), pa.timestamp("us")),
                "html": pa.array([build(i, t) for i, t in zip(ids, texts)],
                                 pa.large_binary()),
                "text": pa.array(texts, pa.large_string()),
                "lang": pa.array(langs, pa.string()),
            })

    return _spread(docs.select("doc_id", "text", "lang")).mapInArrow(
        gen, PAGES_SCHEMA)


RUNS_PER_PAGE = 20


def build_pdf_page(doc_id: int, text: str, run_tokens: int = 12) -> bytes:
    """One mini-PDF payload per document: paragraphs of ``run_tokens``
    tokens laid out top-to-bottom, RUNS_PER_PAGE runs per page, emitted
    in REVERSED wire order — the parser must reconstruct reading order
    (operator C4) before the output can match the SQL oracle."""
    from .pdfmini import write_pdf
    toks = text.split(" ")
    runs = [" ".join(toks[i:i + run_tokens])
            for i in range(0, len(toks), run_tokens)]
    pages: list[list[tuple[int, int, int, str]]] = []
    for j, run in enumerate(runs):
        if j % RUNS_PER_PAGE == 0:
            pages.append([])
        pages[-1].append((72, 72 + 30 * (j % RUNS_PER_PAGE), 11, run))
    shuffled = [list(reversed(p)) for p in pages]
    return write_pdf(shuffled)


def docs_to_pdf_pages(docs: DataFrame, run_tokens: int = 12) -> DataFrame:
    """documents → input_hint page frame whose payloads are mini-PDFs
    (format-sniff dispatch C1 routes them to pdfmini)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("doc_id").to_pylist()
            texts = b.column("text").to_pylist()
            langs = b.column("lang").to_pylist()
            yield pa.RecordBatch.from_pydict({
                "url": pa.array([f"doc://{i}" for i in ids], pa.large_string()),
                "warc_ts": pa.array([None] * len(ids), pa.timestamp("us")),
                "html": pa.array([build_pdf_page(i, t, run_tokens)
                                  for i, t in zip(ids, texts)],
                                 pa.large_binary()),
                "text": pa.array(texts, pa.large_string()),
                "lang": pa.array(langs, pa.string()),
            })

    return _spread(docs.select("doc_id", "text", "lang")).mapInArrow(
        gen, PAGES_SCHEMA)
