"""Conversion options — the engine's "logical plan" record.

Mirrors the option surface of the reference's ConvertDocumentsOptions
(/root/reference/docling_serve/datamodel/convert.py:20-40 and
/root/reference/docs/usage.md:14-41), restricted to the fields that have
meaning for a deterministic batch extractor.  The dataclass is broadcast
(by closure capture) into the Arrow UDF; it must stay picklable and
hashable so a compiled-extractor cache keyed by options-hash works like
the reference's converter LRU (settings.py:52, options_cache_size).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class ConvertOptions:
    # admission (reference: from_formats docs/usage.md:14 — defaults to
    # ALL 15 formats exactly like the reference; max_num_pages /
    # max_file_size settings.py:74-75)
    from_formats: tuple[str, ...] = (
        "docx", "pptx", "html", "image", "pdf", "asciidoc", "md", "csv",
        "xlsx", "xml_uspto", "xml_jats", "mets_gbs", "json_docling",
        "audio", "vtt")
    max_file_size: int = 256 * 1024 * 1024
    max_num_pages: int = 10_000

    # output projection (reference: to_formats docs/usage.md:15)
    to_formats: tuple[str, ...] = ("md", "text")

    # page slicing (reference: page_range docs/usage.md:25)
    page_range: tuple[int, int] = (1, 10_000)

    # markdown page-break placeholder (docs/usage.md:31)
    md_page_break_placeholder: str = ""

    # image export mode (ImageRefMode placeholder|embedded|referenced,
    # docs/usage.md:16; referenced-mode artifact invariant tested like
    # the reference's zip test, tests/test_fastapi_endpoints.py:181-215)
    image_export_mode: str = "placeholder"

    # main-content selection knobs (north_star: text/link-density scoring)
    min_block_chars: int = 15          # blocks shorter than this score less
    max_link_density: float = 0.35     # block-level admit threshold
    link_char_penalty: float = 2.0     # container score: chars - p*link_chars
    boiler_damp: float = 0.05          # nav/header/footer/aside damping
    semantic_boost: float = 1.5        # <article>/<main> container boost
    cluster_slack: float = 0.95        # prefer deepest container >= slack*max

    # per-document timeout seconds (reference: document_timeout
    # datamodel/convert.py:33-40); checked per Arrow batch
    document_timeout: float = 604800.0

    # abort_on_error=false default like the reference (docs/usage.md:24):
    # failures become status='failure' rows, never kill the job
    abort_on_error: bool = False

    def with_(self, **kw) -> "ConvertOptions":
        return replace(self, **kw)


DEFAULT_OPTIONS = ConvertOptions()

# Output-format names (reference OutputFormat enum, docs/usage.md:15).
OUTPUT_FORMATS = ("md", "json", "html", "html_split_page", "text", "doctags")
