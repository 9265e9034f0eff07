"""Chunkers: hybrid (token-aware) and hierarchical (per-item).

Re-expresses the reference's two chunker families (HybridChunker /
HierarchicalChunker endpoints, /root/reference/docling_serve/app.py:1145-1150,
request models datamodel/requests.py:109-130) as pure 1->N generator
functions run inside a mapInArrow kernel and exploded to rows — Spark's
UDTF analogue (SURVEY.md §2.4).

Token rule (defined once, SQL-expressible for the DuckDB oracle):
a token is a whitespace-separated word; a chunk never exceeds
``max_tokens`` tokens; oversized single blocks split into fixed token
windows; consecutive small blocks under the same heading merge
(merge_peers semantics of the hybrid chunker).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Chunk:
    idx: int
    text: str
    heading: str
    n_tokens: int


def _windows(tokens: list[str], max_tokens: int) -> list[str]:
    return [" ".join(tokens[i:i + max_tokens])
            for i in range(0, len(tokens), max_tokens)]


def chunk_blocks_from_spans(text: str, spans: list[dict], chunker: str,
                            max_tokens: int = 256) -> list[Chunk]:
    """spans = [{start,end,kind,path}] into ``text`` (extract.py output).

    hybrid: headings set context; content blocks merge up to max_tokens,
    oversized blocks split into token windows.
    hierarchical: one chunk per content block, heading-path metadata.
    """
    chunks: list[Chunk] = []
    heading = ""

    def emit(tokens: list[str]) -> None:
        if tokens:
            chunks.append(Chunk(len(chunks), " ".join(tokens), heading,
                                len(tokens)))

    if chunker == "hierarchical":
        for s in spans:
            seg = text[s["start"]:s["end"]]
            if s["kind"] == "heading":
                heading = seg
                continue
            toks = seg.split()
            if toks:
                chunks.append(Chunk(len(chunks), " ".join(toks), heading,
                                    len(toks)))
        return chunks

    # hybrid
    acc: list[str] = []
    for s in spans:
        seg = text[s["start"]:s["end"]]
        if s["kind"] == "heading":
            emit(acc)
            acc = []
            heading = seg
            continue
        toks = seg.split()
        if len(toks) > max_tokens:
            emit(acc)
            acc = []
            for w in _windows(toks, max_tokens):
                emit(w.split())
            continue
        if len(acc) + len(toks) > max_tokens:
            emit(acc)
            acc = []
        acc.extend(toks)
    emit(acc)
    return chunks
