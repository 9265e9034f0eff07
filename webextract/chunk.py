"""Chunkers: hybrid (token-aware) and hierarchical (per-item).

Re-expresses the reference's two chunker families (HybridChunker /
HierarchicalChunker endpoints, /root/reference/docling_serve/app.py:1145-1150,
request models datamodel/requests.py:109-130) as pure 1->N generator
functions run inside a mapInArrow kernel and exploded to rows — Spark's
UDTF analogue (SURVEY.md §2.4).

Token rules (each defined once, SQL-expressible for the DuckDB oracle):

* ``tokenizer="word"`` — a token is a whitespace-separated word.
* ``tokenizer="subword"`` — a word costs ceil(len/4) BPE-ish pieces,
  the same estimator as corpus.token_stats; this is the reference's
  tokenizer-aware HybridChunker measure (its max_tokens counts
  HuggingFace tokenizer pieces, not words — requests.py:109-130).

A chunk never exceeds ``max_tokens`` measured tokens; oversized single
blocks split greedily into maximal windows under the budget; with
``merge_peers`` (reference default true) consecutive small blocks under
the same heading merge up to the budget, otherwise each block stands
alone.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Chunk:
    idx: int
    text: str
    heading: str
    n_tokens: int


def _wcost(w: str) -> int:
    """Subword cost of one word: ceil(len/4), min 1 (corpus.token_stats)."""
    return max(1, -(-len(w) // 4))


def _measure(tokens: list[str], tokenizer: str) -> int:
    if tokenizer == "subword":
        return sum(_wcost(w) for w in tokens)
    return len(tokens)


def _windows(tokens: list[str], max_tokens: int,
             tokenizer: str) -> list[list[str]]:
    """Greedy maximal windows under the budget (each window keeps at
    least one token, so a single over-budget word still emits)."""
    if tokenizer != "subword":
        return [tokens[i:i + max_tokens]
                for i in range(0, len(tokens), max_tokens)]
    out, cur, cost = [], [], 0
    for w in tokens:
        c = _wcost(w)
        if cur and cost + c > max_tokens:
            out.append(cur)
            cur, cost = [], 0
        cur.append(w)
        cost += c
    if cur:
        out.append(cur)
    return out


def chunk_blocks_from_spans(text: str, spans: list[dict], chunker: str,
                            max_tokens: int = 256,
                            tokenizer: str = "word",
                            merge_peers: bool = True) -> list[Chunk]:
    """spans = [{start,end,kind,path}] into ``text`` (extract.py output).

    hybrid: headings set context; content blocks merge up to max_tokens
    (merge_peers), oversized blocks split into measured windows.
    hierarchical: one chunk per content block, heading-path metadata.
    """
    chunks: list[Chunk] = []
    heading = ""

    def emit(tokens: list[str]) -> None:
        if tokens:
            chunks.append(Chunk(len(chunks), " ".join(tokens), heading,
                                _measure(tokens, tokenizer)))

    if chunker == "hierarchical":
        for s in spans:
            seg = text[s["start"]:s["end"]]
            if s["kind"] == "heading":
                heading = seg
                continue
            emit(seg.split())
        return chunks

    # hybrid
    acc: list[str] = []
    acc_cost = 0
    for s in spans:
        seg = text[s["start"]:s["end"]]
        if s["kind"] == "heading":
            emit(acc)
            acc, acc_cost = [], 0
            heading = seg
            continue
        toks = seg.split()
        cost = _measure(toks, tokenizer)
        if cost > max_tokens:
            emit(acc)
            acc, acc_cost = [], 0
            for w in _windows(toks, max_tokens, tokenizer):
                emit(w)
            continue
        if acc and (not merge_peers or acc_cost + cost > max_tokens):
            emit(acc)
            acc, acc_cost = [], 0
        acc.extend(toks)
        acc_cost += cost
    emit(acc)
    return chunks
