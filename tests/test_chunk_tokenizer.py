"""Cross-engine equivalence of the deterministic subword tokenizer.

chunk.subword_count (Python greedy longest-match, runs in the chunker
kernel) must equal length(regexp_replace(w, SUBWORD_REGEX, chr(1),
'g')) in BOTH DuckDB (RE2) and Spark (Java regex) — that identity is
what makes the chunk_hybrid_subword oracle exact.  Checked over the
driver corpus vocabulary plus adversarial constructions.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from webextract.chunk import (SUBWORD_PIECES, SUBWORD_REGEX,
                              subword_count)

SF_DIR = "/root/testdata/sf0.01"

ADVERSARIAL = [
    "the", "theth", "thethethe", "ingestion", "nation", "jazz", "q",
    "overought", "ableable", "xingx", "ss", "sss", "ssss",
    "antant", "entent", "a", "zzzz", "Theth",      # case-sensitive
    "123", "doc42", "under", "understand", "ness", "nessness",
]


def _vocab_words():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
        f"FROM '{SF_DIR}/documents.parquet'").fetchall()
    con.close()
    return sorted(r[0] for r in rows if r[0])


def test_pieces_are_regex_safe():
    for p in SUBWORD_PIECES:
        assert p.isascii() and p.isalpha() and p == p.lower(), p


def test_python_matches_duckdb_re2():
    words = _vocab_words() + ADVERSARIAL
    con = duckdb.connect()
    con.sql("CREATE TABLE w (word VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in words])
    got = dict(con.sql(
        f"SELECT word, length(regexp_replace(word, '{SUBWORD_REGEX}', "
        f"chr(1), 'g')) FROM w").fetchall())
    con.close()
    for w in words:
        assert subword_count(w) == got[w], \
            f"{w!r}: python {subword_count(w)} != duckdb {got[w]}"


def test_python_matches_spark_java_regex(spark):
    words = _vocab_words()[:500] + ADVERSARIAL
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = dict(df.select(
        "word",
        F.length(F.regexp_replace("word", SUBWORD_REGEX, "\x01"))
        .alias("n")).collect())
    for w in words:
        assert subword_count(w) == got[w], \
            f"{w!r}: python {subword_count(w)} != spark {got[w]}"


def test_greedy_longest_match_semantics():
    # 'the' wins over 'th' at the same position
    assert subword_count("the") == 1
    # leftover single characters count one each
    assert subword_count("xthex") == 3          # x + the + x
    # uppercase is not in the merge table (case-sensitive like BPE)
    assert subword_count("THE") == 3


@pytest.mark.parametrize("w", ADVERSARIAL)
def test_count_positive_and_bounded(w):
    n = subword_count(w)
    assert 1 <= n <= len(w)


# ---------------------------------------------------------------------------
# trained-vocab tokenizer (tokenizer="trained"): encode ≡ trainer,
# pinned THROUGH the chunk boundary logic (round-4 verdict item 3)
# ---------------------------------------------------------------------------

def test_trained_counter_matches_trainer_segmentation(spark):
    """chunk.make_trained_counter(merges) applied to the training
    corpus' words must reproduce corpus.bpe_train's FINAL segmentation
    lengths word-for-word (the encode≡trainer contract), and
    corpus.bpe_segment (which now calls the same counter) must agree
    per document."""
    from webextract import corpus
    from webextract.chunk import make_trained_counter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges_df = corpus.bpe_train(docs, n_merges=4)
    table = tuple((r["lhs"], r["rhs"])
                  for r in merges_df.orderBy("rank").collect())
    assert len(table) == 4
    count = make_trained_counter(table)

    # per-word: replay == one more manual replay over raw symbols
    words = [r["w"] for r in docs.selectExpr(
        "explode(split(text, ' ')) AS w").distinct().limit(400).collect()]
    for w in words:
        if not all("!" <= ch <= "~" for ch in w) or not w:
            assert count(w) == 1
            continue
        syms = list(w)
        for lhs, rhs in table:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == lhs
                        and syms[i + 1] == rhs):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert count(w) == len(syms), w

    # per-doc: bpe_segment's n_tokens == sum of the chunker's counter
    seg = {r["doc_id"]: r["n_tokens"]
           for r in corpus.bpe_segment(docs, merges_df).collect()}
    for r in docs.select("doc_id", "text").limit(50).collect():
        words = (r["text"] or "").split(" ")
        assert seg[r["doc_id"]] == sum(count(w) for w in words)


def test_trained_chunker_boundaries_respect_budget(spark):
    """Every chunk from tokenizer='trained' stays within max_tokens as
    measured by the SAME trained counter, and re-measuring each emitted
    chunk_text reproduces its recorded n_tokens — the budget decision
    and the measure cannot drift (the hardwired-vocab defect this
    replaces)."""
    from webextract import corpus
    from webextract.chunk import chunk_blocks_from_spans, make_trained_counter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    table = tuple((r["lhs"], r["rhs"]) for r in
                  corpus.bpe_train(docs, n_merges=4).orderBy("rank")
                  .collect())
    count = make_trained_counter(table)
    rows = docs.select("text").limit(30).collect()
    for row in rows:
        text = "H\n" + (row["text"] or "")
        spans = [{"start": 0, "end": 1, "kind": "heading", "path": "h1"},
                 {"start": 2, "end": len(text), "kind": "para",
                  "path": "p"}]
        chunks = chunk_blocks_from_spans(text, spans, "hybrid",
                                         max_tokens=64,
                                         tokenizer="trained",
                                         merges=table)
        body_words = text[2:].split()
        emitted = []
        for c in chunks:
            got = sum(count(w) for w in c.text.split())
            assert got == c.n_tokens
            # single over-budget words may exceed; otherwise bounded
            if len(c.text.split()) > 1:
                assert c.n_tokens <= 64
            emitted.extend(c.text.split())
        assert emitted == body_words  # nothing lost or reordered


def test_trained_counter_requires_merges():
    from webextract.chunk import chunk_blocks_from_spans
    with pytest.raises(ValueError):
        chunk_blocks_from_spans("x", [{"start": 0, "end": 1,
                                       "kind": "para", "path": "p"}],
                                "hybrid", tokenizer="trained")
