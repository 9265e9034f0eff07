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
