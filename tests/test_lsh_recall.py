"""MinHash-LSH quality pin: on the sf0.01 corpus (deterministic data +
deterministic hash family), LSH candidates must contain EVERY true
near-dup pair (3-gram Jaccard >= 0.4) with near-perfect precision.
This guards the signature/banding math — a broken permutation or band
key would silently destroy recall while still 'running'."""

from __future__ import annotations

from webextract.corpus import lsh_candidate_pairs, ngram_jaccard_pairs

SF = "/root/testdata/sf0.01"


def test_lsh_recall_and_precision(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {(r.doc_a, r.doc_b)
             for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    cands = {(r.doc_a, r.doc_b)
             for r in lsh_candidate_pairs(docs).collect()}
    assert exact, "corpus should contain near-dup pairs"
    missed = exact - cands
    assert not missed, f"LSH missed true pairs: {sorted(missed)[:5]}"
    # false-candidate rate stays tiny on this corpus (pinned: 1 extra)
    assert len(cands - exact) <= 5, len(cands - exact)
