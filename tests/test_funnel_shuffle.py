"""corpus_funnel / shard_shuffle semantics on a hand-computed corpus —
the oracle gate pins the numbers; these pin the INTERPRETATION (which
doc falls out at which stage, and that the shard permutation is
layout-independent)."""

import hashlib

from webextract import corpus

# two quality-passing 50+-word texts with NO shared word trigram
# (asserted below), so contamination is controllable per-doc
_GOOD = ("the quick brown fox jumps over a lazy dog and it runs to "
         "the river in the morning light while the birds sing of "
         "summer and the wind is soft in the trees so the day begins "
         "with a calm walk along the path and it ends well here "
         "today friends")
_GOOD2 = ("every small town keeps its old stone bridge near one wide "
          "field where many children play games after school since "
          "late spring brings warm rain for gardens full of red roses "
          "that bloom by tall gates is such nice news indeed given "
          "how calm villages feel when evening comes quietly")


def _tris(s):
    w = s.split(" ")
    return {tuple(w[i:i + 3]) for i in range(len(w) - 2)}


def test_fixture_texts_are_trigram_disjoint_and_quality_passing():
    assert not (_tris(_GOOD) & _tris(_GOOD2))
    for t in (_GOOD, _GOOD2):
        w = t.split(" ")
        assert len(w) >= 50
        assert 3.0 <= sum(map(len, w)) / len(w) <= 10.0
        assert sum(x in ("the", "a", "of", "and", "to", "in", "is",
                         "it") for x in w) >= 2


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string")


def test_funnel_stage_attribution(spark):
    """Each doc falls out at exactly the documented stage."""
    rows = [
        (0, "en", _GOOD2),                        # probe (0%50==0) -> stage 3
        (1, "de", _GOOD),                         # lang fail -> stage 0
        (2, "en", "too short"),                   # quality fail -> stage 1
        (3, "en", _GOOD + " twin"),               # dup survivor -> stage 4
        (4, "en", _GOOD + " twin"),               # dup loser -> stage 2
        # shares the probe's trigrams -> contaminated -> stage 3
        (5, "en", _GOOD2 + " extra tail"),
    ]
    got = {r["stage"]: (r["n_docs"], r["n_tokens"])
           for r in corpus.corpus_funnel(_docs(spark, rows)).collect()}
    n = len(_GOOD.split(" "))
    # cumulative: ingest=6, lang=5 (doc1 out), quality=4 (doc2 out),
    # exact_dedup=3 (doc4 out), decontaminated=1 (doc0 probe out,
    # doc5 contaminated out; doc3 alone survives)
    assert got["ingest"][0] == 6
    assert got["lang"][0] == 5
    assert got["quality"][0] == 4
    assert got["exact_dedup"][0] == 3
    assert got["decontaminated"] == (1, n + 1)    # doc3 only


def test_funnel_dup_pool_scoping(spark):
    """A duplicate whose twin FAILED quality is not a duplicate: the
    pool is the stage-2 survivors, not the raw corpus."""
    rows = [
        (10, "de", _GOOD),          # same text, but out at lang stage
        (11, "en", _GOOD),          # alone in the pool -> survivor
    ]
    got = {r["stage"]: r["n_docs"]
           for r in corpus.corpus_funnel(_docs(spark, rows)).collect()}
    assert got["exact_dedup"] == 1  # doc11 not deduped against doc10


def test_shard_shuffle_layout_independent(spark):
    """Shard manifests (incl. the order checksum) are identical under
    any input partitioning, and the permutation matches the md5 rule
    recomputed driver-side."""
    rows = [(i, "en", f"w{i} " * (i % 5 + 1)) for i in range(200)]
    d1 = _docs(spark, rows).repartition(1)
    d13 = _docs(spark, rows).repartition(13)
    m1 = sorted(map(tuple, corpus.shard_shuffle(d1, shards=8).collect()))
    m13 = sorted(map(tuple,
                     corpus.shard_shuffle(d13, shards=8).collect()))
    assert m1 == m13
    # recompute shard 0's manifest from the md5 formulas

    def shard_of(i):
        return int(hashlib.md5(f"shuf1:S:{i}".encode())
                   .hexdigest()[:8], 16) % 8

    def order_key(i):
        return (hashlib.md5(f"shuf1:O:{i}".encode()).hexdigest(), i)

    members = sorted((i for i in range(200) if shard_of(i) == 0),
                     key=order_key)
    row = {r["shard"]: r for r in
           corpus.shard_shuffle(d1, shards=8).collect()}[0]
    assert row["n_docs"] == len(members)
    assert row["first_doc"] == members[0]
    assert row["last_doc"] == members[-1]
    assert row["order_sum"] == sum(
        p * (i % corpus.ORDER_SUM_MOD) for p, i in enumerate(members))
