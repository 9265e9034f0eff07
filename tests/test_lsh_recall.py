"""MinHash-LSH quality pin: on the sf0.01 corpus (deterministic data +
deterministic hash family), LSH candidates must contain EVERY true
near-dup pair (3-gram Jaccard >= 0.4) with near-perfect precision.
This guards the signature/banding math — a broken permutation or band
key would silently destroy recall while still 'running'."""

from __future__ import annotations

from pyspark.sql import functions as F

from webextract.corpus import (LSH_BUCKET_CAP, lsh_candidate_pairs,
                               ngram_jaccard_pairs)

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


def test_ngram_df_cap_bounds_hot_shingle(spark):
    """The document-frequency cap must (a) keep real near-dup pairs and
    (b) bound the self-join's reducer input when a viral shingle
    appears in every document.  200 docs all share one hot phrase; two
    are true near-dups of each other."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    hot = "subscribe to our newsletter"      # injected viral 3+-gram
    rows = [(i, f"unique{i} token{i} filler{i} {hot} word{i} tail{i}")
            for i in range(200)]
    rows.append((900, f"{base} one two three four five six seven"))
    rows.append((901, f"{base} one two three four five six eight"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {(r.doc_a, r.doc_b)
             for r in ngram_jaccard_pairs(docs, df_cap=32).collect()}
    assert (900, 901) in pairs
    # no pair may exist solely through the hot shingle
    assert all(a >= 900 for a, _ in pairs), sorted(pairs)[:5]
    # reducer bound: after the cap, no shingle row count exceeds df_cap,
    # so the join input per shingle is <= df_cap (vs 200 uncapped)
    from webextract.corpus import exploded_shingles
    from pyspark.sql import Window
    e = exploded_shingles(docs, 3)
    capped = (e.withColumn("df", F.count("*").over(
        Window.partitionBy("shingle"))).filter(F.col("df") <= 32))
    assert capped.groupBy("shingle").count().agg(
        F.max("count")).first()[0] <= 32
    uncapped_max = e.groupBy("shingle").count().agg(F.max("count")).first()[0]
    assert uncapped_max > 32  # the injected skew was real


def test_lsh_bucket_cap_drops_giant_bucket(spark):
    """An m-copy duplicate cluster larger than the bucket cap must be
    excluded from candidate pairs (m² guard); small clusters survive."""
    big = [(i, "identical duplicate content repeated many times over")
           for i in range(LSH_BUCKET_CAP + 10)]
    small = [(500, "a distinct near duplicate pair of documents here one"),
             (501, "a distinct near duplicate pair of documents here two")]
    docs = spark.createDataFrame(big + small, "doc_id bigint, text string")
    pairs = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(docs).collect()}
    assert (500, 501) in pairs
    assert not any(a < 500 for a, _ in pairs), \
        "giant bucket leaked pairs past the cap"


def test_dedup_clusters_transitive_chain(spark):
    """a~b and b~c but NOT a~c: label propagation must still place all
    three in one cluster (the transitive closure pair lists miss)."""
    from webextract.corpus import dedup_clusters
    rows = [(0, "x"), (1, "x"), (2, "x"), (9, "x"), (7, "x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (7, 9)], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id
           for r in dedup_clusters(docs, pairs=pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 7: 7, 9: 7}


def test_hash_split_stable_under_growth(spark):
    """A doc's split never changes when the corpus grows (the property
    RNG sampling lacks)."""
    from webextract.corpus import hash_split
    small = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(small).collect()}
    b = {r.doc_id: r.split for r in hash_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())
    assert set(b.values()) == {"train", "val", "test"}


def test_dedup_clusters_nonconvergence_raises(spark):
    """A component whose diameter exceeds max_iters must raise loudly,
    never return silently partial clusters."""
    import pytest
    chain = [(i, i + 1) for i in range(6)]        # diameter 6 path
    docs = spark.createDataFrame([(i, "x") for i in range(7)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    from webextract.corpus import dedup_clusters
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(docs, pairs=pairs, max_iters=2)
    ok = {r.doc_id: r.cluster_id
          for r in dedup_clusters(docs, pairs=pairs, max_iters=10).collect()}
    assert set(ok.values()) == {0}


def test_hash_split_rounded_cutoffs(spark):
    """int(round()) cutoffs: 0.29 must map to bucket<2900, not 2899."""
    from webextract.corpus import hash_split
    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = hash_split(docs, weights=(0.29, 0.01, 0.70)).collect()
    for r in out:
        want = ("train" if r.bucket < 2900
                else "val" if r.bucket < 3000 else "test")
        assert r.split == want, (r.bucket, r.split)


def test_dedup_clusters_long_chain_converges_log_rounds(spark):
    """Round-2 review guard, part 1: pointer jumping makes rounds
    O(log diameter) — a 50-hop chain (old behavior: 50 rounds → raise
    at max_iters=20 after paying all of them) must converge within 10
    rounds."""
    from webextract.corpus import dedup_clusters
    n = 51
    docs = spark.createDataFrame([(i, "x") for i in range(n)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id
           for r in dedup_clusters(docs, pairs=pairs,
                                   max_iters=10).collect()}
    assert set(got.values()) == {0} and len(got) == n


def test_dedup_clusters_component_cap_quarantines(spark):
    """Round-2 review guard, part 2: components larger than
    component_cap come back with the -1 quarantine sentinel; small
    components and singletons keep their min-label cluster ids."""
    from webextract.corpus import dedup_clusters
    n = 51
    rows = [(i, "x") for i in range(n)] + [(100, "x"), (101, "x"),
                                           (200, "x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(100, 101)],
        "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id
           for r in dedup_clusters(docs, pairs=pairs, max_iters=10,
                                   component_cap=10).collect()}
    assert all(got[i] == -1 for i in range(n))        # oversize chain
    assert got[100] == 100 and got[101] == 100        # small cluster kept
    assert got[200] == 200                            # singleton kept


def test_ivf_trained_centroids_balance_buckets(spark):
    """r2 item 8: Lloyd-trained centroids must fill every bucket with
    reasonable balance (the property positional seeding lacked), and
    training must be deterministic across invocations."""
    from webextract.corpus import _ivf_centroids, ivf_assign
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    counts = {r["bucket"]: r["count"]
              for r in ivf_assign(emb).groupBy("bucket").count().collect()}
    assert len(counts) == 16                      # every bucket occupied
    mean = sum(counts.values()) / 16
    assert max(counts.values()) <= 2 * mean, counts
    assert _ivf_centroids(emb, 16) == _ivf_centroids(emb, 16)


def test_repetition_fold_flags_spam(spark):
    """The in-array mode fold: a phrase-spam doc must fail the 0.2
    top-2gram bound; clean prose and sub-n docs must pass."""
    from webextract.corpus import repetition_stats
    rows = [(0, "buy cheap pills " * 20), (1, "a b c d e f g h i j"),
            (2, "one"), (3, "")]
    docs = spark.createDataFrame([(i, t.strip()) for i, t in rows],
                                 "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[0].pass_repetition is False
    assert got[0].top_gram_count >= 19          # "pills buy" x19 runs
    assert got[1].pass_repetition is True
    assert got[2].n_grams == 0 and got[2].pass_repetition is True
    assert got[3].n_grams == 0 and got[3].pass_repetition is True


def test_source_mix_rejects_upsampling(spark):
    """r3 review: weights above 1.0 (row duplication) are a different
    operator — loud rejection, never a silent clamp."""
    import pytest
    from webextract.corpus import source_mix
    docs = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    with pytest.raises(ValueError, match="downsamples only"):
        source_mix(docs, {"s": 2.0})
    with pytest.raises(ValueError, match="downsamples only"):
        source_mix(docs, {"s": -0.1})


def test_embed_multitable_recall(spark):
    """r3 verdict item 6: multi-table SRP recall must improve
    monotonically with R (union of candidate sets — superset by
    construction) and strictly recover pairs the single table missed
    on this corpus; everything found must be a true pair (exact cosine
    verify inside buckets => perfect precision)."""
    from webextract.corpus import embed_near_dup_pairs
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    thr = 0.3
    # brute-force truth: all pairs with cos >= thr
    n = emb.select(
        "vec_id", "embedding",
        F.sqrt(F.aggregate(F.zip_with("embedding", "embedding",
                                      lambda a, b: a.cast("double") * b),
                           F.lit(0.0), lambda s, v: s + v)).alias("nrm"))
    a = n.select(F.col("vec_id").alias("vec_a"),
                 F.col("embedding").alias("ea"), F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("vec_b"),
                 F.col("embedding").alias("eb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with("ea", "eb",
                                 lambda x, y: x.cast("double") * y),
                      F.lit(0.0), lambda s, v: s + v)
    truth = {(r.vec_a, r.vec_b) for r in
             a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
             .withColumn("cos", F.round(dot / (F.col("na") * F.col("nb")), 6))
             .filter(F.col("cos") >= thr).collect()}
    assert truth, "corpus should contain near-dup embedding pairs"
    found = {}
    for r in (1, 2, 3):
        found[r] = {(p.vec_a, p.vec_b) for p in embed_near_dup_pairs(
            emb, threshold=thr, tables=r).collect()}
        assert found[r] <= truth          # perfect precision
    assert found[1] <= found[2] <= found[3]       # monotone recall
    assert len(found[3]) > len(found[1]), \
        "extra tables recovered no new pairs — layering is dead code"


def test_pq_codes_shape_and_determinism(spark):
    """Every code in [0, PQ_K); codebook training is deterministic
    across invocations; reconstruction (ADC self-distance) improves
    with Lloyd rounds vs raw seeds."""
    from webextract.corpus import PQ_K, PQ_M, _pq_codebooks, pq_encode
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rows = pq_encode(emb).collect()
    assert all(len(r["codes"]) == PQ_M for r in rows)
    assert all(0 <= c < PQ_K for r in rows for c in r["codes"])
    # all 16 codes used in at least one subspace (trained, not collapsed)
    used = {c for r in rows for c in r["codes"]}
    assert used == set(range(PQ_K)), used
    assert _pq_codebooks(emb) == _pq_codebooks(emb)


def test_pq_topk_recall_vs_exact_l2(spark):
    """ADC approximates squared L2 with 16x4-bit codes; the refine
    stage re-ranks a 50-deep ADC shortlist exactly.  On these
    near-random (worst-case-compressible) 64-dim embeddings, pure ADC
    recall@5 measures 0.36 — pin a floor under that — and refine must
    both clear a high floor and strictly beat ADC (i.e. the second
    stage is doing real work, not passing the shortlist through)."""
    import numpy as np
    from webextract.corpus import pq_refine_topk, pq_topk
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    exact = {}
    for qid in range(10):
        q = vecs[qid]
        d = sorted((float(np.sum((v - q) ** 2)), nid)
                   for nid, v in vecs.items() if nid != qid)
        exact[qid] = {nid for _, nid in d[:5]}

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["qid"], set()).add(r["nid"])
        return sum(len(exact[q] & got.get(q, set()))
                   for q in range(10)) / 50.0

    adc = recall(pq_topk(emb, n_queries=10, k=5))
    ref = recall(pq_refine_topk(emb, n_queries=10, k=5, shortlist=50))
    assert adc >= 0.25, adc
    assert ref >= 0.8, ref
    assert ref > adc, (ref, adc)


def test_line_dedup_removes_boilerplate_keeps_order(spark):
    """A 10-word segment shared by many docs vanishes; unique segments
    survive in original order; a doc that is ALL boilerplate keeps its
    row with clean_text '' (the left-join-not-anti-join invariant)."""
    from webextract.corpus import line_dedup
    boiler = " ".join(["cookie"] * 10)
    rows = [(i, boiler + " " + " ".join([f"u{i}w{j}" for j in range(10)])
             + " " + " ".join([f"v{i}w{j}" for j in range(10)]))
            for i in range(20)]
    rows.append((99, boiler))                     # all-boilerplate doc
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in line_dedup(docs, df_cap=8).collect()}
    assert len(got) == 21                          # every doc kept a row
    assert got[99].clean_text == ""
    assert got[99].kept_segs == 0 and got[99].dropped_segs == 1
    r0 = got[0]
    assert "cookie" not in r0.clean_text
    assert r0.clean_text == (" ".join([f"u0w{j}" for j in range(10)])
                             + " " + " ".join([f"v0w{j}" for j in range(10)]))
    assert r0.kept_segs == 2 and r0.dropped_segs == 1


def test_within_doc_dedup_keeps_first_occurrence(spark):
    """A doc repeating its own 10-word block keeps ONE copy in place
    (even though no other doc shares it — the line_dedup complement);
    a doc of all-unique segments is untouched; order is preserved."""
    from webextract.corpus import within_doc_dedup
    blk = " ".join([f"own{j}" for j in range(10)])
    uniq1 = " ".join([f"a{j}" for j in range(10)])
    uniq2 = " ".join([f"b{j}" for j in range(10)])
    docs = spark.createDataFrame(
        [(0, " ".join([blk, uniq1, blk, uniq2, blk])),
         (1, uniq1 + " " + uniq2)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in within_doc_dedup(docs).collect()}
    assert got[0].clean_text == " ".join([blk, uniq1, uniq2])
    assert got[0].kept_segs == 3 and got[0].dropped_segs == 2
    assert got[1].clean_text == uniq1 + " " + uniq2
    assert got[1].kept_segs == 2 and got[1].dropped_segs == 0


def test_c4_quality_rules(spark):
    """Each C4 rejection fires independently: lorem ipsum (case-
    insensitive), '{', too few sentences, too few long sentences."""
    from webextract.corpus import c4_quality
    good = ("The first sentence has enough words. The second one "
            "also has plenty here. And a third sentence closes the "
            "page nicely.")
    docs = spark.createDataFrame(
        [(0, good),
         (1, good + " Lorem Ipsum dolor."),
         (2, good + " var x = {"),
         (3, "Short one. Too tiny. Nope."),       # sentences too short
         (4, "One long sentence with many words but only one")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in c4_quality(docs).collect()}
    assert got[0].pass_c4
    assert not got[1].pass_c4 and got[1].has_lorem
    assert not got[2].pass_c4 and got[2].has_brace
    assert not got[3].pass_c4 and got[3].n_good_sents == 0
    assert not got[4].pass_c4 and got[4].n_sents == 1
    assert got[0].n_sents == 3 and got[0].n_good_sents == 3


def test_repetition_suite_hand_computed(spark):
    """26-token doc whose first 10 words repeat once: every fraction
    is hand-computed (6 dup 5-grams, 1 dup 10-gram, count-major top
    pick), and an all-unique doc passes every cap."""
    from webextract.corpus import repetition_suite
    rep = " ".join("abcdefghij") + " " + " ".join("abcdefghij") \
        + " " + " ".join("klmnop")          # n_chars = 51
    uniq = " ".join(f"t{i:02d}" for i in range(26))   # n_chars = 103
    docs = spark.createDataFrame([(0, rep), (1, uniq)],
                                 "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_suite(docs).collect()}
    r0 = got[0]
    assert r0.top2_frac == round(2 * 3 / 51, 4)       # "a b" x2
    assert r0.top3_frac == round(2 * 5 / 51, 4)
    assert r0.top4_frac == round(2 * 7 / 51, 4)
    assert r0.dup5_frac == round(6 * 2 * 9 / 51, 4)   # 6 grams x2 x 9ch
    assert r0.dup10_frac == round(2 * 19 / 51, 4)     # 1 gram x2 x 19ch
    assert not r0.pass_rep_suite
    r1 = got[1]
    assert r1.dup5_frac == 0.0 and r1.dup10_frac == 0.0
    assert r1.top2_frac == round(7 / 103, 4)          # longest cnt-1 gram
    assert r1.pass_rep_suite


def test_nb_quality_separates_classes(spark):
    """Self-distillation on a separable corpus: gopher-pass docs share
    one vocabulary, gopher-fail docs (too short) another — the NB
    margin must reproduce every weak label, and n_tok is exact."""
    from webextract.corpus import nb_quality
    def good(i):
        return "the it " + " ".join(
            f"w{i}x{j % 7}" for j in range(58))       # 60 words, passes
    docs = spark.createDataFrame(
        [(0, good(0)), (1, good(1)), (2, good(2)),
         (3, "junk0 junk1 junk2"), (4, "junk0 junk3 junk4")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in nb_quality(docs).collect()}
    assert [got[i].label for i in range(5)] == [True] * 3 + [False] * 2
    for i in range(5):
        assert got[i].nb_pred == got[i].label, got[i]
        assert (got[i].margin_micro > 0) == got[i].label
    assert got[0].n_tok == 60 and got[3].n_tok == 3


def test_vocab_stats_hand_computed(spark):
    """'a a b c' + 'a d': 6 tokens, 4 types, hapax {b,c,d}=3,
    ttr=4/6, hapax_frac=3/4."""
    from webextract.corpus import vocab_stats
    docs = spark.createDataFrame([(0, "a a b c"), (1, "a d")],
                                 "doc_id long, text string")
    r = vocab_stats(docs).collect()[0]
    assert (r.n_tokens, r.vocab, r.hapax) == (6, 4, 3)
    assert r.ttr == round(4 / 6, 6) and r.hapax_frac == 0.75


def test_cocitation_cap_and_threshold(spark):
    """(h1,h2) co-cited from 4 sources survives the >=3 bar; a pair
    seen once drops; a 5-target link-farm source drops at deg_cap=4;
    duplicate (src,dst) edges count once."""
    from webextract.corpus import cocitation_pairs
    edges = [(0, 1), (0, 2), (0, 3),
             (1, 1), (1, 2), (1, 2),
             (2, 1), (2, 2),
             (3, 1), (3, 2),
             (4, 10), (4, 11), (4, 12), (4, 13), (4, 14)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = cocitation_pairs(e, deg_cap=4, min_cocite=3).collect()
    assert len(got) == 1
    assert (got[0].host_a, got[0].host_b, got[0].n_cocite) == (1, 2, 4)


def test_degree_stats_hill_alpha(spark):
    """Hand-built in-degrees {4, 2, 1}: n_tail=2, s=round(ln2*1e6),
    alpha exact; an all-d_min tail makes the estimator undefined
    (alpha null)."""
    import math
    from webextract.corpus import degree_stats
    e = spark.createDataFrame(
        [(i, 1) for i in range(4)] + [(0, 2), (1, 2), (5, 3)],
        "src long, dst long")
    r = degree_stats(e).collect()[0]
    assert (r.n_hosts, r.max_indeg, r.n_tail) == (3, 4, 2)
    assert r.alpha == round(1.0 + 2 * 1e6 / round(math.log(2) * 1e6), 4)
    flat = spark.createDataFrame([(0, 1), (1, 1), (2, 2), (3, 2)],
                                 "src long, dst long")
    assert degree_stats(flat).collect()[0].alpha is None


def test_pmi_pairs_hand_computed(spark):
    """Alternating 'a b' doc: (a,b) co-occurs at distance 1 (11x),
    (a,a)/(b,b) at distance 2 (5x each); PMI matches the exact
    double-expression the operator pins, positive for the collocation
    and negative for the same-word pairs."""
    import math
    from webextract.corpus import pmi_pairs
    docs = spark.createDataFrame([(0, " ".join("ab" * 6))],
                                 "doc_id long, text string")
    got = {(r.w_a, r.w_b): r for r in pmi_pairs(docs).collect()}
    assert set(got) == {("a", "b"), ("a", "a"), ("b", "b")}
    assert got[("a", "b")].n_pair == 11
    assert got[("a", "a")].n_pair == 5 and got[("b", "b")].n_pair == 5
    exp_ab = round(math.log(11.0 * 12 * 12 / 21 / 6 / 6) * 1e6)
    assert got[("a", "b")].pmi_micro == exp_ab
    assert got[("a", "b")].pmi_micro > 0 > got[("a", "a")].pmi_micro


def test_pmi_pairs_short_docs_no_crash(spark):
    """1- and 2-token docs must contribute empty pair arrays, never an
    element_at(toks, 0) job abort (Spark sequence(1, 0) counts DOWN)."""
    from webextract.corpus import pmi_pairs
    docs = spark.createDataFrame(
        [(0, "solo"), (1, "two words"), (2, " ".join("ab" * 6))],
        "doc_id long, text string")
    got = {(r.w_a, r.w_b): r.n_pair for r in pmi_pairs(docs).collect()}
    assert got[("a", "b")] == 11   # the long doc still counts


def test_mirror_hosts_cap_and_threshold(spark):
    """A text on 3 hosts is dropped by host_cap=2 (boilerplate, not a
    mirror); the surviving pair needs >= min_shared distinct shared
    texts; per-host url duplicates of one text count once."""
    from webextract.corpus import mirror_hosts
    rows = [(1, "h0", "s1"), (2, "h1", "s1"), (3, "h2", "s1"),
            (4, "h0", "s2"), (5, "h1", "s2"),
            (6, "h0", "s3"), (7, "h1", "s3"),
            (8, "h0", "s4"), (9, "h1", "s4"), (10, "h1", "s4"),
            (11, "h2", "only")]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    got = mirror_hosts(docs, host_cap=2, min_shared=3).collect()
    assert len(got) == 1
    assert (got[0].host_a, got[0].host_b, got[0].shared_docs) \
        == ("h0", "h1", 3)


def test_tfidf_topk_ranks_rare_terms_first(spark):
    """A corpus-unique repeated term must outrank the everywhere-term
    (idf 0), with exact integer micro-nat scores."""
    import math
    from webextract.corpus import tfidf_topk
    docs = spark.createDataFrame(
        [(0, "zzz zzz common common"), (1, "common common aaa"),
         (2, "common bbb")],
        "doc_id long, text string")
    got = {(r.doc_id, r.rank): r for r in tfidf_topk(docs).collect()}
    idf1 = round(math.log(4 / 2) * 1e6)        # df=1 under N=3
    assert got[(0, 1)].tok == "zzz"
    assert got[(0, 1)].score_micro == 2 * idf1
    assert got[(0, 2)].tok == "common" and got[(0, 2)].score_micro == 0
    assert got[(1, 1)].tok == "aaa" and got[(2, 1)].tok == "bbb"


def test_inverted_postings_caps_hot_tokens(spark):
    """A token in 20 docs keeps df=20 but only the first 16 ascending
    doc_ids in its posting block; a cold token keeps all of them."""
    from webextract.corpus import inverted_postings
    rows = [(i, "hot cold" if i < 3 else "hot") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.tok: r for r in inverted_postings(docs).collect()}
    assert got["hot"].df == 20
    assert got["hot"].postings == ",".join(str(i) for i in range(16))
    assert got["cold"].df == 3 and got["cold"].postings == "0,1,2"


def test_len_quantiles_histogram_probe(spark):
    """Hand-built histogram: 8 docs in bucket 2, one in 10, one in 16
    — p50 lands in bucket 2 (cum 0.8), p90 in 10, p99 in 16."""
    from webextract.corpus import len_quantiles
    rows = [(i, 4) for i in range(8)] + [(8, 1024), (9, 100000)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {r.q: r for r in len_quantiles(docs).collect()}
    assert got[0.5].bucket == 2 and got[0.5].lo_bound == 4 \
        and got[0.5].cum_frac == 0.8
    assert got[0.9].bucket == 10 and got[0.9].lo_bound == 1024
    assert got[0.99].bucket == 16 and got[0.99].cum_frac == 1.0


def test_lm_perplexity_orders_rare_above_common(spark):
    """Docs made of corpus-rare tokens must score strictly higher
    perplexity than docs of corpus-common tokens, and a hand-computed
    two-token corpus pins the smoothing arithmetic."""
    import math
    from webextract.corpus import lm_perplexity
    rows = ([(i, "common common common") for i in range(20)]
            + [(100, "common common rare")])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in lm_perplexity(docs).collect()}
    assert got[100].ppl > got[0].ppl
    # hand-pin doc 0: c_common=62, c_rare=1, N=63, V=2, k=0.5
    lp = -math.log((62 + 0.5) / (63 + 0.5 * 2))
    micro = round(lp * 1e6)
    want = round(micro * 3 / 1e6 / 3, 6)
    assert abs(got[0].mean_nll - want) < 1e-9
    assert got[0].n_tok == 3


def test_decontaminate_span_semantics(spark):
    """Hand-pinned removal spans: a matched 3-gram drops exactly its
    3 tokens, OVERLAPPING matches merge their cover (4 tokens for two
    grams sharing 2), untouched docs pass through verbatim, and the
    probe doc itself never appears in the output."""
    from webextract.corpus import decontaminate
    rows = [(0, "a b c d e"),            # probe (doc_id % 50 == 0)
            (1, "x a b c y"),            # one matched gram -> drop 3
            (2, "p q r s"),              # clean
            (3, "a b c d z")]            # two overlapping grams -> 4
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in decontaminate(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].clean_text == "x y" and got[1].n_removed == 3 \
        and got[1].n_tok == 5
    assert got[2].clean_text == "p q r s" and got[2].n_removed == 0
    assert got[3].clean_text == "z" and got[3].n_removed == 4


def test_image_dhash_neardup_group_structure(spark):
    """The dHash near-dup path: every within-group pair (groups of 4
    share a texture, members differ in a 2x2 corner) is recovered at
    hamming <= 2, and the perturbation provably confines bit flips to
    the first band (bands 1-3 identical across one group)."""
    from webextract import media
    from webextract.corpus import dhash_neardup
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    hashes = media.dhash_frame(media.with_neardup_bmp_media(docs))
    hrows = {r.doc_id: (r.dh_hi, r.dh_lo) for r in hashes.collect()}
    assert len(hrows) == 8 and all(v[0] is not None for v in hrows.values())
    # bands 1-3 (hi low-16, lo halves) identical within group 0..3
    for d in (1, 2, 3):
        assert hrows[d][0] % 65536 == hrows[0][0] % 65536
        assert hrows[d][1] == hrows[0][1]
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in dhash_neardup(hashes).collect()}
    for a in range(4):
        for b in range(a + 1, 4):
            assert got[(a, b)] <= 2, (a, b, got.get((a, b)))
    for a, b in got:
        if a < 4 <= b:
            raise AssertionError(f"cross-group pair {(a, b)} leaked")


def test_ccnet_buckets_tertile_split(spark):
    """Three clearly-separated perplexity tiers land in head / middle /
    tail exactly (3/3/3), and the labels are monotone in mean_nll
    (every head score <= every middle score <= every tail score)."""
    from webextract.corpus import ccnet_buckets
    rows = ([(i, "common common common common") for i in range(3)]
            + [(10 + i, f"common common mid{i} common") for i in range(3)]
            + [(20 + i, f"rare{i}a rare{i}b rare{i}c rare{i}d")
               for i in range(3)])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = ccnet_buckets(docs).collect()
    by = {"head": [], "middle": [], "tail": []}
    for r in got:
        by[r.bucket].append(r)
    assert {k: len(v) for k, v in by.items()} == \
        {"head": 3, "middle": 3, "tail": 3}
    assert {r.doc_id for r in by["head"]} == {0, 1, 2}
    assert {r.doc_id for r in by["tail"]} == {20, 21, 22}
    assert max(r.mean_nll for r in by["head"]) \
        <= min(r.mean_nll for r in by["middle"])
    assert max(r.mean_nll for r in by["middle"]) \
        <= min(r.mean_nll for r in by["tail"])


def test_pack_sequences_contiguous_and_bounded(spark):
    """Within every shard the packed stream is gapless (each doc
    starts where the previous ended), offsets stay under the budget,
    and seq_first/seq_last bracket the doc's token span."""
    from webextract.corpus import pack_sequences
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))
    rows = sorted(pack_sequences(docs, budget=100, shards=4).collect(),
                  key=lambda r: (r.shard, r.doc_id))
    by_shard: dict = {}
    for r in rows:
        assert 0 <= r.shard < 4
        assert 0 <= r.seq_offset < 100
        assert r.seq_first <= r.seq_last
        before = by_shard.get(r.shard, 0)
        assert r.seq_first == before // 100
        assert r.seq_offset == before % 100
        assert r.seq_last == (before + r.n_tok - 1) // 100
        by_shard[r.shard] = before + r.n_tok
    assert len(by_shard) == 4


def test_canonical_url_table(spark):
    """Spelling variants that MUST collapse, and ones that must not."""
    from webextract.corpus import canonical_url
    cases = [
        ("http://Ex.COM/a", "http://ex.com/a"),
        ("HTTP://EX.COM:80/a/", "http://ex.com/a"),
        ("http://ex.com/a#frag", "http://ex.com/a"),
        ("https://ex.com:443/", "https://ex.com/"),
        ("https://ex.com:8443/", "https://ex.com:8443/"),
        ("http://ex.com:8080/a", "http://ex.com:8080/a"),
        ("http://ex.com", "http://ex.com/"),
        ("http://ex.com/a?b=2&a=1", "http://ex.com/a?a=1&b=2"),
        ("http://ex.com/a?b=2&a=1#f", "http://ex.com/a?a=1&b=2"),
        ("http://ex.com//", "http://ex.com/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_bitext_mine_hand_reference(spark):
    """Margin mining on 5 hand-computed 2-d vectors (all in the y>x
    half-space so the bits=1 SRP plane co-buckets everything): each
    source's parallel twin (cos=1.0) wins, and the emitted basis
    points match the bigint margin formula computed by hand —
    (1,11) 10297, (2,13) 10408; every cross pair's margin was derived
    independently of the engine."""
    from pyspark.sql import functions as F

    from webextract import corpus

    rows = [(1, "en", [1.0, 2.0]), (2, "en", [0.0, 1.0]),
            (11, "de", [2.0, 4.0]), (12, "de", [1.0, 3.0]),
            (13, "de", [0.0, 2.0])]
    emb = spark.createDataFrame(
        rows, "vec_id long, lang string, embedding array<double>")
    got = sorted(tuple(r) for r in corpus.bitext_mine(
        emb, "en", "de", k=2, bits=1, margin_bp=10000).collect())
    assert got == [(1, 11, 1000000, 10297), (2, 13, 1000000, 10408)]


def test_bitext_mine_margin_demotes_hub(spark):
    """A hub target near EVERY source must lose to a specific twin
    even when its raw cosine to some source is higher than that
    source's twin cosine — the property raw-cosine mining lacks."""
    from webextract import corpus

    # en sources fan around (1,2); de: one hub at the fan's center,
    # one twin parallel to src 3.  Hub beats twin on raw cos for
    # src 3?  No — construct so hub ties high with everyone (its
    # neighborhood mean is high, so its margin is LOW), while the
    # twin's neighborhood is only src 3 and src 1 (lower mean).
    rows = [(1, "en", [1.0, 2.0]), (2, "en", [1.2, 2.1]),
            (3, "en", [0.5, 3.0]),
            (21, "de", [1.1, 2.2]),          # hub: near all sources
            (22, "de", [0.5, 3.0])]          # twin of src 3
    emb = spark.createDataFrame(
        rows, "vec_id long, lang string, embedding array<double>")
    out = {r["src_id"]: (r["tgt_id"], r["margin_bp"])
           for r in corpus.bitext_mine(emb, "en", "de", k=2, bits=1,
                                       margin_bp=0).collect()}
    assert out[3][0] == 22            # twin wins for its source
    # the hub IS the best for src 1/2 (they have no twin) but its
    # margin is depressed toward 1.0 by its own crowded neighborhood
    assert out[3][1] > out[1][1]


def test_c4_span_dedup_hand_reference(spark):
    """Hand table: the shared three-sentence block survives only in
    its first (min doc_id, min position) occurrence; later docs drop
    exactly those three sentences; short docs pass untouched.  The
    final sentence keeps its trailing period after the '. ' split, so
    doc 4's terminal span ('C three.') is DISTINCT from doc 1's
    interior span ('C three') and survives — and doc 5, which repeats
    the block both interior and terminal, loses position 0-2 to
    doc 1's span and 3-5 to doc 4's."""
    from webextract import corpus

    docs = spark.createDataFrame(
        [(1, "A one. B two. C three. X tail1."),
         (2, "A one. B two. C three. Y tail2."),
         (3, "Z only. Two."),
         (4, "A one. B two. C three."),
         (5, "A one. B two. C three. A one. B two. C three.")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["kept_sents"],
                         r["dropped_sents"])
           for r in corpus.c4_span_dedup(docs).collect()}
    assert got == {
        1: ("A one. B two. C three. X tail1.", 4, 0),
        2: ("Y tail2.", 1, 3),
        3: ("Z only. Two.", 2, 0),
        4: ("A one. B two. C three.", 3, 0),
        5: ("", 0, 6),
    }
