"""semantic_dedup + bpe_pair_counts unit tests: survivor rule on
hand-built clusters, quarantine cap, BPE counts vs a hand reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from webextract import corpus


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_semantic_dedup_min_id_survivor(spark):
    """Three exact copies of one direction + one orthogonal vector:
    the smallest vec_id of the duplicate set survives, the orthogonal
    vector is untouched, clusters come from the IVF quantizer."""
    rows = [(1, [1, 0, 0, 0]), (2, [1, 0, 0, 0]), (3, [1, 0, 0, 0]),
            (9, [0, 1, 0, 0])]
    out = {r["vec_id"]: r["keep"] for r in
           corpus.semantic_dedup(_emb_df(spark, rows), n_centroids=2,
                                 threshold=0.9).collect()}
    assert out == {1: True, 2: False, 3: False, 9: True}


def test_semantic_dedup_chain_rule(spark):
    """Greedy min-id semantics: b drops because of a even when b's own
    duplicate c is also dropped through b (chain a~b, b~c, a!~c)."""
    # unit vectors at 0deg, 25deg, 50deg: cos(25deg)=0.906 >= 0.9,
    # cos(50deg)=0.643 < 0.9
    import math
    rows = [(1, [1.0, 0.0]),
            (2, [math.cos(math.radians(25)), math.sin(math.radians(25))]),
            (3, [math.cos(math.radians(50)), math.sin(math.radians(50))])]
    out = {r["vec_id"]: r["keep"] for r in
           corpus.semantic_dedup(_emb_df(spark, rows), n_centroids=1,
                                 threshold=0.9).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_semantic_dedup_cap_quarantines(spark):
    """A cluster over bucket_cap generates NO pairs — all its members
    keep=true (the m^2 guard), instead of a silent partial answer."""
    rows = [(i, [1, 0, 0, 0]) for i in range(10)]
    out = corpus.semantic_dedup(_emb_df(spark, rows), n_centroids=1,
                                threshold=0.9, bucket_cap=4).collect()
    assert all(r["keep"] for r in out)
    assert len(out) == 10


def test_bpe_pair_counts_hand_reference(spark):
    """'low low lower' -> word freqs {low:2, lower:1}; pairs lo:3,
    ow:3, we:1, er:1 — ranks by (weight desc, pair asc)."""
    docs = spark.createDataFrame([(0, "low low lower")],
                                 "doc_id long, text string")
    got = [(r["pair"], r["weight"], r["rank"])
           for r in corpus.bpe_pair_counts(docs).orderBy("rank").collect()]
    assert got == [("lo", 3, 1), ("ow", 3, 2), ("er", 1, 3), ("we", 1, 4)]


def test_bpe_pair_counts_short_and_multibyte(spark):
    """1-char words contribute no pairs (sequence(1,0) guard); CJK
    pairs are character-based, not byte-based."""
    docs = spark.createDataFrame([(0, "a b 数据表 数据")],
                                 "doc_id long, text string")
    got = {r["pair"]: r["weight"]
           for r in corpus.bpe_pair_counts(docs).collect()}
    assert got == {"数据": 2, "据表": 1}


# ------------------------------------------------------------- BPE trainer

def _bpe_ref(word_freqs, n_merges):
    """Driver-side greedy BPE reference: count adjacent pairs over the
    word-frequency dict, merge the (count desc, lhs asc, rhs asc)
    argmax left-to-right non-overlapping, repeat."""
    segs = [([c for c in w], f) for w, f in sorted(word_freqs.items())]
    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for syms, f in segs:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get(
                    (syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (l, r), n = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, n))
        for idx, (syms, f) in enumerate(segs):
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[idx] = (out, f)
    return merges


def test_bpe_train_matches_greedy_reference(spark):
    """The classic Sennrich corpus plus a run-of-4 word: the merge
    TABLE (order, pairs, counts) must equal the greedy reference —
    including the left-to-right rule ('aaaa' yields TWO 'aa' symbols,
    so ('aa','aa') becomes countable) and the lexicographic argmax
    tie-break."""
    text = "low low low lower lower newest widest aaaa aaaa"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    wf = {"low": 3, "lower": 2, "newest": 1, "widest": 1, "aaaa": 2}
    got = [(r["rank"], r["lhs"], r["rhs"], r["n"])
           for r in corpus.bpe_train(docs, n_merges=6)
           .orderBy("rank").collect()]
    assert got == _bpe_ref(wf, 6)
    # the quad-run actually exercised the adjacent-merge rule
    assert ("a", "a") in {(l, r) for _, l, r, _ in got}


def test_bpe_train_exhaustion_and_guard(spark):
    """A vocabulary that fully merges before n_merges stops early
    instead of looping; non-ASCII words are excluded by the
    admission guard."""
    docs = spark.createDataFrame([(0, "ab ab 数据 数据")],
                                 "doc_id long, text string")
    got = [(r["lhs"], r["rhs"], r["n"])
           for r in corpus.bpe_train(docs, n_merges=5)
           .orderBy("rank").collect()]
    # only 'ab' is admissible: one merge then nothing left to pair
    assert got == [("a", "b", 2)]


def test_bpe_train_partitioning_invariant(spark):
    """Integer counts + totalized argmax: the merge table is identical
    at any parallelism."""
    rows = [(i, "hug hug hugs pug pugs pun bun hugs") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = [(r["rank"], r["lhs"], r["rhs"], r["n"]) for r in
         corpus.bpe_train(docs.coalesce(1), 5).orderBy("rank").collect()]
    b = [(r["rank"], r["lhs"], r["rhs"], r["n"]) for r in
         corpus.bpe_train(docs.repartition(16), 5)
         .orderBy("rank").collect()]
    wf = {"hug": 16, "hugs": 16, "pug": 8, "pugs": 8, "pun": 8,
          "bun": 8}
    assert a == b == _bpe_ref(wf, 5)


def test_bpe_segment_reproduces_trainer(spark):
    """encode(train corpus) == the trainer's final segmentation: token
    counts per doc must equal replaying _bpe_ref's segs; inadmissible
    words count one unknown token each."""
    text = "low low lower hug hugs 数据 aaaa"
    docs = spark.createDataFrame([(0, text), (1, "aaaa aaaa low")],
                                 "doc_id long, text string")
    merges = corpus.bpe_train(docs, n_merges=4)
    got = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in corpus.bpe_segment(docs, merges).collect()}

    # reference: replay the same merges over each doc's words
    mt = [(r["lhs"], r["rhs"])
          for r in merges.orderBy("rank").collect()]

    def ref_count(w):
        if not all("!" <= c <= "~" for c in w) or not w:
            return 1
        syms = list(w)
        for l, r in mt:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l \
                        and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    for did, t in ((0, text), (1, "aaaa aaaa low")):
        ws = t.split(" ")
        assert got[did] == (len(ws), sum(ref_count(w) for w in ws))


def test_training_export_manifest_hand_reference(spark):
    """The terminal composition's manifest equals a local replay:
    trained token counts -> md5-mod shard -> doc_id-ordered stream ->
    (n_docs, n_tokens, n_seqs, tail, positional checksum).  budget=5
    forces multi-sequence shards; a doc with NULL text contributes 0
    tokens but still occupies a stream position."""
    import hashlib

    rows = [(i, f"w{i} low low hug" if i != 7 else None)
            for i in range(24)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = corpus.bpe_train(docs, n_merges=4)
    got = {r["shard"]: r.asDict() for r in corpus.training_export(
        docs, merges, budget=5, shards=4, salt="pack1").collect()}

    seg = {r["doc_id"]: r["n_tokens"]
           for r in corpus.bpe_segment(docs, merges).collect()}
    streams: dict[int, list] = {}
    for i, _t in rows:
        h = hashlib.md5(f"pack1:{i}".encode()).hexdigest()
        streams.setdefault(int(h[:8], 16) % 4, []).append(i)
    assert sorted(got) == sorted(streams)
    for sh, ids in streams.items():
        toks = [seg[i] for i in sorted(ids)]
        total = sum(toks)
        m = got[sh]
        assert m["n_docs"] == len(ids)
        assert m["n_tokens"] == total
        assert m["n_seqs"] == (0 if total == 0 else (total - 1) // 5 + 1)
        assert m["tail_tokens"] == (
            0 if total == 0 else total - ((total - 1) // 5) * 5)
        assert m["pack_sum"] == sum(
            (p + 1) * t for p, t in enumerate(toks))


# ------------------------------------------------------------------ DSIR

def _dsir_docs(spark):
    """Two near-disjoint vocab domains: target docs (is_t) speak
    'physics quantum field', raw background speaks 'buy cheap pills'."""
    rows = []
    for i in range(40):
        rows.append((i, "physics quantum field theory lattice gauge",
                     "sci"))
    for i in range(40, 160):
        rows.append((i, "buy cheap pills now best price offer", "spam"))
    return spark.createDataFrame(rows,
                                 "doc_id long, text string, source string")


def test_dsir_separates_domains(spark):
    """Target-domain docs must score positive mean log-importance,
    background docs negative — and the flag must equal sign(s)."""
    docs = _dsir_docs(spark)
    out = {r["doc_id"]: r for r in
           corpus.dsir_weights(docs, F.col("source") == "sci").collect()}
    assert len(out) == 160
    assert all(out[i]["target_like"] and out[i]["mean_lw"] > 0
               for i in range(40))
    assert all(not out[i]["target_like"] and out[i]["mean_lw"] < 0
               for i in range(40, 160))


def test_dsir_partitioning_invariant(spark):
    """Integer micro-nat sums: identical scores at any parallelism."""
    docs = _dsir_docs(spark)
    a = {(r["doc_id"], r["mean_lw"]) for r in
         corpus.dsir_weights(docs.coalesce(1),
                             F.col("source") == "sci").collect()}
    b = {(r["doc_id"], r["mean_lw"]) for r in
         corpus.dsir_weights(docs.repartition(16),
                             F.col("source") == "sci").collect()}
    assert a == b


# ------------------------------------------------------------- frontier

def test_frontier_filter_rule_semantics(spark):
    """Domain block covers subdomains via the suffix equi-join; the
    path prefix is a residual; unrelated hosts sharing a suffix label
    ('xh3.example.com') must NOT match."""
    from pyspark.sql import functions as F
    pages = spark.createDataFrame(
        [(1, "http://h3.example.com/x"),
         (2, "http://deep.sub.h3.example.com/y"),
         (3, "http://xh3.example.com/x"),
         (4, "http://h7.example.com/ads/1"),
         (5, "http://h7.example.com/adstext"),
         (6, "http://h7.example.com/a/1"),
         (7, "http://h7.example.com"),
         (8, "HTTP-check://ignored"),
         ],
        "doc_id long, url string")
    rules = spark.createDataFrame(
        [("h3.example.com", ""), ("h7.example.com", "/ads")],
        "rule_host string, path_prefix string")
    from webextract import corpus
    got = {r["doc_id"]: r["blocked"]
           for r in corpus.frontier_filter(pages, rules).collect()}
    assert got == {1: True, 2: True, 3: False, 4: True,
                   5: True,  # prefix semantics: '/adstext' starts '/ads'
                   6: False, 7: False, 8: False}


def test_frontier_schedule_semantics(spark):
    """Fetch-queue assembly: priority = rank * (1 + change_bp) with
    unranked hosts and never-seen urls coalescing to base (0) rather
    than vanishing; per-host slots ordered by priority then url; the
    max_per_host cap trims queue tails."""
    from webextract import corpus
    cands = spark.createDataFrame(
        [("u/a", "h1"), ("u/b", "h1"), ("u/c", "h1"),
         ("u/d", "h2"),                      # unranked host
         ("u/e", "h3")],                     # ranked, never-seen url
        "url string, host string")
    ranks = spark.createDataFrame(
        [("h1", 2000000), ("h3", 500000)], "host string, rank_micro long")
    change = spark.createDataFrame(
        [("u/a", 10000), ("u/b", 0), ("u/d", 10000)],
        "url string, change_bp long")
    got = {r["url"]: (r["host"], r["priority_micro"], r["slot"])
           for r in corpus.frontier_schedule(cands, ranks,
                                             change).collect()}
    assert got["u/a"] == ("h1", 2000000 * 10001, 1)
    assert got["u/b"] == ("h1", 2000000, 2)
    assert got["u/c"] == ("h1", 2000000, 3)   # no history: rank * 1
    # u/b vs u/c tie at 2000000 -> url breaks it: 'u/b' < 'u/c'
    assert got["u/d"] == ("h2", 0, 1)         # unranked: base, still queued
    assert got["u/e"] == ("h3", 500000, 1)
    capped = corpus.frontier_schedule(cands, ranks, change,
                                      max_per_host=2)
    assert {r["url"] for r in capped.collect()} == {
        "u/a", "u/b", "u/d", "u/e"}


def test_frontier_schedule_plan_shape(spark):
    """host_rank broadcasts; exactly ONE window (the per-host queue);
    the candidate side is never shuffled more than once for it."""
    from tests.test_plans import _plan
    from webextract import corpus
    cands = spark.createDataFrame([("u", "h")], "url string, host string")
    ranks = spark.createDataFrame([("h", 1)], "host string, rank_micro long")
    change = spark.createDataFrame([("u", 1)], "url string, change_bp long")
    tree = _plan(corpus.frontier_schedule(
        cands, ranks, change)).split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert tree.count("Window") == 1


def _wp_ref(word_freq: dict, n: int) -> list:
    """Greedy WordPiece reference: like _bpe_ref but the argmax
    maximizes the quantized likelihood (n_pair * 10^9) // (n_l * n_r),
    tie-broken by (raw count desc, denominator asc, lhs, rhs)."""
    segs = [(list(w), f) for w, f in sorted(word_freq.items())]
    merges = []
    for rank in range(n):
        counts: dict = {}
        units: dict = {}
        for syms, f in segs:
            for s in syms:
                units[s] = units.get(s, 0) + f
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        scored = {k: (v * 10**9) // (units[k[0]] * units[k[1]])
                  for k, v in counts.items()}
        (l, r) = min(counts, key=lambda k: (
            -scored[k], -counts[k], units[k[0]] * units[k[1]],
            k[0], k[1]))
        merges.append((rank, l, r, counts[(l, r)], scored[(l, r)]))
        for idx, (syms, f) in enumerate(segs):
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[idx] = (out, f)
    return merges


def test_wordpiece_train_matches_greedy_reference(spark):
    """WordPiece's likelihood argmax against a greedy reference: 'qu'
    must merge FIRST (q never occurs apart from u) even though 'es'
    has a higher raw count — the selection rule that distinguishes it
    from BPE — and the full (rank, lhs, rhs, n, q) table must match."""
    text = ("quest quest quest queen es es es es es se se se "
            "essen essen")
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    wf = {"quest": 3, "queen": 1, "es": 5, "se": 3, "essen": 2}
    got = [(r["rank"], r["lhs"], r["rhs"], r["n"], r["q"])
           for r in corpus.wordpiece_train(docs, n_merges=4)
           .orderBy("rank").collect()]
    assert got == _wp_ref(wf, 4)
    assert (got[0][1], got[0][2]) == ("q", "u")
    # BPE on the same corpus picks by raw count instead — the two
    # trainers genuinely diverge on this vocabulary
    bpe0 = corpus.bpe_train(docs, n_merges=1).collect()[0]
    assert (bpe0["lhs"], bpe0["rhs"]) != ("q", "u")


def test_wordpiece_train_partitioning_invariant(spark):
    """Quantized-integer score + totalized argmax: the merge table is
    identical at any parallelism."""
    rows = [(i, "hug hug hugs pug pugs pun bun hugs") for i in range(8)]
    docs1 = spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1)
    docs8 = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(8)
    t1 = [tuple(r) for r in corpus.wordpiece_train(docs1, n_merges=5)
          .orderBy("rank").collect()]
    t8 = [tuple(r) for r in corpus.wordpiece_train(docs8, n_merges=5)
          .orderBy("rank").collect()]
    assert t1 == t8 and len(t1) == 5
