"""PageRank + heavy-hitters unit tests: exact-integer semantics vs a
Python reference, MG summary bounds, partitioning invariance, guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from webextract import corpus

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------- pagerank

def _pr_ref(edges, iters=3, num=85, den=100, scale=10 ** 6):
    """Driver-side integer reference of the exact recurrence."""
    e = [(s, d) for s, d in edges if s != d]
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outdeg: dict = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (scale * (den - num)) // den
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        infl = {n: 0 for n in nodes}
        for s, d in e:
            infl[d] += (rank[s] * num) // (outdeg[s] * den)
        rank = {n: base + infl[n] for n in nodes}
    return rank


def test_pagerank_matches_integer_reference(spark):
    """Hub-skewed deterministic multigraph: Spark result must equal the
    Python integer recurrence node-for-node (bit-exact, no floats)."""
    edges = []
    for i in range(300):
        edges.append((i % 37, (i * 17 + 5) % 37))
        edges.append((i % 37, (i * 29 + 11) % 7))  # 7-host hub tier
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micro"]
           for r in corpus.pagerank(df).collect()}
    assert got == _pr_ref(edges)


def test_pagerank_selfloop_dropped_dangling_base(spark):
    """Self-loops are removed; a dangling node (in-links only) still
    appears with base + inflow; a node with no in-links sits at base
    after round 1+."""
    edges = [(1, 2), (2, 2), (2, 3), (3, 3)]
    # after self-loop removal: 1->2, 2->3 ; node 3 dangling, node 1 no
    # in-links
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micro"]
           for r in corpus.pagerank(df).collect()}
    ref = _pr_ref(edges)
    assert got == ref
    assert got[1] == 150000  # no in-links: pure base
    assert set(got) == {1, 2, 3}


def test_pagerank_partitioning_invariant(spark):
    """Same graph through 1 partition and 16 partitions gives
    identical ranks (integer sums are order-independent)."""
    edges = [((i * 7) % 23, (i * 13 + 3) % 23) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank_micro"]
         for r in corpus.pagerank(df.coalesce(1)).collect()}
    b = {r["node"]: r["rank_micro"]
         for r in corpus.pagerank(df.repartition(16)).collect()}
    assert a == b == _pr_ref(edges)


# ------------------------------------------------------------------- HITS

def _hits_ref(edges, iters=3, scale=10 ** 6):
    """Driver-side integer reference: sum + max-normalize half-rounds."""
    e = [(s, d) for s, d in edges if s != d]
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    hub = {n: scale for n in nodes}
    auth = {n: scale for n in nodes}
    for _ in range(iters):
        a_raw = {n: 0 for n in nodes}
        for s, d in e:
            a_raw[d] += hub[s]
        mx = max(a_raw.values())
        auth = {n: (a_raw[n] * scale) // mx for n in nodes}
        h_raw = {n: 0 for n in nodes}
        for s, d in e:
            h_raw[s] += auth[d]
        mx = max(h_raw.values())
        hub = {n: (h_raw[n] * scale) // mx for n in nodes}
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_integer_reference(spark):
    """Hub-skewed multigraph (parallel edges included): Spark must
    equal the Python integer recurrence bit-for-bit, and the max-score
    node must sit exactly at the 10^6 normalization ceiling."""
    edges = []
    for i in range(300):
        edges.append((i % 37, (i * 17 + 5) % 37))
        edges.append((i % 37, (i * 29 + 11) % 7))  # 7-host authority tier
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub_micro"], r["auth_micro"])
           for r in corpus.hits(df).collect()}
    assert got == _hits_ref(edges)
    assert max(a for _, a in got.values()) == 10 ** 6
    assert max(h for h, _ in got.values()) == 10 ** 6


def test_hits_hub_authority_split(spark):
    """A pure directory page (out-links only) must score hub>0 auth=0;
    a pure target (in-links only) auth>0 hub=0 — the split pagerank
    cannot express."""
    edges = [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub_micro"], r["auth_micro"])
           for r in corpus.hits(df).collect()}
    assert got == _hits_ref(edges)
    for hub_node in (1, 2, 3):
        assert got[hub_node][0] > 0 and got[hub_node][1] == 0
    for auth_node in (10, 11):
        assert got[auth_node][0] == 0 and got[auth_node][1] > 0
    assert got[1][0] == 10 ** 6 and got[10][1] == 10 ** 6


def test_hits_partitioning_invariant(spark):
    """Same graph through 1 and 16 partitions: identical scores
    (integer sums + a single global max are order-independent)."""
    edges = [((i * 7) % 23, (i * 13 + 3) % 23) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: (r["hub_micro"], r["auth_micro"])
         for r in corpus.hits(df.coalesce(1)).collect()}
    b = {r["node"]: (r["hub_micro"], r["auth_micro"])
         for r in corpus.hits(df.repartition(16)).collect()}
    assert a == b == _hits_ref(edges)


# ----------------------------------------------------------- heavy hitters

def _hh_docs(spark, n_docs=120, tail_per_doc=4):
    """Heavy zipf-ish head (alpha 6x, beta 4x, gamma 2x per doc — all
    above the 1/10 share bar; epsilon 1x sits below it) + a distinct
    one-off tail far above any test capacity."""
    rows = []
    for i in range(n_docs):
        head = (["alpha"] * 6 + ["beta"] * 4 + ["gamma"] * 2
                + ["epsilon"])
        tail = [f"u{i}x{j}" for j in range(tail_per_doc)]
        rows.append((i, " ".join(head + tail)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute(spark, docs, den):
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    total = toks.count()
    return {(r["token"], r["freq"]) for r in
            toks.groupBy("token").agg(F.count("*").alias("freq"))
            .filter(F.col("freq") * den >= F.lit(total)).collect()}


def test_heavy_hitters_exact_vs_bruteforce(spark):
    """Output must equal brute-force GROUP BY HAVING row-for-row even
    when the distinct tail (480 one-off tokens) dwarfs capacity=16 and
    MG compression fires repeatedly."""
    docs = _hh_docs(spark)
    got = {(r["token"], r["freq"]) for r in
           corpus.heavy_hitters(docs, capacity=16,
                                min_share_den=10).collect()}
    assert got == _brute(spark, docs, 10)
    assert {t for t, _ in got} == {"alpha", "beta", "gamma"}


def test_heavy_hitters_partitioning_invariant(spark):
    """Candidate sets differ per partitioning; the final exact frame
    must not."""
    docs = _hh_docs(spark)
    a = {(r["token"], r["freq"]) for r in
         corpus.heavy_hitters(docs.coalesce(1), capacity=16,
                              min_share_den=10).collect()}
    b = {(r["token"], r["freq"]) for r in
         corpus.heavy_hitters(docs.repartition(16), capacity=16,
                              min_share_den=10).collect()}
    assert a == b


def test_mg_candidates_bounded_per_partition(spark):
    """The MG summary is the whole point: no partition may emit more
    than `capacity` candidate rows regardless of distinct count."""
    docs = _hh_docs(spark, n_docs=200, tail_per_doc=30)
    cands = corpus.mg_candidates(docs.repartition(8), capacity=16)
    per_part = (cands.select(F.spark_partition_id().alias("p"))
                .groupBy("p").count().collect())
    assert per_part, "no candidate partitions produced"
    assert max(r["count"] for r in per_part) <= 16


def test_heavy_hitters_capacity_guard(spark):
    """capacity < min_share_den would break the no-false-negative
    guarantee — must refuse loudly."""
    docs = _hh_docs(spark, n_docs=5)
    with pytest.raises(ValueError, match="capacity"):
        corpus.heavy_hitters(docs, capacity=8, min_share_den=100)


# ------------------------------------------------------------ link graph

def test_parse_anchors_engine_parity_and_edges(spark):
    """fast and stdlib tokenizers must agree on anchors for synth pages
    and adversarial fragments (nested <a>, bare <a>, unterminated)."""
    from webextract.dom import parse_anchors
    from webextract.docpages import build_page
    from webextract import synth
    cases = [build_page(i, "alpha beta gamma", article_links=i % 3)
             for i in range(8)]
    cases += [synth.gen_page(i)["html"] for i in range(40)]
    cases += [b'<p><a href="/x">one <b>two</b></a><a>bare</a>',
              b'<a href="/o">out <a href="/i">in</a> tail</a>',
              b'<a href="/u">never closed',
              b'<nav><a href="/n">Nav</a></nav><article><a href="/c">C</a></article>']
    for html in cases:
        assert parse_anchors(html, "fast") == parse_anchors(html, "stdlib")
    got = parse_anchors(cases[-1])
    assert got == [("/n", "Nav", True, False), ("/c", "C", False, True)]


def test_links_df_rows_and_order(spark):
    """28 anchors per page in document order; empty payloads skipped."""
    from webextract.docpages import docs_to_pages
    from webextract.pipeline import links_df
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(20))
    out = links_df(docs_to_pages(docs, article_links=2,
                                 empty_mod=7)).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    for u, rows in by_url.items():
        assert [r["link_no"] for r in
                sorted(rows, key=lambda r: r["link_no"])] == list(range(28))
    # empty_mod=7 drops doc_id % 7 == 3 pages entirely
    assert all(int(u[6:]) % 7 != 3 for u in by_url)


def test_extraction_block_parity_unchanged_by_anchor_capture(spark):
    """parse_blocks output must be byte-identical whether or not the
    parser was built with capture_anchors (the flag may not perturb
    block assembly)."""
    from webextract import synth
    from webextract.dom import _run_parser
    for i in range(30):
        html = synth.gen_page(i)["html"]
        plain = _run_parser(html, "fast").blocks
        capt = _run_parser(html, "fast", capture_anchors=True).blocks
        assert plain == capt
