"""Mergeable-sketch family: HLL cardinality + Bloom membership.

The properties that make these SKETCHES rather than queries: bounded
state, mergeability across corpus slices, one-sided error — each
pinned here; engine-exactness is the oracle gates' job
(sketch_hll_distinct, url_seen_bloom)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webextract import corpus

SF = "/root/testdata/sf0.01"


def _docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    s = F.col("doc_id").cast("string")
    aug = F.concat(F.col("text"), *[x for i in range(32)
                                    for x in (F.lit(f" u{i}x"), s)])
    return d.select("doc_id", "source", aug.alias("text"))


def _urls(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    url = F.concat(F.lit("http://h"), (F.col("doc_id") % 13).cast("string"),
                   F.lit(".example.com/p/"), F.col("doc_id").cast("string"))
    return d.select("doc_id", url.alias("url"))


def test_hll_registers_merge(spark):
    """Mergeability (Agarwal et al. PODS'12): registers built on two
    disjoint halves, unioned and max-merged by (source, idx), equal
    the registers of the whole corpus — so per-snapshot register
    tables compose incrementally."""
    docs = _docs(spark)
    full = corpus.hll_registers(docs)
    h1 = corpus.hll_registers(docs.filter(F.col("doc_id") % 2 == 0))
    h2 = corpus.hll_registers(docs.filter(F.col("doc_id") % 2 == 1))
    merged = (h1.unionByName(h2).groupBy("source", "idx")
              .agg(F.max("m_j").alias("m_j")))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, full.collect()))


def test_hll_state_bound_and_accuracy(spark):
    """State: <= sources x 256 register rows regardless of corpus
    size; raw estimate within ~4 sigma (26%) of exact in its valid
    regime, with the small-range flag off."""
    out = corpus.hll_distinct(_docs(spark)).collect()
    assert len(out) == 20
    for r in out:
        assert r["registers_set"] <= 256
        assert not r["small_range"]
        assert r["rel_err_bp"] < 2600, r


def test_hll_small_range_flag(spark):
    """Below 2.5m the raw estimate enters HLL's bias regime: the flag
    must fire (the ln() correction is left to the consumer — libm
    last-ulp behavior is not engine-portable) while the raw estimate
    is still returned."""
    tiny = (_docs(spark).limit(4)
            .select("doc_id", F.lit("one two three").alias("text"),
                    F.lit("s").alias("source")))
    r = corpus.hll_distinct(tiny).collect()
    assert len(r) == 1 and r[0]["small_range"]
    assert r[0]["exact_distinct"] == 3 and r[0]["est_distinct"] >= 1


def test_bloom_no_false_negatives_and_merge(spark):
    """One-sided error: every inserted url probes true.  Bitmaps of
    two halves OR-merge into the full bitmap (word-wise bit_or), the
    incremental-build contract."""
    urls = _urls(spark)
    committed = urls.filter(F.col("doc_id") % 3 == 0)
    bloom = corpus.bloom_build(committed)
    assert bloom.count() <= corpus.BLOOM_M_BITS // 63 + 1
    probed = corpus.bloom_probe(committed, bloom)
    assert probed.filter(~F.col("maybe_seen")).count() == 0

    b1 = corpus.bloom_build(committed.filter(F.col("doc_id") % 2 == 0))
    b2 = corpus.bloom_build(committed.filter(F.col("doc_id") % 2 == 1))
    merged = (b1.unionByName(b2).groupBy("word_idx")
              .agg(F.expr("bit_or(bits)").alias("bits")))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, bloom.collect()))


def test_bloom_probe_plan_zero_shuffle(spark):
    """Scale shape: probing never shuffles the candidate batch — k
    broadcast hash joins against the staged bitmap, no
    hashpartitioning exchange anywhere in the probe plan."""
    urls = _urls(spark)
    bloom = corpus.bloom_build(urls.filter(F.col("doc_id") % 3 == 0))
    probe = corpus.bloom_probe(urls, bloom)
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted")
    assert "hashpartitioning" not in plan    # formatted mode spells
    # shuffles as `Exchange (n)` + an Arguments: hashpartitioning line
    assert plan.count("BroadcastHashJoin") >= corpus.BLOOM_K


def test_hll_partial_agg_bounds_shuffle(spark):
    """The register build must carry a map-side partial max so at most
    sources x 256 rows leave any partition: two HashAggregates around
    the exchange (partial_max then max)."""
    regs = corpus.hll_registers(_docs(spark))
    plan = regs._sc._jvm.PythonSQLUtils.explainString(
        regs._jdf.queryExecution(), "formatted")
    assert "partial_max" in plan and "hashpartitioning" in plan


def test_normalize_text_nfc_and_controls(spark):
    """NFC composes decomposed sequences, control chars (C0 minus
    tab/newline, plus DEL) are stripped, tab/newline survive, and
    already-normalized rows flag changed=False."""
    rows = [(1, "cafe\u0301"),                 # e + combining acute
            (2, "ok\u0001x\u007f"),            # C0 + DEL stripped
            (3, "keep\tthis\nrow"),            # tab/newline survive
            (4, "plain ascii")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["text_norm"], r["changed"])
           for r in corpus.normalize_text(docs).collect()}
    assert out[1] == ("caf\u00e9", True)
    assert out[2] == ("okx", True)
    assert out[3] == ("keep\tthis\nrow", False)
    assert out[4] == ("plain ascii", False)


def test_normalize_text_plan_is_narrow(spark):
    """Zero shuffle: the normalization kernel is a narrow mapInArrow
    over the scan, like extraction."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = corpus.normalize_text(docs)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "hashpartitioning" not in plan


def test_weighted_sample_semantics(spark):
    """weight 0 keeps nothing, 1 keeps everything, clamping handles
    out-of-range weights, and the decision is content-independent:
    a doc's fate is identical whether sampled alone or in a corpus."""
    from webextract import corpus
    rows = [(i, w) for i, w in
            [(1, 0.0), (2, 1.0), (3, 2.5), (4, -1.0), (5, 0.5)]]
    docs = spark.createDataFrame(rows, "doc_id long, weight double")
    out = {r["doc_id"]: r["kept"]
           for r in corpus.weighted_sample(docs).collect()}
    assert out[1] is False and out[4] is False    # w<=0 never keeps
    assert out[2] is True and out[3] is True      # w>=1 always keeps
    solo = corpus.weighted_sample(docs.filter("doc_id = 5")).collect()
    assert solo[0]["kept"] == out[5]              # growth-stable


def test_parse_sitemaps_edges(spark):
    """Block-first extraction never pairs fields across <url> entries;
    the 5 XML entities decode with &amp; LAST (no double-decode);
    missing lastmod/priority map to NULL/-1; malformed entries without
    a <loc> drop out."""
    from webextract import corpus
    xml = ("<urlset>"
           "<url><loc>http://a/x&amp;lt;</loc>"
           "<priority>0.5</priority></url>"
           "<url><loc> http://a/y </loc>"
           "<lastmod>2026-01-02</lastmod></url>"
           "<url><lastmod>2026-09-09</lastmod></url>"
           "</urlset>")
    maps = spark.createDataFrame([("a", xml)],
                                 "host string, sitemap_xml string")
    rows = sorted(map(tuple, corpus.parse_sitemaps(maps).collect()))
    # &amp;lt; decodes the amp only: literal '&lt;' stays text
    assert rows == [("a", "http://a/x&lt;", None, 500000),
                    ("a", "http://a/y", "2026-01-02", -1)]


def test_sitemap_discovery_chain(spark):
    """The full discovery recursion composes: robots_sitemaps finds
    the index url, parse_sitemap_index expands it to child sitemaps,
    parse_sitemaps reads the leaves — and a malformed <priority> in
    an untrusted leaf yields -1 instead of an ANSI abort."""
    from webextract import corpus
    robots = spark.createDataFrame(
        [("a", "User-agent: *\nDisallow: /p\n"
               "Sitemap: http://a/index.xml\n")],
        "host string, robots_txt string")
    disc = corpus.robots_sitemaps(robots).collect()
    assert [(r["host"], r["sitemap_url"]) for r in disc] == \
        [("a", "http://a/index.xml")]

    idx_xml = ("<sitemapindex>"
               "<sitemap><loc> http://a/m1.xml </loc>"
               "<lastmod>2026-02-03</lastmod></sitemap>"
               "<sitemap><loc>http://a/m2&amp;.xml</loc></sitemap>"
               "<sitemap><lastmod>no-loc-drops</lastmod></sitemap>"
               "</sitemapindex>")
    idx = spark.createDataFrame([("a", idx_xml)],
                                "host string, sitemap_xml string")
    kids = sorted(map(tuple, corpus.parse_sitemap_index(idx).collect()))
    assert kids == [("a", "http://a/m1.xml", "2026-02-03"),
                    ("a", "http://a/m2&.xml", None)]

    leaf = ("<urlset><url><loc>http://a/page</loc>"
            "<priority>broken</priority></url></urlset>")
    leaves = spark.createDataFrame([("a", leaf)],
                                   "host string, sitemap_xml string")
    rows = corpus.parse_sitemaps(leaves).collect()
    assert [(r["url"], r["priority_micro"]) for r in rows] == \
        [("http://a/page", -1)]
