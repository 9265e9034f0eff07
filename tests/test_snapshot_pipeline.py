"""Daily-crawl composition: the table verbs and corpus operators are
designed to COMPOSE into the per-snapshot production loop —

    new wave commits -> read_changes (incremental scan)
                     -> incremental_dedup vs committed (admission)
                     -> sketch updates merge (HLL max, Bloom bit_or)

This test drives that whole loop end-to-end over an IceTable, across
a compaction, asserting the incremental path equals the full-read
path at every step — the contract that lets a 10^12-doc consumer
never re-read history."""

from __future__ import annotations

from pyspark.sql import functions as F

from webextract import corpus
from webextract.icetable import IceTable


def _commit_docs(spark, tbl, run_id, rows, band_keys=True):
    df = spark.createDataFrame(
        rows, "doc_id long, url string, text string, source string")
    out = tbl.staging_dir(run_id, 0)
    df.coalesce(1).write.mode("overwrite").parquet(out)
    import os
    files = sorted(os.path.join(out, f) for f in os.listdir(out)
                   if f.endswith(".parquet"))
    snap = tbl.commit(run_id, [{"part_id": hash(run_id) % 10000,
                                "files": files, "counters": {}}], "t")
    if band_keys:
        # the per-snapshot catalog artifact: band keys land WITH the
        # commit, so admission never re-shingles committed docs
        corpus.commit_band_keys(tbl, df, snap)
    return df


def _doc(i, text, source="web"):
    return (i, f"http://h{i % 5}.example.com/p/{i}", text, source)


def test_snapshot_loop_incremental_equals_full(spark, tmp_path):
    tbl = IceTable(str(tmp_path / "tbl"))

    # day 0: seed corpus
    day0 = [_doc(i, f"base page {i} " + " ".join(
        f"tok{i}x{j}" for j in range(12))) for i in range(40)]
    _commit_docs(spark, tbl, "day0", day0)
    snap0 = tbl.current_snapshot_id()

    # consumer bootstrap: since=None == full read even after compaction
    tbl.compact(spark, target_file_bytes=64 << 20, committed_at="tc")
    boot = tbl.read_changes(spark, since=None)
    assert boot.count() == 40
    snap_c = tbl.current_snapshot_id()

    # sketches over the bootstrap read (the committed-side artifacts)
    regs0 = corpus.hll_registers(boot)
    bloom0 = corpus.bloom_build(boot)

    # day 1: a new wave — 6 fresh docs + 2 near-dups of committed ones
    day1 = ([_doc(100 + i, f"fresh page {100 + i} " + " ".join(
        f"new{i}y{j}" for j in range(12))) for i in range(6)]
        + [_doc(200, day0[3][2] + " tiny tail"),
           _doc(201, day0[7][2])])
    _commit_docs(spark, tbl, "day1", day1)

    # incremental scan: exactly the new rows, nothing re-read
    inc = tbl.read_changes(spark, since=snap_c)
    assert sorted(r["doc_id"] for r in inc.select("doc_id").collect()) \
        == [100, 101, 102, 103, 104, 105, 200, 201]

    # admission consumes the STORED band-key artifact chain: day0's
    # keys were written at commit; the compaction snapshot heals its
    # own on first read (ensure_band_keys computes it from the rewrite
    # file set once) — the admission run itself never re-shingles
    # committed docs (old_band_keys short-circuits that plan branch)
    art = corpus.ensure_band_keys(tbl, spark, as_of=snap_c)
    verdict = corpus.incremental_dedup(boot, inc, threshold=0.3,
                                       old_band_keys=art)
    dups = {r["doc_id"]: r["dup_of"] for r in
            verdict.filter(F.col("dup_of").isNotNull()).collect()}
    assert dups == {200: 3, 201: 7}
    # artifact now exists for the rewrite snapshot: a second assembly
    # is pure reads (and equals the first)
    import os
    assert os.path.exists(tbl.artifact_dir("band_keys", snap_c))
    art2 = corpus.ensure_band_keys(tbl, spark, as_of=snap_c)
    assert sorted(map(tuple, art2.collect())) == \
        sorted(map(tuple, art.collect()))
    # and equals the recomputed-from-docs admission verdict
    verdict_rc = corpus.incremental_dedup(boot, inc, threshold=0.3)
    assert sorted(map(tuple, verdict_rc.collect())) == \
        sorted(map(tuple, verdict.collect()))

    # sketch maintenance is a MERGE of increment-only sketches, never
    # a recompute over history: must equal the from-scratch artifacts
    full = tbl.read(spark)
    regs_merged = (regs0.unionByName(corpus.hll_registers(inc))
                   .groupBy("source", "idx")
                   .agg(F.max("m_j").alias("m_j")))
    regs_full = corpus.hll_registers(full)
    assert sorted(map(tuple, regs_merged.collect())) == \
        sorted(map(tuple, regs_full.collect()))

    bloom_merged = (bloom0.unionByName(corpus.bloom_build(inc))
                    .groupBy("word_idx")
                    .agg(F.expr("bit_or(bits)").alias("bits")))
    bloom_full = corpus.bloom_build(full)
    assert sorted(map(tuple, bloom_merged.collect())) == \
        sorted(map(tuple, bloom_full.collect()))

    # and the merged Bloom answers the day-2 frontier question: every
    # committed url probes seen (no false negatives through the merge),
    # while a fresh url batch stays unseen (48 keys in 16384 bits —
    # false positives are possible but not 20/20)
    bm = bloom_merged.localCheckpoint()
    assert corpus.bloom_probe(full.select("doc_id", "url"), bm) \
        .filter(~F.col("maybe_seen")).count() == 0
    day2 = spark.createDataFrame(
        [(900 + i, f"http://h9.example.com/new/{i}") for i in range(20)],
        "doc_id long, url string")
    assert corpus.bloom_probe(day2, bm) \
        .filter(F.col("maybe_seen")).count() <= 2
