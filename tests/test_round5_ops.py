"""Hand-computed pins for the round-5 session-4 operators:
trustrank (seed-personalized PageRank), SQ8 scalar quantization,
readability, and audio silence segmentation.  Each test recomputes
the exact integer contract in plain Python on a fixture small enough
to verify by eye, so an engine-semantics drift fails HERE before the
oracle gate runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from webextract import corpus, media


def _trustrank_ref(edges, seeds, iters=3, num=85, den=100):
    """Plain-Python replay of the integer recurrence."""
    e = [(s, d) for s, d in edges if s != d]
    deg: dict = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted({n for p in e for n in p})
    scale = 1_000_000
    base = (scale * (den - num)) // den
    r = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        infl = {n: 0 for n in nodes}
        for s, d in e:
            infl[d] += (r[s] * num) // (deg[s] * den)
        r = {n: (base if n in seeds else 0) + infl[n] for n in nodes}
    return r


def test_trustrank_hand_graph(spark):
    # 0 (seed) -> 1 -> 2 -> 0; 3 -> 0; 4 -> 4 self-loop drops; 5 -> 3
    # (5 and the farm 3 are never teleported to: trust only flows in)
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (4, 4), (5, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["trust_micro"]
           for r in corpus.trustrank(e, seeds).collect()}
    assert got == _trustrank_ref(edges, {0})
    # unreached-from-seed nodes carry 0 teleport and only inherited mass
    assert got[3] == 0          # 5 starts at 0, so 3 receives nothing
    assert got[1] > got[2] > 0  # trust decays with seed distance


def test_trustrank_all_seed_equals_pagerank(spark):
    # seeding EVERY node degenerates to plain pagerank
    edges = [(0, 1), (1, 2), (2, 0), (0, 2)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(n,) for n in (0, 1, 2)],
                                  "node long")
    tr = {r["node"]: r["trust_micro"]
          for r in corpus.trustrank(e, seeds).collect()}
    pr = {r["node"]: r["rank_micro"]
          for r in corpus.pagerank(e).collect()}
    assert tr == pr


def _sq8_ref(vecs):
    dims = len(vecs[0])
    mns = [min(v[d] for v in vecs) for d in range(dims)]
    mxs = [max(v[d] for v in vecs) for d in range(dims)]
    out = []
    for v in vecs:
        codes = []
        for d in range(dims):
            span = mxs[d] - mns[d]
            if span > 0:
                codes.append(min(255, int(
                    round((v[d] - mns[d]) / span, 6) * 256 // 1)))
            else:
                codes.append(0)
        out.append(codes)
    return out


def test_sq8_encode_pins_and_integer_distance(spark):
    vecs = [[0.0, 5.0, 1.0, 1.0],
            [1.0, 5.0, 0.0, 3.0],
            [0.5, 5.0, 0.25, 2.0]]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: list(r["codes"])
           for r in corpus.sq8_encode(emb, dims=4).collect()}
    ref = _sq8_ref(vecs)
    assert [got[i] for i in range(3)] == ref
    # constant dim (all 5.0) -> 0; extremes -> 0 / 255 (256 clamps)
    assert [c[1] for c in ref] == [0, 0, 0]
    assert ref[0][0] == 0 and ref[1][0] == 255
    top = corpus.sq8_topk(emb, n_queries=1, k=2, dims=4).collect()
    by_rank = {r["rank"]: r for r in top}
    d = {j: sum((a - b) ** 2 for a, b in zip(ref[0], ref[j]))
         for j in (1, 2)}
    order = sorted(d, key=lambda j: (d[j], j))
    assert [by_rank[i + 1]["nid"] for i in range(2)] == order
    assert by_rank[1]["sqdist"] == d[order[0]]


def test_readability_hand_strings(spark):
    rows = [(0, "the cat sat. the dog ran! did it?"),
            (1, "headline only no terminator")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in corpus.readability(df).collect()}
    # doc 0: 8 space-tokens, 3 terminators, vowel runs:
    # e,a,a,e,o,a,i,i -> 8
    assert got[0]["n_words"] == 8 and got[0]["n_sents"] == 3
    assert got[0]["n_syl"] == 8
    assert got[0]["fk_micro"] == (
        (390000 * 8) // 3 + (11800000 * 8) // 8 - 15590000)
    # doc 1: no terminator -> floored at 1 sentence
    assert got[1]["n_sents"] == 1
    assert got[1]["n_words"] == 4
    # ea,i,e,o,o,e,i,a,o -> headline(ea,i,e) only(o) no(o) terminator(e,i,a,o)
    assert got[1]["n_syl"] == 9


def _silence_ref(vals, thr=4096, min_run=4):
    n_sil = n_runs = longest = cur = 0
    for v in vals:
        if abs(v) < thr:
            n_sil += 1
            cur += 1
        else:
            if cur >= min_run:
                n_runs += 1
            longest = max(longest, cur)
            cur = 0
    if cur >= min_run:
        n_runs += 1
    return n_sil, n_runs, max(longest, cur)


def test_audio_silence_matches_decoded_samples(spark):
    # 149/151 enter the |v|<4096 band mid-stream (partial runs);
    # 161 is silent end-to-end; 0/7/100 never touch the band
    ids = [0, 7, 100, 149, 151, 161]
    df = spark.createDataFrame(
        [(i, bytearray(media.make_wav_pcm_bytes(i))) for i in ids],
        "doc_id long, media binary")
    got = {(r["doc_id"], r["channel"]): r.asDict()
           for r in media.audio_silence(df).collect()}
    seen = 0
    for i in ids:
        dec = media.parse_wav_pcm(media.make_wav_pcm_bytes(i))
        for c, vals in enumerate(dec[3]):
            n_sil, n_runs, longest = _silence_ref(vals)
            row = got[(i, c)]
            assert (row["n_silent"], row["n_runs"],
                    row["longest_run"]) == (n_sil, n_runs, longest)
            seen += 1
    assert seen == len(got)
    # the fixture family must exercise BOTH silent and loud regions
    assert any(v["n_silent"] > 0 for v in got.values())
    assert any(v["n_silent"] < 64 for v in got.values())


def test_audio_silence_non_wav_drops(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"not a wav")),
         (1, bytearray(media.make_wav_pcm_bytes(1)))],
        "doc_id long, media binary")
    rows = media.audio_silence(df).collect()
    assert {r["doc_id"] for r in rows} == {1}


def _commit_waves(tbl, df, n_waves=4):
    import os
    for w in range(n_waves):
        out = tbl.staging_dir(f"w{w}", 0)
        (df.filter(F.col("doc_id") % n_waves == w)
         .coalesce(1).write.mode("overwrite").parquet(out))
        files = sorted(os.path.join(out, fn) for fn in os.listdir(out)
                       if fn.endswith(".parquet")
                       and not fn.startswith((".", "_")))
        tbl.commit(f"w{w}", [{"part_id": w, "files": files,
                              "counters": {}}], "t",
                   stats_cols=("a", "b"))


def test_zorder_prunes_both_dims_linear_sort_cannot(spark, tmp_path):
    import os

    from webextract.icetable import IceTable

    df = (spark.range(8192).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 64).alias("a"),
        ((F.col("id") / 64).cast("long") % 64).alias("b")))
    box = [("a", 8, 23), ("b", 8, 23)]
    b_only = [("a", 0, 63), ("b", 8, 11)]
    expect = {}
    for name, preds in (("box", box), ("b_only", b_only)):
        cond = (F.col("a").between(preds[0][1], preds[0][2])
                & F.col("b").between(preds[1][1], preds[1][2]))
        expect[name] = sorted((r["doc_id"], r["a"], r["b"])
                              for r in df.filter(cond).collect())
    counts = {}
    for mode in ("zorder", "linear"):
        tbl = IceTable(str(tmp_path / mode))
        # 64 small waves -> all rewritten, fanned into ~16 clustered
        # files (n_out = ceil(bytes / target))
        _commit_waves(tbl, df, n_waves=64)
        sizes = [os.path.getsize(f) for f in tbl.data_files()]
        target = max(2 * max(sizes) + 2, (sum(sizes) // 16) + 1)
        if mode == "zorder":
            tbl.compact(spark, target_file_bytes=target,
                        committed_at="t", zorder_by=("a", "b"))
        else:
            tbl.compact(spark, target_file_bytes=target,
                        committed_at="t", sort_by="a")
        for name, preds in (("box", box), ("b_only", b_only)):
            got, scanned, total = tbl.scan_box(spark, preds)
            assert sorted((r["doc_id"], r["a"], r["b"])
                          for r in got.collect()) == expect[name]
            counts[(mode, name)] = (scanned, total)
    # 2-D box: the Z-layout must skip files (tight per-file bounding
    # boxes on BOTH dims)
    z_scanned, z_total = counts[("zorder", "box")]
    assert z_scanned < z_total
    # b-only query: every a-sorted file spans ALL of b (zero pruning),
    # while Z-files bound b tightly — the one-layout-serves-both-axes
    # property that justifies the interleave
    zb_scanned, _ = counts[("zorder", "b_only")]
    lb_scanned, lb_total = counts[("linear", "b_only")]
    assert lb_scanned == lb_total
    assert zb_scanned < lb_scanned


def test_zorder_value_interleaves_bits(spark):
    from webextract.icetable import IceTable

    rows = (spark.createDataFrame([(a, b) for a in range(8)
                                   for b in range(8)], "a int, b int")
            .withColumn("z", IceTable.zorder_value(["a", "b"], bits=3))
            .collect())

    def ref(a, b):
        z = 0
        for i in range(3):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r["z"] == ref(r["a"], r["b"])
