"""r6: pq_topk's ADC stage moved from an interpreted element_at chain
inside the BroadcastNestedLoopJoin projection to a codes-only Arrow
kernel scoring against the COLLECTED per-query distance tables.  The
kernel must reproduce the old join form bitwise: same left-assoc
float64 accumulation order, engine-side round-6, vec_id != qid
exclusion, and (adist, nid) window ranking."""

import struct

import pytest

from pyspark.sql import functions as F

from webextract import corpus


def _old_pq_topk(emb, n_queries=10, k=5, m=corpus.PQ_M, kc=corpus.PQ_K):
    """The pre-r6 BNLJ + element_at-chain form, kept as the reference."""
    from pyspark.sql import Window
    books = corpus._pq_codebooks(emb, m, kc)
    kern = corpus._pq_raw_dists_kernel(books)
    enc = corpus.pq_encode(emb, m, kc)
    qraw = (emb.filter(F.col("vec_id") < n_queries)
            .select(F.col("vec_id").alias("qid"),
                    kern("embedding").alias("dd")))
    q = qraw.select("qid", *corpus._pq_rounded_arrays("dd", m, kc, "qd"))
    adist = F.expr(" + ".join(
        f"element_at(qd{s}, element_at(codes, {s + 1}) + 1)"
        for s in range(m)))
    pairs = (enc.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
             .select("qid", F.col("vec_id").alias("nid"),
                     F.round(adist, 6).alias("adist")))
    w = Window.partitionBy("qid").orderBy(F.col("adist"), F.col("nid"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "adist",
                    F.col("rank").cast("int").alias("rank")))


def _canon(rows):
    return sorted(
        (r["qid"], r["nid"],
         None if r["adist"] is None else struct.pack(">d", r["adist"]),
         r["rank"]) for r in rows)


@pytest.mark.parametrize("n_queries,k", [(10, 5), (3, 7)])
def test_pq_topk_kernel_matches_join_form(spark, n_queries, k):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    old = _canon(_old_pq_topk(emb, n_queries, k).collect())
    new = _canon(corpus.pq_topk(emb, n_queries, k).collect())
    assert old == new            # bitwise doubles, same ranks
    assert len(new) == n_queries * k
