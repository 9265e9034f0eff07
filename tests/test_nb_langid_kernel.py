"""Equivalence pin for the r6 nb_langid kernel rewrite.

The trigram explode + scoring broadcast join became two Arrow kernels
(memoized md5 bucket map; int64 tf . W scoring with the trained
integer tables collected from the engine).  This recomputes the OLD
explode/join form inline on an edge-case corpus — null text, empty
text, 1/2/3-char text, a null lang — and asserts identical output."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from webextract import corpus


def _old_nb(docs, buckets=512, k=0.5, salt="nbl1"):
    spark = docs.sparkSession
    grams = F.expr(
        "transform(sequence(1, greatest(length(text) - 2, 1)), "
        "p -> substring(text, p, 3))")
    bucket = (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col("g"))), 1, 8),
        16, 10).cast("long") % buckets)
    feats = (docs.select("doc_id", "lang", F.explode(grams).alias("g"))
             .select("doc_id", "lang", bucket.alias("bucket"))
             .groupBy("doc_id", "lang", "bucket")
             .agg(F.count("*").alias("tf")))
    counts = feats.groupBy("lang", "bucket").agg(F.sum("tf").alias("c"))
    lang_tot = counts.groupBy("lang").agg(F.sum("c").alias("n_l"))
    dense = (lang_tot
             .crossJoin(spark.range(buckets)
                        .select(F.col("id").cast("long").alias("bucket")))
             .join(counts, ["lang", "bucket"], "left")
             .select("lang", "bucket",
                     F.round(-F.log((F.coalesce(F.col("c"), F.lit(0))
                                     + F.lit(k))
                                    / (F.col("n_l")
                                       + F.lit(k) * F.lit(buckets)))
                             * 1e6, 0).cast("long").alias("w_micro")))
    priors = (docs.groupBy("lang").agg(F.count("*").alias("d_l"))
              .crossJoin(F.broadcast(docs.agg(
                  F.count("*").alias("n_docs"))))
              .select("lang",
                      F.round(-F.log(F.col("d_l") / F.col("n_docs"))
                              * 1e6, 0).cast("long")
                      .alias("prior_micro")))
    doc_tf = feats.groupBy("doc_id", "bucket").agg(F.sum("tf").alias("tf"))
    scored = (doc_tf.join(F.broadcast(dense), "bucket")
              .groupBy("doc_id", "lang")
              .agg(F.sum(F.col("tf") * F.col("w_micro")).alias("s"))
              .join(F.broadcast(priors), "lang")
              .select("doc_id", "lang",
                      (F.col("s") + F.col("prior_micro")).alias("nll")))
    w = Window.partitionBy("doc_id").orderBy("nll", "lang")
    pred = (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("doc_id", F.col("lang").alias("nb_pred")))
    return (docs.select("doc_id", F.col("lang").alias("lang_label"))
            .join(pred.hint("shuffle_hash"), "doc_id")
            .select("doc_id", "lang_label", "nb_pred",
                    (F.col("nb_pred") == F.col("lang_label"))
                    .cast("int").alias("is_match")))


def test_nb_langid_kernel_equals_explode_form(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "der schnelle braune fuchs springt", "de"),
        (2, "le renard brun rapide saute", "fr"),
        (3, None, "en"),                      # null text -> 1 null gram
        (4, "", "de"),                        # empty -> one "" gram
        (5, "ab", "fr"),                      # short -> one short gram
        (6, "abc", "en"),                     # exactly one trigram
        (7, "the lazy dog sleeps all day long", None),   # null lang
        (8, "der fuchs und der hund spielen", "de"),
        (9, "le chien dort toute la journee", "fr"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string").repartition(3)
    key = lambda t: t[0]
    a = sorted(map(tuple, corpus.nb_langid(docs).collect()), key=key)
    b = sorted(map(tuple, _old_nb(docs).collect()), key=key)
    assert a == b
    assert len(a) == len(rows)


def _old_dsir(docs, is_target, buckets=None, k=None):
    from webextract.corpus import (DSIR_BUCKETS, DSIR_K, TOKENS,
                                   shingles_of)
    buckets = buckets or DSIR_BUCKETS
    k = k or DSIR_K
    base = (docs.select("doc_id", "text", is_target.alias("is_t"))
            .select("doc_id", "is_t", TOKENS().alias("toks")))
    feats = F.concat(F.col("toks"), shingles_of("toks", 2,
                                                distinct=False))
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit("dsir:"), F.col("f"))), 1, 8), 16, 10)
        .cast("long") % buckets)
    tf = (base.select("doc_id", "is_t", F.explode(feats).alias("f"))
          .select("doc_id", "is_t", bucket.alias("b"))
          .groupBy("doc_id", "is_t", "b").agg(F.count("*").alias("tf")))
    raw = tf.groupBy("b").agg(F.sum("tf").alias("cr"))
    tgt = tf.filter("is_t").groupBy("b").agg(F.sum("tf").alias("ct"))
    dist = (raw.join(tgt, "b", "left")
            .select("b", "cr", F.coalesce("ct", F.lit(0)).alias("ct")))
    totals = dist.agg(F.sum("cr").alias("rt"), F.sum("ct").alias("tt"))
    kb = k * buckets
    nll = lambda c, t: F.round(  # noqa: E731
        -F.log((c + F.lit(k)) / (t + F.lit(kb))) * 1e6, 0).cast("long")
    lr = (dist.crossJoin(F.broadcast(totals))
          .select("b", (nll(F.col("cr"), F.col("rt"))
                        - nll(F.col("ct"), F.col("tt")))
                  .alias("lr_micro")))
    scored = (tf.join(F.broadcast(lr), "b").groupBy("doc_id")
              .agg(F.sum("tf").alias("n_feat"),
                   F.sum(F.col("tf") * F.col("lr_micro")).alias("s")))
    m = F.floor((2 * F.col("s") + F.col("n_feat"))
                / (2 * F.col("n_feat")))
    return scored.select(
        "doc_id", F.col("n_feat").cast("int").alias("n_feat"),
        (m.cast("double") / F.lit(1e6)).alias("mean_lw"),
        (F.col("s") > 0).alias("target_like"))


def test_dsir_kernel_equals_explode_form(spark):
    """r6 dsir_weights kernel: null text drops the doc, empty text
    keeps its single empty token, double spaces keep empty tokens
    (split semantics), duplicate doc_ids merge — all must match the
    old explode/join form exactly."""
    rows = [
        (0, "select the best training data for the model", "src0"),
        (1, "random web page about cooking recipes", "src1"),
        (2, "the model training loop converges", "src0"),
        (3, None, "src1"),                    # null text -> absent
        (4, "", "src1"),                      # one empty token
        (5, "a  b", "src1"),                  # double space
        (6, "solo", "src1"),                  # no bigram
        (6, "solo again", "src1"),            # duplicate doc_id merges
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string").repartition(3)
    tgt = F.col("source") == "src0"
    a = sorted(map(tuple, corpus.dsir_weights(docs, tgt).collect()))
    b = sorted(map(tuple, _old_dsir(docs, tgt).collect()))
    assert a == b
    assert len(a) == 6                        # doc 3 absent, doc 6 merged
