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
