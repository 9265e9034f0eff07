"""Training-data corpus operators: dedup, similarity, text analysis.

These are the large-scale pipeline operators a 100 TB training-data run
needs on top of extraction (exact/MinHash-LSH/SimHash/n-gram-Jaccard
dedup, embedding ANN, language-ID, quality scoring, token counting,
winnowing fingerprints).  The reference has no corpus-level operators
(documents are independent, SURVEY.md §2.6) — these are the
Spark-native extensions.

DESIGN RULE: everything here is pure DataFrame + built-in/higher-order
functions — zero Python UDFs, so every operator stays JVM-side, is
whole-stage-codegen'd where possible, and has an exactly-equivalent
DuckDB oracle (webextract/queries.py pairs each with its SQL).  Hash
primitives are md5-hex (identical in Spark and DuckDB) so signatures
are engine-portable and deterministic.

Scale notes per operator are in the docstrings: what shuffles, what
broadcasts, and how the shape survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Tokens: documents.text is single-space-normalized; the token rule is
# "split on one space" — identical to DuckDB string_split(text, ' ').
# (Built lazily: Column construction needs an active SparkContext.)
def TOKENS():
    return F.split(F.col("text"), " ")

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


# ---------------------------------------------------------------------------
# shingling (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------

def shingles_expr(n: int = 3):
    """array<string> of word n-grams (distinct), via sequence+transform —
    no explode until the caller asks, so it stays a narrow projection.
    Guarded: Spark sequence(1, 0) would count DOWN, so short docs get an
    explicit empty array."""
    toks = TOKENS()
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k) for k in range(n)]))
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams)
        .otherwise(F.array().cast("array<string>")))


def exploded_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle, n_shingles) — one row per distinct doc-shingle.
    Narrow (generate + explode); the downstream groupBy/join shuffles on
    `shingle`, which is high-cardinality and well-spread → no skew."""
    return (docs
            .select("doc_id", shingles_expr(n).alias("sh"))
            .select("doc_id", F.size("sh").alias("n_shingles"),
                    F.explode("sh").alias("shingle")))


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup: group by content hash, keep min doc_id as canonical.
    Scale: one hash-shuffle on a 64-hex key; partial aggregation
    (map-side combine) collapses duplicates before the exchange."""
    return (docs
            .groupBy(F.sha2(F.col("text"), 256).alias("text_sha256"))
            .agg(F.min("doc_id").alias("canonical_id"),
                 F.count("*").cast("long").alias("n_copies"))
            .select("text_sha256", "canonical_id", "n_copies"))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        threshold: float = 0.4) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard.

    Shape: explode distinct shingles → self-equi-join on shingle →
    count = |A∩B| → filter on |A∩B|/(|A|+|B|-|A∩B|).  The join shuffles
    on `shingle`; hot shingles (stop-phrases) would skew at 100 TB, so
    production adds a document-frequency cap — here df is uniform.
    This is the O(pairs-sharing-a-shingle) exact kernel; MinHash-LSH
    below is the sub-quadratic scale path."""
    e = exploded_shingles(docs, n)
    a, b = e.alias("a"), e.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"),
                      F.col("a.n_shingles").alias("na"),
                      F.col("b.n_shingles").alias("nb"))
             .agg(F.count("*").alias("i")))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (inter.filter(jac >= threshold)
            .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard")))


def minhash_signatures(docs: DataFrame, n: int = 3, k: int = 16) -> DataFrame:
    """(doc_id, seed, minhash): k independent min-hashes per document.

    The hash family is min over shingles of md5(seed||':'||shingle) —
    string-min over a uniform 128-bit hex space is a valid MinHash and
    is bit-identical across engines (DuckDB oracle runs the same
    formula).  Narrow until the groupBy(doc_id, seed) hash-shuffle;
    partial min() combines map-side so the exchange carries k rows per
    document, not k×shingles."""
    e = exploded_shingles(docs, n)
    return (e.select("doc_id",
                     F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed"),
                     "shingle")
            .groupBy("doc_id", "seed")
            .agg(F.min(F.md5(F.concat_ws(":", F.col("seed").cast("string"),
                                         F.col("shingle")))).alias("minhash")))


def lsh_band_keys(docs: DataFrame, n: int = 3, k: int = 16,
                  rows_per_band: int = 4) -> DataFrame:
    """(doc_id, band, band_key): LSH banding of the MinHash signature.
    band_key = md5 of the band's minhashes joined in seed order."""
    sig = minhash_signatures(docs, n, k)
    banded = sig.withColumn("band", F.expr(f"seed div {rows_per_band}").cast("int"))
    return (banded.groupBy("doc_id", "band")
            .agg(F.md5(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda x: x["minhash"]),
                ",")).alias("band_key")))


def lsh_candidate_pairs(docs: DataFrame, n: int = 3, k: int = 16,
                        rows_per_band: int = 4) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band bucket.

    Scale: the bucket join shuffles on (band, band_key) — 32 bytes per
    doc per band regardless of document size; bucket sizes are the skew
    knob (near-dup clusters of size m cost m² pairs; production caps
    bucket size before the self-join).  Sub-quadratic replacement for
    ngram_jaccard_pairs at 10^12 docs."""
    bk = lsh_band_keys(docs, n, k, rows_per_band)
    a, b = bk.alias("a"), bk.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash): SimHash over token frequencies.

    Hyperplane j's sign for a token is the high bit of hex digit j of
    md5(token) (engine-portable).  bit_j = sign of Σ_tokens ±count.
    Two shuffles: token-count groupBy, then per-(doc,bit) sum — both
    with map-side partials; output is one `bits`-char string per doc."""
    tok = (docs.select("doc_id", F.explode(TOKENS()).alias("token"))
           .groupBy("doc_id", "token").agg(F.count("*").alias("cnt")))
    contrib = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        F.col("cnt"), F.md5("token").alias("h"))
    signed = contrib.withColumn(
        "w", F.when(F.substring(F.col("h"), F.col("j") + 1, 1) >= F.lit("8"),
                    F.col("cnt")).otherwise(-F.col("cnt")))
    bitcol = (signed.groupBy("doc_id", "j")
              .agg(F.sum("w").alias("s"))
              .withColumn("bit", F.when(F.col("s") > 0, F.lit("1"))
                          .otherwise(F.lit("0"))))
    return (bitcol.groupBy("doc_id")
            .agg(F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("j", "bit"))),
                            lambda x: x["bit"]), "").alias("simhash")))


# ---------------------------------------------------------------------------
# embedding similarity (ANN)
# ---------------------------------------------------------------------------

def _dot(a, b):
    """Double-precision dot product via zip_with + left-fold aggregate —
    deterministic sequential accumulation, JVM-side codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: first `n_queries` vectors vs the corpus.

    The query side is tiny → BROADCAST nest-loop join (no shuffle of the
    corpus); per-pair math is codegen'd array arithmetic.  At 10^12 rows
    this exact kernel is the per-bucket scorer inside lsh_ann_buckets —
    brute force only ever runs within a bucket/partition.
    Ranking key is round(cos, 6) with nid tiebreak → deterministic and
    engine-portable."""
    norms = emb.select(
        F.col("vec_id"), F.col("embedding"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("norm"))
    q = (norms.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qe"), F.col("norm").alias("qn")))
    pairs = (norms.alias("c")
             .join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
             .select("qid", F.col("vec_id").alias("nid"),
                     F.round(_dot(F.col("qe"), F.col("embedding"))
                             / (F.col("qn") * F.col("norm")), 6).alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "cos", F.col("rank").cast("int").alias("rank")))


def lsh_ann_buckets(emb: DataFrame, bits: int = 16) -> DataFrame:
    """(vec_id, bucket): random-hyperplane (SRP) cosine-LSH bucket.

    Hyperplane j's sign at dimension d is md5(j||':'||d) — deterministic
    and engine-portable; bucket = concat of sign bits of h_j·v.  Narrow
    (pure projection, no shuffle): the scale path groups by bucket and
    runs cosine_topk within buckets only."""
    dims = F.size(F.col("embedding"))

    def plane_bit(j: int):
        s = F.aggregate(
            F.sequence(F.lit(1), dims), F.lit(0.0),
            lambda acc, d: acc + F.when(
                F.substring(F.md5(F.concat_ws(
                    ":", F.lit(str(j)), (d - 1).cast("string"))), 1, 1)
                >= F.lit("8"),
                F.element_at(F.col("embedding"), d).cast("double")
            ).otherwise(-F.element_at(F.col("embedding"), d).cast("double")))
        return F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))

    return emb.select(
        "vec_id",
        F.concat(*[plane_bit(j) for j in range(bits)]).alias("bucket"))


def ann_bucket_stats(emb: DataFrame, bits: int = 8) -> DataFrame:
    """Bucket occupancy histogram — the skew diagnostic for the ANN path."""
    return (lsh_ann_buckets(emb, bits)
            .groupBy("bucket").agg(F.count("*").cast("long").alias("n_vecs"),
                                   F.min("vec_id").alias("min_vec_id")))


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def text_quality(docs: DataFrame) -> DataFrame:
    """Per-doc quality features + score (all codegen'd scalar math)."""
    toks = TOKENS()
    n_chars = F.length("text")
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    avg_tok = (n_chars - (n_tokens - 1)) / n_tokens
    stop_ratio = n_stop / n_tokens
    score = F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * (
        F.lit(0.5) + F.lit(0.5) * F.least(F.lit(1.0), stop_ratio * 10.0))
    return docs.select(
        "doc_id", n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_tok, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"))


LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "les", "et", "est", "dans", "pour"),
    "es": ("el", "los", "las", "es", "para", "con"),
}


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID (n-gram-heuristic stand-in).  Pure
    projection; the CASE tie-break order (de > fr > es > en) is part of
    the operator contract and mirrored in the oracle."""
    toks = TOKENS()

    def score(lang: str):
        arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    d, fr, es = score("de"), score("fr"), score("es")
    pred = (F.when((d > fr) & (d > es) & (d > 0), "de")
            .when((fr > es) & (fr > 0), "fr")
            .when(es > 0, "es").otherwise("en"))
    return docs.select(
        "doc_id", F.col("lang").alias("lang_label"), pred.alias("lang_pred"),
        (pred == F.col("lang")).cast("int").alias("is_match"))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-language token accounting: whitespace tokens + a BPE-ish
    subword estimate (ceil(len/4) pieces per word).  One small shuffle."""
    toks = TOKENS()
    subwords = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"))
    return (docs
            .select("lang", F.size(toks).cast("long").alias("nt"),
                    subwords.alias("nsw"))
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("nt").alias("n_tokens"),
                 F.sum("nsw").alias("n_subwords"))
            .select("lang", "n_docs", "n_tokens", "n_subwords"))


def fingerprints(docs: DataFrame, gram: int = 5, window: int = 4) -> DataFrame:
    """Document fingerprints: whole-text md5 + winnowing count.

    Winnowing (Schleimer et al., SIGMOD'03): hash every token `gram`-gram,
    keep the min hash of each sliding window of `window` positions, count
    distinct kept hashes.  Implemented as posexplode + a bounded-frame
    window min — the per-doc frame never shuffles more than the doc's own
    gram rows (partitioned by doc_id)."""
    toks = TOKENS()
    grams = F.when(
        F.size(toks) >= gram,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (gram - 1)),
            lambda i: F.md5(F.concat_ws(
                " ", *[F.element_at(toks, i + k) for k in range(gram)])))
    ).otherwise(F.array().cast("array<string>"))
    g = (docs.select("doc_id", F.md5("text").alias("fp_md5"),
                     F.posexplode(grams).alias("pos", "h")))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(0, window - 1))
    n_grams = Window.partitionBy("doc_id")
    winmin = (g.withColumn("wmin", F.min("h").over(w))
              .withColumn("m", F.max("pos").over(n_grams))
              .filter(F.col("pos") <= F.col("m") - (window - 1)))
    return (winmin.groupBy("doc_id", "fp_md5")
            .agg(F.count_distinct("wmin").cast("long").alias("n_winnow"))
            .select("doc_id", "fp_md5", "n_winnow"))
