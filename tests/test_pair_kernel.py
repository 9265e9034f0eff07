"""Equivalence pin for the r6 numpy bucket-pair kernel.

_bucket_pair_dot_candidates replaced the within-bucket shuffle-hash
self-join + per-pair zip_with/aggregate dot in embed_near_dup_pairs
and semantic_dedup.  These tests recompute the OLD join form inline
and assert the new path emits the identical pair sets — including
threshold-boundary values, null components (null-propagation drops
the pair), a null embedding row, ragged lengths (zip_with null
padding drops cross-length pairs), and zero vectors (NaN cosine)."""

import pytest
from pyspark.sql import functions as F

from webextract import corpus
from webextract.corpus import _dot


def _old_pairs(side, threshold):
    """The pre-r6 join form over a staged (bucket, vec_id, embedding,
    norm) side — the reference semantics."""
    a = side.select("bucket", F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("ea"),
                    F.col("norm").alias("na"))
    b = side.select("bucket", F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("eb"),
                    F.col("norm").alias("nb"))
    cos = F.round(_dot(F.col("ea"), F.col("eb"))
                  / (F.col("na") * F.col("nb")), 6)
    return (a.join(b.hint("shuffle_hash"), "bucket")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .withColumn("cos", cos)
            .filter(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", "cos"))


def _new_pairs(side, threshold):
    cand = corpus._bucket_pair_dot_candidates(side, threshold - 1e-5)
    cos = F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
    return (cand.withColumn("cos", cos)
            .filter(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", "cos"))


def _staged(spark, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, bucket string, embedding array<float>")
    return df.select(
        "bucket", "vec_id", "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        .alias("norm"))


@pytest.mark.parametrize("threshold", [0.9, 0.5, 0.0])
def test_kernel_equals_join_random(spark, threshold):
    import random
    rnd = random.Random(42)
    rows = []
    for i in range(400):
        bucket = f"b{i % 5}"
        base = [rnd.uniform(-1, 1) for _ in range(16)]
        rows.append((i, bucket, base))
        if i % 7 == 0:   # planted near-dup: tiny perturbation
            rows.append((10_000 + i, bucket,
                         [x + rnd.uniform(-1e-4, 1e-4) for x in base]))
    side = _staged(spark, rows).localCheckpoint()
    old = sorted(map(tuple, _old_pairs(side, threshold).collect()))
    new = sorted(map(tuple, _new_pairs(side, threshold).collect()))
    assert old == new
    assert len(new) > 0          # the gate is non-vacuous


def test_kernel_edge_cases(spark):
    rows = [
        (0, "b", [1.0, 0.0, 0.0]),
        (1, "b", [1.0, 1e-7, 0.0]),          # ~boundary cosine
        (3, "b", None),                      # null embedding
        (4, "b", [1.0, 0.0]),                # ragged length
        (5, "b", [1.0, 0.0]),                # same-length partner
        (6, "b", [-1.0, 0.0, 0.0]),          # anti-parallel
        (7, "lone", [1.0, 0.0, 0.0]),        # single-member bucket
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, bucket string, embedding array<float>")
    side = df.select(
        "bucket", "vec_id", "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        .alias("norm")).localCheckpoint()
    for threshold in (0.999999, 0.9, 0.0):
        old = sorted(map(tuple, _old_pairs(side, threshold).collect()))
        new = sorted(map(tuple, _new_pairs(side, threshold).collect()))
        assert old == new, (threshold, old, new)


def test_kernel_zero_vector_dropped(spark):
    """Deliberate divergence pin: the old join form raised ANSI
    DIVIDE_BY_ZERO when a zero vector entered a bucket; the kernel
    drops the degenerate pair (NaN cosine can never clear a
    threshold) so the engine-side division is always well-defined."""
    rows = [
        (0, "b", [1.0, 0.0, 0.0]),
        (1, "b", [0.0, 0.0, 0.0]),           # zero vector
        (2, "b", [1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, bucket string, embedding array<float>")
    side = df.select(
        "bucket", "vec_id", "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        .alias("norm")).localCheckpoint()
    new = sorted(map(tuple, _new_pairs(side, 0.5).collect()))
    assert new == [(0, 2, 1.0)]


def test_kernel_null_component(spark):
    rows = [
        (0, "b", [1.0, None, 0.0]),          # null component poisons
        (1, "b", [1.0, 0.5, 0.0]),
        (2, "b", [1.0, 0.5, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, bucket string, embedding array<float>")
    side = df.select(
        "bucket", "vec_id", "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        .alias("norm")).localCheckpoint()
    old = sorted(map(tuple, _old_pairs(side, 0.5).collect()))
    new = sorted(map(tuple, _new_pairs(side, 0.5).collect()))
    assert old == new
    assert new == [(1, 2, 1.0)]


def _staged_lang(spark, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, bucket string, lang string, "
              "embedding array<float>")
    return df.select(
        "bucket", "lang", "vec_id", "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        .alias("norm"))


def _old_cross(side, src, tgt):
    """bitext_mine's pre-r6 cross-lang join form (positive-cosine
    candidates with the engine-side round-6 + micro fix)."""
    a = (side.filter(F.col("lang") == src)
         .select("bucket", F.col("vec_id").alias("src_id"),
                 F.col("embedding").alias("ea"), F.col("norm").alias("na")))
    c = (side.filter(F.col("lang") == tgt)
         .select("bucket", F.col("vec_id").alias("tgt_id"),
                 F.col("embedding").alias("eb"), F.col("norm").alias("nb")))
    cosm = F.round(F.round(_dot(F.col("ea"), F.col("eb"))
                           / (F.col("na") * F.col("nb")), 6)
                   * 1000000, 0).cast("long")
    return (a.join(c.hint("shuffle_hash"), "bucket")
            .withColumn("cos_micro", cosm)
            .filter(F.col("cos_micro") > 0)
            .select("src_id", "tgt_id", "cos_micro"))


def _new_cross(side, src, tgt):
    cand = corpus._bucket_cross_dot_candidates(side, src, tgt)
    cosm = F.round(F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
                   * 1000000, 0).cast("long")
    return (cand.withColumn("cos_micro", cosm)
            .filter(F.col("cos_micro") > 0)
            .select("src_id", "tgt_id", "cos_micro"))


def test_cross_kernel_equals_join_random(spark):
    """r6: bitext_mine's cross-lang candidate dots moved into the
    bucket kernel — identical (src, tgt, cos_micro) sets vs the join
    form, including anti-parallel (cos<=0 dropped), ragged-length and
    null-component pairs."""
    import random
    rnd = random.Random(7)
    rows = []
    for i in range(300):
        bucket = f"b{i % 4}"
        lang = "en" if i % 2 == 0 else "de"
        base = [rnd.uniform(-1, 1) for _ in range(12)]
        rows.append((i, bucket, lang, base))
    # planted exact translations (same vector, other language)
    for i in range(0, 60, 2):
        rows.append((20_000 + i, f"b{i % 4}", "de",
                     [x for x in rows[i][3]]))
    # edge rows: ragged length, null component (zero vectors are the
    # documented divergence — the join form RAISES under ANSI — and
    # are pinned separately below)
    rows.append((30_001, "b0", "en", [1.0] * 5))
    rows.append((30_002, "b0", "de", [1.0, None, 1.0] + [0.5] * 9))
    side = _staged_lang(spark, rows).localCheckpoint()
    old = sorted(map(tuple, _old_cross(side, "en", "de").collect()))
    new = sorted(map(tuple, _new_cross(side, "en", "de").collect()))
    assert old == new
    assert len(new) > 0


def test_cross_kernel_zero_vector_dropped(spark):
    """Same deliberate divergence as the same-side kernel: a zero
    vector made the old cross-lang join raise ANSI DIVIDE_BY_ZERO;
    the kernel drops the degenerate pair."""
    rows = [
        (0, "b", "en", [1.0, 0.0, 0.0]),
        (1, "b", "de", [0.0, 0.0, 0.0]),     # zero vector
        (2, "b", "de", [1.0, 0.0, 0.0]),
    ]
    side = _staged_lang(spark, rows).localCheckpoint()
    new = sorted(map(tuple, _new_cross(side, "en", "de").collect()))
    assert new == [(0, 2, 1000000)]
