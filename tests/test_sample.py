"""stratified_sample: the two-stage skew-proof top-k must produce a
sample invariant to the physical partition layout (stage 1 prunes per
spark_partition_id, so this is the property that licenses the trick)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webextract.corpus import stratified_sample

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted((r["doc_id"], r["source"], r["rank"])
                  for r in df.collect())


def test_sample_invariant_to_partition_layout(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = _rows(stratified_sample(docs, per_group=5))
    assert len(base) == 5 * docs.select("source").distinct().count()
    for layout in (docs.repartition(37), docs.repartition(3, "source"),
                   docs.coalesce(1)):
        assert _rows(stratified_sample(layout, per_group=5)) == base


def test_sample_local_window_keys_on_partition_id(spark):
    """Stage 1's exchange must carry spark_partition_id so a hot
    stratum spreads over reducers instead of collapsing into one."""
    from tests.test_plans import _plan
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(stratified_sample(docs))
    assert "SPARK_PARTITION_ID" in plan, plan[:2000]


def test_sample_redraws_with_salt(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = _rows(stratified_sample(docs, per_group=5, salt="s1"))
    b = _rows(stratified_sample(docs, per_group=5, salt="s2"))
    assert a != b
    # same size, same strata — only membership changes
    assert len(a) == len(b)
    ids = lambda rows: {d for d, _, _ in rows}  # noqa: E731
    assert ids(a) != ids(b)


def test_weighted_sample_null_nan_reject(spark):
    """NULL/NaN weights mean "no admissible score" and must REJECT:
    Spark's least/greatest skip NULLs and sort NaN above +inf, so the
    naive clamp silently turns an unscored doc into weight 1
    (admit-all) — the round-4 review finding."""
    from webextract.corpus import weighted_sample
    rows = [(1, None), (2, float("nan")), (3, 1.0), (4, 0.0),
            (5, 2.5), (6, -1.0)]
    docs = spark.createDataFrame(rows, "doc_id long, weight double")
    kept = {r["doc_id"]: r["kept"] for r in weighted_sample(docs).collect()}
    assert kept[1] is False          # NULL weight -> reject
    assert kept[2] is False          # NaN weight -> reject
    assert kept[3] is True           # weight 1 -> always keep
    assert kept[4] is False          # weight 0 -> never keep
    assert kept[5] is True           # >1 clamps to always-keep
    assert kept[6] is False          # <0 clamps to never-keep
    assert all(v is not None for v in kept.values())
