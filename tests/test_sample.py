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
