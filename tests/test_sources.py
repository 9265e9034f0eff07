"""S4 source contract: scheme-agnostic pages reader + fail-fast schema
validation (object-store access itself is Hadoop FS config — s3a_configs
documents the knobs; jars are not in this sandbox)."""

import pytest

from webextract.sources import read_pages, s3a_configs
from webextract.synth import pages_df


def test_read_pages_file_scheme_and_pruning(spark, tmp_path):
    from pyspark.sql import functions as F
    p = str(tmp_path / "pages")
    pages_df(spark, 20, parallelism=2).withColumn(
        "extra_wide_col", F.lit("dropped")).write.parquet(p)
    # explicit file:// URI (same path Hadoop FS resolves for s3a://...)
    df = read_pages(spark, "file://" + p)
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang"}
    assert df.count() == 20
    # multi-path read
    assert read_pages(spark, [p, p]).count() == 40


def test_read_pages_rejects_wrong_table(spark, tmp_path):
    p = str(tmp_path / "notpages")
    spark.range(5).write.parquet(p)
    with pytest.raises(ValueError, match="missing required columns"):
        read_pages(spark, p)


def test_s3a_configs_shape():
    cfg = s3a_configs(endpoint="https://s3.example",
                      credentials_provider="com.example.Provider")
    assert cfg["spark.hadoop.fs.s3a.endpoint"] == "https://s3.example"
    assert all(k.startswith("spark.hadoop.") for k in cfg
               if k.startswith("spark.hadoop."))
    assert not any("secret" in k.lower() or "key" in k.lower()
                   for k in cfg), "no credential material in configs"
