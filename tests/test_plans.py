"""Physical-plan assertions: the optimizations we claim must show up in
explain() output — column pruning at the scan, filter pushdown,
broadcast joins where dims are small, and no payload exchange in the
extraction plan (SURVEY.md §4.2)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_extraction_scan_prunes_naive_text(spark):
    """The crawl's naive `text` column must never be read: extraction
    projects (url, warc_ts, lang, html) only (column pruning reaches
    ReadSchema)."""
    from webextract.docpages import docs_to_pages
    from webextract.pipeline import extracted_df
    pages_dir = "/tmp/wx_plan_pages"
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    docs_to_pages(docs).write.mode("overwrite").parquet(pages_dir)
    out = extracted_df(spark.read.parquet(pages_dir), cpus=4)
    plan = _plan(out)
    scan = plan[plan.index("Scan parquet"):]
    schema_line = next(l for l in scan.splitlines()
                       if l.startswith("ReadSchema"))
    assert "html" in schema_line and "url" in schema_line
    assert "text" not in schema_line, schema_line
    # narrow plan: no Exchange before the Python kernel
    assert "Exchange" not in plan.split("ArrowEvalPython")[0] \
        or "Exchange" not in plan, plan


def test_extraction_plan_has_no_shuffle(spark):
    """extracted_df over a pages scan is a pure narrow map — raw HTML
    payloads are never exchanged (north_rule plan shape)."""
    from webextract.docpages import docs_to_pages
    from webextract.pipeline import extracted_df
    pages_dir = "/tmp/wx_plan_pages_ns"
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    docs_to_pages(docs).write.mode("overwrite").parquet(pages_dir)
    out = extracted_df(spark.read.parquet(pages_dir), cpus=4)
    assert "Exchange" not in _plan(out)


def test_docpages_spread_exchanges_no_payload(spark):
    """The documents→pages gate adapter repartitions for parallelism,
    but the exchange may carry only the tiny doc rows: the html payload
    is BUILT by the kernel after the exchange, never shuffled."""
    from webextract.docpages import docs_to_pages
    from webextract.pipeline import extracted_df
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(extracted_df(docs_to_pages(docs), cpus=4))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    scan = plan[plan.index("Scan parquet"):]
    schema_line = next(l for l in scan.splitlines()
                       if l.startswith("ReadSchema"))
    assert "html" not in schema_line, schema_line


def test_resume_antijoin_is_broadcast(spark):
    """The committed-parts anti-join must broadcast the tiny manifest
    side, never shuffle the input (SURVEY.md §2.6 joins row)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "part_id", F.col("doc_id") % 16)
    committed = spark.range(0, 16, 2).select(F.col("id").alias("part_id"))
    pending = docs.join(F.broadcast(committed), "part_id", "left_anti")
    plan = _plan(pending)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_revenue_join_broadcasts_dim(spark):
    from webextract.queries import QUERIES
    plan = _plan(QUERIES["revenue_by_nation"](spark, SF))
    assert "BroadcastHashJoin" in plan  # nation dim broadcast


def test_shipdate_filter_pushed_to_scan(spark):
    from webextract.queries import QUERIES
    plan = _plan(QUERIES["pricing_summary"](spark, SF))
    scan = plan[plan.index("Scan parquet"):]
    pushed = next(l for l in scan.splitlines()
                  if l.startswith("PushedFilters"))
    assert "l_shipdate" in pushed, pushed


def test_minhash_plan_is_projection_until_bucket_join(spark):
    """MinHash signatures must not shuffle shingle rows: everything up
    to the signature posexplode (Generate) is a narrow projection; only
    the k-rows-per-doc band groupBy exchanges."""
    from webextract.corpus import lsh_band_keys
    spark.catalog.clearCache()  # cached LSH frames from other tests would
    docs = spark.read.parquet(f"{SF}/documents.parquet")  # rewrite the plan
    plan = _plan(lsh_band_keys(docs))
    # formatted plans print top-down: nodes BELOW Generate in the tree
    # section are its inputs — the shingle/signature projections
    tree = plan.split("\n\n")[0]
    below_generate = tree[tree.index("Generate"):]
    assert "Exchange" not in below_generate, below_generate
    # the exchanges that exist carry (doc_id, seed/band, mh) rows only
    assert tree.count("Exchange") <= 2, tree
