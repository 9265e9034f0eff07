"""Metadata-only aggregates (Iceberg's count(*)/min/max from
manifests): record counts committed per data file, bounds folded from
the footer stats, with the soundness gate falling back to a real scan
whenever deletes or missing metadata would make the manifest answer
wrong."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from webextract.icetable import IceTable


def _commit_wave(tbl, spark, df, run_id, part_id, stats_cols):
    out = tbl.staging_dir(run_id, 0)
    df.coalesce(1).write.mode("overwrite").parquet(out)
    files = sorted(os.path.join(out, fn) for fn in os.listdir(out)
                   if fn.endswith(".parquet")
                   and not fn.startswith((".", "_")))
    tbl.commit(run_id, [{"part_id": part_id, "files": files,
                         "counters": {}}], "t", stats_cols=stats_cols)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.lpad(F.col("id").cast("string"),
                                    5, "0")).alias("url"))


def test_stats_agg_metadata_only(spark, tmp_path):
    """Three waves -> one manifest-only row: counts sum, bounds fold,
    flag true; values equal the brute-force aggregate."""
    tbl = IceTable(str(tmp_path / "t"))
    tbl.init_schema([("doc_id", "long"), ("url", "string")])
    for w, (lo, hi) in enumerate([(0, 40), (40, 90), (90, 100)]):
        _commit_wave(tbl, spark, _docs(spark, lo, hi), f"w{w}", w,
                     ("doc_id", "url"))
    row = tbl.stats_agg(spark, ("doc_id", "url")).collect()[0]
    assert row["metadata_only"] is True
    assert (row["n_rows"], row["min_doc_id"], row["max_doc_id"],
            row["min_url"], row["max_url"]) == \
        (100, 0, 99, "u00000", "u00099")


def test_stats_agg_delete_forces_scan(spark, tmp_path):
    """An equality delete makes manifest counts unsound: the flag
    drops and the SCANNED answer reflects the deletion."""
    tbl = IceTable(str(tmp_path / "t"))
    tbl.init_schema([("doc_id", "long"), ("url", "string")])
    _commit_wave(tbl, spark, _docs(spark, 0, 50), "w0", 0,
                 ("doc_id", "url"))
    keys = spark.createDataFrame([(0,), (49,)], "doc_id long")
    tbl.delete_where(spark, keys, ("doc_id",), "d0", "t")
    row = tbl.stats_agg(spark, ("doc_id",)).collect()[0]
    assert row["metadata_only"] is False
    assert (row["n_rows"], row["min_doc_id"], row["max_doc_id"]) == \
        (48, 1, 48)


def test_stats_agg_survives_compaction_and_rename(spark, tmp_path):
    """A sorted rewrite keeps the metadata answer (new files get fresh
    footer counts, kept bounds carry) and a rename resolves bounds
    recorded under the write-time name."""
    tbl = IceTable(str(tmp_path / "t"))
    tbl.init_schema([("doc_id", "long"), ("url", "string")])
    for w, (lo, hi) in enumerate([(0, 60), (60, 100)]):
        _commit_wave(tbl, spark, _docs(spark, lo, hi), f"w{w}", w,
                     ("doc_id", "url"))
    sizes = [os.path.getsize(f) for f in tbl.data_files()]
    tbl.compact(spark, target_file_bytes=2 * max(sizes) + 2,
                committed_at="t", sort_by="url")
    tbl.rename_column("url", "page_url")
    row = tbl.stats_agg(spark, ("page_url",)).collect()[0]
    assert row["metadata_only"] is True
    assert (row["n_rows"], row["min_page_url"], row["max_page_url"]) \
        == (100, "u00000", "u00099")


def test_stats_agg_missing_bounds_falls_back(spark, tmp_path):
    """A wave committed WITHOUT tracked bounds for the asked column
    forces the scan path — correctness never depends on metadata
    completeness."""
    tbl = IceTable(str(tmp_path / "t"))
    tbl.init_schema([("doc_id", "long"), ("url", "string")])
    _commit_wave(tbl, spark, _docs(spark, 0, 30), "w0", 0, ("doc_id",))
    row = tbl.stats_agg(spark, ("url",)).collect()[0]
    assert row["metadata_only"] is False
    assert (row["n_rows"], row["min_url"], row["max_url"]) == \
        (30, "u00000", "u00029")
