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


# --- WARC source/sink (Common-Crawl wire format) -----------------------

def _recs():
    import datetime
    return [
        ("https://a.example/1", datetime.datetime(2024, 3, 1, 12, 0, 5),
         b"<html>one</html>"),
        ("https://b.example/2", None, b"\x00\xffbinary \x1f\x8b payload"),
        ("https://c.example/3", datetime.datetime(2025, 1, 1), b""),
    ]


def test_warc_record_roundtrip_all_layouts():
    """Per-record gzip members (CC layout), whole-file gzip, and plain
    concatenation all parse back to identical (url, payload) rows."""
    import datetime
    import gzip
    from webextract.sources import iter_warc_responses, warc_record_bytes
    recs = _recs()
    plain = b"".join(warc_record_bytes(u, t, p) for u, t, p in recs)
    members = b"".join(gzip.compress(warc_record_bytes(u, t, p), 6,
                                     mtime=0) for u, t, p in recs)
    for blob in (plain, members, gzip.compress(plain, mtime=0)):
        out = list(iter_warc_responses(blob))
        assert [(u, p) for u, _, p in out] == [(u, p) for u, _, p in recs]
    # WARC-Date survives; missing ts falls back to the fixed epoch
    out = list(iter_warc_responses(members))
    assert out[0][1] == datetime.datetime(2024, 3, 1, 12, 0, 5)
    assert out[1][1] == datetime.datetime(2024, 1, 1)


def test_warc_skips_non_response_records():
    from webextract.sources import iter_warc_responses, warc_record_bytes
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4"
            b"\r\n\r\nabcd\r\n\r\n")
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: https://a.example/1\r\n"
           b"Content-Length: 0\r\n\r\n\r\n\r\n")
    rec = warc_record_bytes("https://x.example", None, b"payload")
    out = list(iter_warc_responses(info + req + rec))
    assert [u for u, _, _ in out] == ["https://x.example"]


def test_warc_truncation_and_garbage_total():
    """A torn shard yields its readable prefix; garbage yields nothing;
    nothing ever raises."""
    import gzip
    from webextract.sources import iter_warc_responses, warc_record_bytes
    recs = _recs()
    blob = b"".join(gzip.compress(warc_record_bytes(u, t, p), mtime=0)
                    for u, t, p in recs)
    first_len = len(gzip.compress(
        warc_record_bytes(*recs[0]), mtime=0))
    for cut in range(0, len(blob), 13):
        out = list(iter_warc_responses(blob[:cut]))
        assert len(out) <= 3
        if cut >= first_len:
            assert out and out[0][0] == recs[0][0]
    assert list(iter_warc_responses(b"not warc at all")) == []
    assert list(iter_warc_responses(b"")) == []


def test_warc_spark_roundtrip(spark, tmp_path):
    """write_warc -> read_warc over real partitions preserves every
    (url, warc_ts, html) row of the pages frame."""
    from webextract.sources import read_warc, write_warc
    out = str(tmp_path / "warcs")
    pages = pages_df(spark, 40, parallelism=4)
    write_warc(pages, out)
    import glob
    shards = glob.glob(out + "/*.warc.gz")
    assert 1 < len(shards) <= 4          # per-partition shards
    back = read_warc(spark, out + "/*.warc.gz")
    a = {r["url"]: (r["warc_ts"], bytes(r["html"]))
         for r in pages.collect()}
    b = {r["url"]: (r["warc_ts"], bytes(r["html"]))
         for r in back.collect()}
    assert a == b
