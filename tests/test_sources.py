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


# --- WET sink/source (the extracted-text sibling of WARC) --------------

def test_wet_record_roundtrip_unicode():
    """Conversion records survive UTF-8 text byte-for-byte, including
    multibyte and CRLF-bearing content (Content-Length is in BYTES)."""
    import gzip
    from webextract.sources import iter_warc_responses, wet_record_bytes
    texts = ["plain ascii", "héllo wörld — ünïcode", "tab\tand\r\nCRLF",
             "", "emoji \U0001f600 and 中文"]
    blob = b"".join(gzip.compress(
        wet_record_bytes(f"doc://{i}", None, t), 6, mtime=0)
        for i, t in enumerate(texts))
    back = list(iter_warc_responses(blob, want="conversion"))
    assert [u for u, _, _ in back] == [f"doc://{i}"
                                       for i in range(len(texts))]
    assert [p.decode("utf-8") for _, _, p in back] == texts


def test_wet_reader_skips_response_records():
    """A mixed shard (response + conversion records) yields only the
    requested type in each mode — WET readers never see raw HTML."""
    import gzip
    from webextract.sources import (iter_warc_responses,
                                    warc_record_bytes, wet_record_bytes)
    blob = (gzip.compress(warc_record_bytes(
                "https://x/1", None, b"<html>raw</html>"), 6, mtime=0)
            + gzip.compress(wet_record_bytes(
                "https://x/1", None, "extracted text"), 6, mtime=0))
    conv = list(iter_warc_responses(blob, want="conversion"))
    resp = list(iter_warc_responses(blob))
    assert [(u, p) for u, _, p in conv] == [("https://x/1",
                                             b"extracted text")]
    assert [(u, p) for u, _, p in resp] == [("https://x/1",
                                             b"<html>raw</html>")]


def test_wet_spark_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F
    from webextract.sources import read_wet, write_wet
    docs = spark.range(30).select(
        F.concat(F.lit("doc://"), F.col("id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.concat(F.lit("text body é "), F.col("id")).alias("text"))
    out = str(tmp_path / "wet")
    write_wet(docs.repartition(3), out)
    back = read_wet(spark, out + "/*.wet.gz")
    got = {r["url"]: r["text"] for r in back.collect()}
    assert got == {f"doc://{i}": f"text body é {i}" for i in range(30)}


# --- CDX writer + random-access fetch -----------------------------------

def test_surt_key_forms():
    from webextract.sources import surt_key
    assert surt_key("http://Example.COM/a/b?q=1") == "com,example)/a/b?q=1"
    assert surt_key("https://sub.example.com:8443/x") == \
        "com,example,sub:8443)/x"
    assert surt_key("http://example.com:80/") == "com,example)/"
    assert surt_key("https://example.com") == "com,example)/"
    assert surt_key("doc://42") == "doc://42"       # non-http passthrough
    assert surt_key("") == ""


def test_index_warc_fields_and_offsets(spark, tmp_path):
    """Every response record gets one CDX line; offsets are strictly
    increasing member starts, lengths sum to the shard size, digests
    differ across payloads, and fetch-by-offset recovers each payload."""
    import gzip
    from webextract import corpus
    from webextract.sources import index_warc, warc_record_bytes

    recs = _recs()
    shard = tmp_path / "s.warc.gz"
    shard.write_bytes(b"".join(
        gzip.compress(warc_record_bytes(u, t, p), 6, mtime=0)
        for u, t, p in recs))
    caps = corpus.parse_cdx(
        index_warc(spark, str(shard))).orderBy("offset").collect()
    assert len(caps) == len(recs)
    assert [c["status"] for c in caps] == [200] * 3
    assert [c["mime"] for c in caps] == ["text/html"] * 3
    offs = [c["offset"] for c in caps]
    assert offs[0] == 0 and offs == sorted(offs)
    assert sum(c["length"] for c in caps) == shard.stat().st_size
    assert caps[0]["surt"] == "example,a)/1"
    assert caps[0]["ts"] == "20240301120005"
    assert caps[1]["ts"] == "20240101000000"        # epoch default
    assert len({c["digest"] for c in caps}) == 3
    # range-read each member independently and compare payloads
    blob = shard.read_bytes()
    from webextract.sources import iter_warc_responses
    for c, (u, _, p) in zip(caps, recs):
        got = list(iter_warc_responses(
            blob[c["offset"]:c["offset"] + c["length"]]))
        assert got[0][0] == u and got[0][2] == p


def test_fetch_by_cdx_missing_file_and_nulls(spark, tmp_path):
    """Fetch rows pointing at absent shards or with NULL coordinates
    are skipped, never a task failure (a stale index entry must not
    kill a 10^9-row fetch job)."""
    import gzip
    from pyspark.sql import functions as F
    from webextract.sources import fetch_by_cdx, warc_record_bytes
    shard = tmp_path / "ok.warc.gz"
    member = gzip.compress(
        warc_record_bytes("https://ok/1", None, b"payload"), 6, mtime=0)
    shard.write_bytes(member)
    rows = [(str(shard), 0, len(member)),
            (str(tmp_path / "gone.warc.gz"), 0, 10),
            (None, 0, 10), (str(shard), None, None)]
    caps = spark.createDataFrame(
        rows, "filename string, offset long, length long")
    got = fetch_by_cdx(caps).collect()
    assert [(r["url"], bytes(r["html"])) for r in got] == [
        ("https://ok/1", b"payload")]


def test_index_warc_space_in_url_still_addressable(spark, tmp_path):
    """A url containing a space must not shear the CDXJ line's
    3-field split: the SURT is percent-encoded, the json url keeps
    the original, and the capture stays fetchable."""
    import gzip
    from webextract import corpus
    from webextract.sources import (fetch_by_cdx, index_warc,
                                    warc_record_bytes)
    shard = tmp_path / "sp.warc.gz"
    url = "https://x.example/a b/c"
    shard.write_bytes(gzip.compress(
        warc_record_bytes(url, None, b"<p>hi</p>"), 6, mtime=0))
    caps = corpus.parse_cdx(index_warc(spark, str(shard)))
    rows = caps.collect()
    assert len(rows) == 1
    assert rows[0]["surt"] == "example,x)/a%20b/c"
    assert rows[0]["url"] == url
    got = fetch_by_cdx(caps).collect()
    assert [(r["url"], bytes(r["html"])) for r in got] == [
        (url, b"<p>hi</p>")]


def test_index_warc_hostile_bytes(spark, tmp_path):
    """Garbage shards, torn members, and non-response records index to
    zero or partial lines — never a task failure."""
    import gzip
    from webextract import corpus
    from webextract.sources import index_warc, warc_record_bytes
    good = gzip.compress(
        warc_record_bytes("https://ok/1", None, b"x"), 6, mtime=0)
    cases = {
        "junk.warc.gz": b"\x00\xffnot a warc at all",
        "halfgzip.warc.gz": good[: len(good) // 2],
        "tail_torn.warc.gz": good + good[: len(good) // 2],
        "nonresp.warc.gz": gzip.compress(
            b"WARC/1.0\r\nWARC-Type: request\r\n"
            b"Content-Length: 2\r\n\r\nhi\r\n\r\n", 6, mtime=0),
        "empty.warc.gz": b"",
    }
    for name, blob in cases.items():
        (tmp_path / name).write_bytes(blob)
    caps = corpus.parse_cdx(
        index_warc(spark, str(tmp_path) + "/*.warc.gz")).collect()
    # only the readable prefix of tail_torn yields a line
    assert [(c["url"], c["offset"]) for c in caps] == [
        ("https://ok/1", 0)]


def test_fetch_by_cdx_garbage_coordinates(spark, tmp_path):
    """Offsets pointing mid-member or past EOF fetch nothing (the blob
    fails the gzip/WARC parse), never a task failure."""
    import gzip
    from pyspark.sql import functions as F
    from webextract.sources import fetch_by_cdx, warc_record_bytes
    shard = tmp_path / "g.warc.gz"
    member = gzip.compress(
        warc_record_bytes("https://ok/1", None, b"payload"), 6, mtime=0)
    shard.write_bytes(member)
    rows = [(str(shard), 3, len(member) - 3),     # mid-member
            (str(shard), 0, 4),                   # truncated member
            (str(shard), len(member) + 100, 50),  # past EOF
            (str(shard), 0, len(member))]         # the one good row
    caps = spark.createDataFrame(
        rows, "filename string, offset long, length long")
    got = fetch_by_cdx(caps).collect()
    assert [(r["url"], bytes(r["html"])) for r in got] == [
        ("https://ok/1", b"payload")]


def test_negative_content_length_terminates():
    """A record claiming a negative Content-Length must end iteration
    (it would otherwise move the cursor backward and loop forever)."""
    from webextract.sources import iter_warc_responses
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://x/1\r\n"
           b"Content-Length: -64\r\n\r\nbody\r\n\r\n")
    assert list(iter_warc_responses(rec)) == []


def test_writer_sanitizes_hostile_urls(spark=None):
    """Non-ASCII and CRLF-bearing urls are percent-encoded into the
    WARC header instead of crashing the writer or splicing forged
    header lines; clean urls pass through byte-identically."""
    from webextract.sources import (_safe_uri, iter_warc_responses,
                                    warc_record_bytes, wet_record_bytes)
    assert _safe_uri("https://ok/a-b_c?q=1") == "https://ok/a-b_c?q=1"
    hostile = "https://x/é\r\nContent-Length: 0\r\n/end"
    safe = _safe_uri(hostile)
    assert "\r" not in safe and "\n" not in safe
    assert safe.isascii()
    rec = warc_record_bytes(safe, None, b"p")
    (u, _, p), = list(iter_warc_responses(rec))
    assert u == safe and p == b"p"
    # the forged header must NOT have taken effect
    assert "content-length: 0" not in rec.decode("latin-1").lower() \
        or p == b"p"
    wrec = wet_record_bytes(safe, None, "t")
    (u2, _, p2), = list(iter_warc_responses(wrec, want="conversion"))
    assert u2 == safe and p2 == b"t"


def test_index_warc_tab_and_newline_urls(spark, tmp_path):
    """Tab/newline in a url must not shear or split the CDXJ line —
    the whole whitespace class is percent-encoded in the SURT."""
    import gzip
    from webextract import corpus
    from webextract.sources import (_safe_uri, index_warc,
                                    warc_record_bytes)
    shard = tmp_path / "ws.warc.gz"
    urls = ["https://x.example/a\tb", "https://x.example/c\nd"]
    shard.write_bytes(b"".join(
        gzip.compress(warc_record_bytes(_safe_uri(u), None, b"p"),
                      6, mtime=0) for u in urls))
    caps = corpus.parse_cdx(
        index_warc(spark, str(shard))).orderBy("offset").collect()
    assert len(caps) == 2
    assert caps[0]["surt"] == "example,x)/a%09b"
    assert caps[1]["surt"] == "example,x)/c%0Ad"
