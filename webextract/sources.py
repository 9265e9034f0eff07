"""Source readers: the pages-table contract across storage schemes.

Operator S4 (SURVEY.md §2.1): the reference accepts http/file/S3
sources per document (docling_serve HTTP fetch + S3 coords); in a
Spark-native engine a *source* is a table location, and object-store
access is a FILESYSTEM CONFIG concern, not per-row code — the same
`spark.read.parquet(...)` serves `file://`, `hdfs://`, `s3a://`,
`gs://`, `abfss://` once the session carries the Hadoop FS settings
for the scheme.  This module gives that contract a surface:

* ``read_pages`` — scheme-agnostic reader that validates the
  input_hint column contract (url, warc_ts, html[, text, lang]) at
  plan time, so a wrong table fails fast with a clear error instead of
  an executor-side kernel exception mid-job.
* ``s3a_configs`` — the session config dict a deployment sets for S3
  (endpoint/credentials provider knobs), documented in one place.
  No credentials are ever stored here; values come from the caller or
  instance-profile providers.
"""

from __future__ import annotations

import datetime
import gzip
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

# input_hint (BASELINE.json): required / optional pages-table columns
REQUIRED_COLS = ("url", "warc_ts", "html")
OPTIONAL_COLS = ("text", "lang")


def read_pages(spark: SparkSession, path: str | list[str],
               fmt: str = "parquet") -> DataFrame:
    """Read a pages table from any Hadoop-FS scheme and validate the
    input_hint contract.  Column pruning still reaches the scan — the
    select below keeps only contract columns, so a wide table never
    ships extras into the kernel."""
    paths = [path] if isinstance(path, str) else list(path)
    df = spark.read.format(fmt).load(paths)
    missing = [c for c in REQUIRED_COLS if c not in df.columns]
    if missing:
        raise ValueError(
            f"pages table at {paths} is missing required columns "
            f"{missing}; input_hint requires (url string, warc_ts "
            f"timestamp, html binary)")
    keep = [c for c in REQUIRED_COLS + OPTIONAL_COLS if c in df.columns]
    return df.select(*keep)


def s3a_configs(endpoint: str | None = None,
                credentials_provider: str | None = None) -> dict[str, str]:
    """The spark-defaults/session entries an S3 deployment sets (the
    hadoop-aws jars must be on the cluster classpath — not bundled in
    this sandbox).  Returns a dict to feed ``builder.config(k, v)``.

    Credentials NEVER appear here: the default provider chain reads
    instance profiles / env; override ``credentials_provider`` to pin
    one (e.g. WebIdentityTokenCredentialsProvider on EKS)."""
    cfg = {
        # committers: directory committer avoids O(files) S3 renames on
        # the wave write — the same reason IceTable commits manifests
        "spark.hadoop.fs.s3a.committer.name": "directory",
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a":
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory",
        # scan behavior for heavy sequential parquet reads
        "spark.hadoop.fs.s3a.experimental.input.fadvise": "sequential",
        "spark.hadoop.fs.s3a.connection.maximum": "96",
    }
    if endpoint:
        cfg["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if credentials_provider:
        cfg["spark.hadoop.fs.s3a.aws.credentials.provider"] = \
            credentials_provider
    return cfg


# ---------------------------------------------------------------------------
# WARC source/sink: the wire format Common-Crawl-style corpora actually
# arrive in (reference parity: docling-serve's HTTP sources ARE crawled
# pages, docling_serve/app.py convert-from-url surface; at corpus scale
# the fetch results live in WARC shards, not one URL per request).
#
# Scale shape: one ~1 GiB .warc.gz shard per task — per-RECORD gzip
# members (the Common Crawl convention) are decompressed as a stream,
# so peak memory is one record, not one file; a 10^12-doc crawl is
# ~10^8 shards, ample file-level parallelism for any executor count,
# and the reader is a narrow mapInPandas (no shuffle, content column
# only — binaryFile prunes path/mtime away).  Shards are not
# byte-splittable (gzip), which is WHY the ecosystem standardized on
# ~1 GiB files: the file IS the split.
# ---------------------------------------------------------------------------

WARC_SCHEMA = "url string, warc_ts timestamp, html binary"
_WARC_EPOCH = datetime.datetime(2024, 1, 1)


def warc_record_bytes(url: str, ts: datetime.datetime | None,
                      payload: bytes,
                      content_type: str = "text/html") -> bytes:
    """One WARC/1.0 response record wrapping an HTTP/1.1 200 response.
    Deterministic: no uuids, WARC-Date from ts (epoch default)."""
    ts = ts or _WARC_EPOCH
    http = (f"HTTP/1.1 200 OK\r\nContent-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("ascii") + payload
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n").encode("ascii")
    return hdr + http + b"\r\n\r\n"


def _parse_warc_headers(buf: bytes, start: int) -> tuple[dict, int] | None:
    """Parse a WARC header block at ``start``; returns ({lower-name:
    value}, body_offset) or None if malformed/not-WARC."""
    if buf[start:start + 5] != b"WARC/":
        return None
    he = buf.find(b"\r\n\r\n", start)
    if he == -1:
        return None
    headers: dict[str, str] = {}
    for line in buf[start:he].split(b"\r\n")[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1"))
    return headers, he + 4


def iter_warc_responses(blob: bytes) -> Iterator[
        tuple[str, datetime.datetime | None, bytes]]:
    """Yield (url, warc_ts, payload) for every response record in a
    WARC blob — per-record-gzip members (Common Crawl), whole-file
    gzip, or uncompressed.  Non-response records (warcinfo, request,
    metadata) are skipped; malformed tails stop iteration instead of
    raising (a torn shard yields its readable prefix)."""
    try:
        if blob[:2] == b"\x1f\x8b":
            pos = 0
            while pos < len(blob) and blob[pos:pos + 2] == b"\x1f\x8b":
                d = zlib.decompressobj(wbits=31)
                try:
                    member = d.decompress(blob[pos:])
                except zlib.error:
                    return
                if not d.eof:
                    return                       # truncated member
                yield from _iter_plain(member)
                consumed = (len(blob) - pos) - len(d.unused_data)
                if consumed <= 0:
                    return
                pos += consumed
        else:
            yield from _iter_plain(blob)
    except (ValueError, IndexError, UnicodeDecodeError):
        return


def _iter_plain(buf: bytes) -> Iterator[
        tuple[str, datetime.datetime | None, bytes]]:
    pos = 0
    n = len(buf)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and buf[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        parsed = _parse_warc_headers(buf, pos)
        if parsed is None:
            return
        headers, body_off = parsed
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        body = buf[body_off:body_off + clen]
        if len(body) < clen:
            return                               # truncated record
        pos = body_off + clen
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        ts = None
        raw_ts = headers.get("warc-date", "")
        try:
            ts = datetime.datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            pass
        payload = body
        if headers.get("content-type", "").startswith("application/http"):
            hend = body.find(b"\r\n\r\n")
            if hend != -1:
                payload = body[hend + 4:]
        yield (url, ts, payload)


def read_warc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """WARC shards -> input_hint page frame (url, warc_ts, html).

    Narrow plan: binaryFile scan (content column only — path/length
    pruned) -> mapInPandas record splitter; one task per shard, rows
    flushed per file so a fat shard never accumulates across files.
    Feed the result to ``pipeline.extracted_df`` exactly like a parquet
    pages table."""
    import pandas as pd

    paths = [path] if isinstance(path, str) else list(path)
    files = spark.read.format("binaryFile").load(paths)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                urls: list[str] = []
                tss: list[datetime.datetime | None] = []
                payloads: list[bytes] = []
                for url, ts, payload in iter_warc_responses(
                        bytes(content)):
                    urls.append(url)
                    tss.append(ts)
                    payloads.append(payload)
                if urls:
                    yield pd.DataFrame(
                        {"url": urls, "warc_ts": tss, "html": payloads})

    return files.select("content").mapInPandas(kern, WARC_SCHEMA)


def write_warc(pages: DataFrame, out_dir: str) -> None:
    """Pages -> per-partition .warc.gz shards (one gzip member per
    record, mtime=0 for determinism) — the layout ``read_warc``
    consumes and Common Crawl publishes.  Same atomic per-attempt tmp +
    rename protocol as the zip sink (pipeline.write_zip_artifacts), so
    a retried task never publishes a torn shard."""
    def _write(rows) -> None:
        import glob
        import itertools
        import os

        from pyspark import TaskContext
        first = next(rows, None)
        if first is None:
            return
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(out_dir, exist_ok=True)
        final = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        tmp = f"{final}.{ctx.taskAttemptId()}.tmp"
        with open(tmp, "wb") as f:
            for r in itertools.chain([first], rows):
                rec = warc_record_bytes(
                    r["url"] or "", r["warc_ts"],
                    bytes(r["html"]) if r["html"] is not None else b"")
                f.write(gzip.compress(rec, 6, mtime=0))
        os.replace(tmp, final)
        for stale in glob.glob(f"{final}.*.tmp"):
            try:
                os.remove(stale)
            except OSError:
                pass

    pages.select("url", "warc_ts", "html").foreachPartition(_write)
