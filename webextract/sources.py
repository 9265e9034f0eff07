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


def _iter_gzip_members(blob: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(offset, length, member_bytes) for each gzip member in a
    concatenated-member blob — THE member-walk protocol, shared by the
    record readers and the CDX indexer so offset accounting can never
    diverge between them.  A torn/garbage tail ends iteration.

    Feeds the decompressor bounded chunks off a memoryview instead of
    the whole remaining tail: `decompress(blob[pos:])` copies the tail
    in AND back out via ``unused_data`` for every member, which is
    O(shard²) in member count — a 50k-member shard paid ~1.25 TB of
    memcpy.  The chunked walk is O(shard) with at most one chunk of
    lookahead copied per member."""
    mv = memoryview(blob)
    n = len(blob)
    pos = 0
    while pos < n and blob[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out = []
        fed = 0
        # adaptive feed: start at 4 KiB (typical per-record member →
        # one iteration, tiny unused_data copy), double toward 1 MiB
        # so a whole-file-gzip member still walks in few iterations
        step = 1 << 12
        try:
            while not d.eof and pos + fed < n:
                piece = mv[pos + fed:pos + fed + step]
                out.append(d.decompress(piece))
                fed += len(piece)
                if step < (1 << 20):
                    step <<= 1
        except zlib.error:
            return
        if not d.eof:
            return                               # truncated member
        consumed = fed - len(d.unused_data)
        if consumed <= 0:
            return
        yield pos, consumed, b"".join(out)
        pos += consumed


def iter_warc_responses(blob: bytes, want: str = "response") -> Iterator[
        tuple[str, datetime.datetime | None, bytes]]:
    """Yield (url, warc_ts, payload) for every ``want``-typed record in
    a WARC blob — per-record-gzip members (Common Crawl), whole-file
    gzip, or uncompressed.  Other record types (warcinfo, request,
    metadata) are skipped; malformed tails stop iteration instead of
    raising (a torn shard yields its readable prefix).  ``want=
    "conversion"`` reads WET shards (same container, text payloads)."""
    try:
        if blob[:2] == b"\x1f\x8b":
            for _, _, member in _iter_gzip_members(blob):
                yield from _iter_plain(member, want)
        else:
            yield from _iter_plain(blob, want)
    except (ValueError, IndexError, UnicodeDecodeError):
        return


def _iter_plain(buf: bytes, want: str = "response") -> Iterator[
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
        if clen < 0:
            # a negative length would move pos BACKWARD and loop
            # forever over the same record — treat as malformed tail
            return
        body = buf[body_off:body_off + clen]
        if len(body) < clen:
            return                               # truncated record
        pos = body_off + clen
        if headers.get("warc-type") != want:
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


def _safe_uri(url: str) -> str:
    """WARC-header-safe form of a target URI: percent-encode control
    bytes, whitespace, and non-ASCII (as UTF-8 escapes) so a hostile
    url can neither splice forged header lines (CRLF injection into
    the record header) nor crash the writer's ascii encode.  Clean
    urls pass through unchanged; escaped urls round-trip as their
    escaped form — strictly better than the task abort they caused
    before."""
    out = []
    for ch in url:
        o = ord(ch)
        if o <= 0x20 or o == 0x7F or o > 0x7E:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


def _read_record_shards(spark: SparkSession, path: str | list[str],
                        want: str, schema: str, build) -> DataFrame:
    """THE shard reader shared by read_warc/read_wet: binaryFile scan
    (content column only — path/mtime pruned) -> mapInPandas record
    splitter; one task per shard, rows flushed per file so a fat shard
    never accumulates across files."""
    import pandas as pd

    paths = [path] if isinstance(path, str) else list(path)
    files = spark.read.format("binaryFile").load(paths)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                recs = list(iter_warc_responses(bytes(content), want))
                if recs:
                    yield build(pd, recs)

    return files.select("content").mapInPandas(kern, schema)


def _write_record_shards(df: DataFrame, out_dir: str, suffix: str,
                         record_fn) -> None:
    """THE atomic partition shard writer shared by write_warc/
    write_wet: one gzip member per record (mtime=0 for determinism),
    per-attempt tmp + rename (the zip-sink protocol,
    pipeline.write_zip_artifacts) so a retried task never publishes a
    torn shard."""
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
        final = os.path.join(out_dir, f"part-{pid:05d}.{suffix}")
        tmp = f"{final}.{ctx.taskAttemptId()}.tmp"
        with open(tmp, "wb") as f:
            for r in itertools.chain([first], rows):
                f.write(gzip.compress(record_fn(r), 6, mtime=0))
        os.replace(tmp, final)
        for stale in glob.glob(f"{final}.*.tmp"):
            try:
                os.remove(stale)
            except OSError:
                pass

    df.foreachPartition(_write)


def read_warc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """WARC shards -> input_hint page frame (url, warc_ts, html).
    Feed the result to ``pipeline.extracted_df`` exactly like a
    parquet pages table."""
    def build(pd, recs):
        return pd.DataFrame({"url": [u for u, _, _ in recs],
                             "warc_ts": [t for _, t, _ in recs],
                             "html": [p for _, _, p in recs]})

    return _read_record_shards(spark, path, "response",
                               WARC_SCHEMA, build)


def write_warc(pages: DataFrame, out_dir: str) -> None:
    """Pages -> per-partition .warc.gz shards — the layout
    ``read_warc`` consumes and Common Crawl publishes."""
    def rec(r) -> bytes:
        return warc_record_bytes(
            _safe_uri(r["url"] or ""), r["warc_ts"],
            bytes(r["html"]) if r["html"] is not None else b"")

    _write_record_shards(pages.select("url", "warc_ts", "html"),
                         out_dir, "warc.gz", rec)


# ---------------------------------------------------------------------------
# WET sink/source: Common Crawl's extracted-text sibling of the WARC
# shards — the SAME WARC/1.0 container, but records are WARC-Type:
# conversion with a text/plain UTF-8 payload (the crawl's published
# "just the text" artifact).  This is the wire format THIS pipeline's
# own output ships in at corpus scale: extract once, publish WET,
# every downstream consumer (dedup, quality, tokenizer training)
# reads text shards without re-parsing HTML.
# Scale shape: identical to the WARC pair — one gzip member per
# record, shard = split, reader is a narrow mapInPandas.
# ---------------------------------------------------------------------------

WET_SCHEMA = "url string, warc_ts timestamp, text string"


def wet_record_bytes(url: str, ts: datetime.datetime | None,
                     text: str) -> bytes:
    """One WARC/1.0 conversion record (the WET layout).  Deterministic:
    no uuids, WARC-Date from ts (epoch default), UTF-8 payload."""
    ts = ts or _WARC_EPOCH
    payload = (text or "").encode("utf-8")
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n").encode("ascii")
    return hdr + payload + b"\r\n\r\n"


def read_wet(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """WET shards -> (url, warc_ts, text) — the text-table contract
    the corpus operators consume.  Same shard reader as read_warc;
    only the record type and the row builder differ."""
    def build(pd, recs):
        return pd.DataFrame(
            {"url": [u for u, _, _ in recs],
             "warc_ts": [t for _, t, _ in recs],
             "text": [p.decode("utf-8", "replace")
                      for _, _, p in recs]})

    return _read_record_shards(spark, path, "conversion",
                               WET_SCHEMA, build)


def write_wet(docs: DataFrame, out_dir: str) -> None:
    """(url, warc_ts, text) -> per-partition .wet.gz shards — the
    layout ``read_wet`` consumes.  Same atomic shard writer as
    write_warc; only the record builder differs."""
    def rec(r) -> bytes:
        return wet_record_bytes(
            _safe_uri(r["url"] or ""), r["warc_ts"], r["text"] or "")

    _write_record_shards(docs.select("url", "warc_ts", "text"),
                         out_dir, "wet.gz", rec)


# ---------------------------------------------------------------------------
# CDX index writer + random-access fetch: the storage side of the
# capture index corpus.parse_cdx consumes.  Common Crawl publishes
# one CDXJ index per crawl so consumers can range-GET any payload by
# (filename, offset, length) WITHOUT scanning the WARC store —
# index_warc is the job that produces that index from written shards,
# fetch_by_cdx is the consumer's random-access read path.
# Scale shape: indexing is one task per shard (narrow, nothing
# shuffles — the index rides the same file-level parallelism as the
# shards); fetch is a narrow mapInPandas where each row costs one
# range read + one member gunzip (locally a seek; in production an
# object-store ranged GET against the same offsets).
# ---------------------------------------------------------------------------

CDX_TEXT_SCHEMA = "shard string, cdx_text string"


def surt_key(url: str) -> str:
    """Canonical SURT form of a url — 'com,example)/path?query':
    reversed lowercase host labels, default ports dropped, non-default
    ports kept after the labels.  Non-http(s) schemes pass through
    unchanged (a doc:// corpus still indexes uniquely)."""
    import re
    m = re.match(r"(?i)^(https?)://([^/?#]*)([^#]*)", url or "")
    if not m:
        return url or ""
    scheme = m.group(1).lower()
    hostport = m.group(2).lower()
    host, _, port = hostport.partition(":")
    key = ",".join(reversed(host.split(".")))
    if port and not ((scheme == "http" and port == "80")
                     or (scheme == "https" and port == "443")):
        key += ":" + port
    rest = m.group(3) or "/"
    return key + ")" + rest


def _response_meta(member: bytes) -> tuple | None:
    """(url, ts, status, mime, payload) for the response record at the
    start of ``member``; None for non-response/malformed members."""
    parsed = _parse_warc_headers(member, 0)
    if parsed is None:
        return None
    headers, body_off = parsed
    if headers.get("warc-type") != "response":
        return None
    url = headers.get("warc-target-uri") or ""
    try:
        clen = int(headers.get("content-length", ""))
    except ValueError:
        return None
    body = member[body_off:body_off + clen]
    if len(body) < clen:
        return None
    ts = None
    try:
        ts = datetime.datetime.strptime(
            headers.get("warc-date", ""), "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        pass
    status, mime, payload = None, None, body
    if headers.get("content-type", "").startswith("application/http"):
        hend = body.find(b"\r\n\r\n")
        if hend != -1:
            payload = body[hend + 4:]
            http_lines = body[:hend].split(b"\r\n")
            first = http_lines[0].split()
            if len(first) >= 2 and first[1].isdigit():
                status = int(first[1])
            for hl in http_lines[1:]:
                k, sep, v = hl.partition(b":")
                if sep and k.strip().lower() == b"content-type":
                    mime = v.strip().decode("latin-1").split(";")[0]
    return url, ts, status, mime, payload


def index_warc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """.warc.gz shards -> CDXJ index shards (shard, cdx_text): one
    ``SURT ts {json}`` line per response record, json fields (url,
    mime, status, digest, length, offset, filename) — EXACTLY the
    shape corpus.parse_cdx admits, so write->index->parse->fetch is a
    closed loop.  offset/length address the record's own gzip member
    inside the shard (the Common Crawl addressing contract); digest is
    the base32 sha1 of the decompressed payload; lines are sorted by
    (SURT, ts) within the shard as published indexes are."""
    import base64
    import hashlib
    import json as _json

    import pandas as pd

    paths = [path] if isinstance(path, str) else list(path)
    files = spark.read.format("binaryFile").load(paths)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shards: list[str] = []
            texts: list[str] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                fname = fpath[5:] if fpath.startswith("file:") else fpath
                blob = bytes(content)
                lines: list[str] = []
                for pos, consumed, member in _iter_gzip_members(blob):
                    meta = _response_meta(member)
                    if meta is None:
                        continue
                    url, ts, status, mime, payload = meta
                    j = {"url": url}
                    if mime is not None:
                        j["mime"] = mime
                    if status is not None:
                        j["status"] = str(status)
                    j["digest"] = base64.b32encode(
                        hashlib.sha1(payload).digest()).decode()
                    j["length"] = str(consumed)
                    j["offset"] = str(pos)
                    j["filename"] = fname
                    ts14 = (ts or _WARC_EPOCH).strftime("%Y%m%d%H%M%S")
                    # CDXJ lines are space-delimited and parse_cdx's
                    # admission regex is \S-anchored: ANY whitespace
                    # in the url (space, tab, newline, CR, FF, VT)
                    # would shear or split the line and silently drop
                    # the capture — percent-encode the whole class
                    # (the json url field keeps the original for the
                    # fetch side)
                    surt = surt_key(url)
                    for ws, esc in ((" ", "%20"), ("\t", "%09"),
                                    ("\n", "%0A"), ("\r", "%0D"),
                                    ("\x0b", "%0B"), ("\x0c", "%0C")):
                        surt = surt.replace(ws, esc)
                    lines.append(f"{surt} {ts14} {_json.dumps(j)}")
                lines.sort()
                shards.append(fname)
                texts.append("\n".join(lines))
            if shards:
                yield pd.DataFrame({"shard": shards, "cdx_text": texts})

    return files.select("path", "content").mapInPandas(
        kern, CDX_TEXT_SCHEMA)


def fetch_by_cdx(captures: DataFrame) -> DataFrame:
    """CDX capture rows (filename, offset, length) -> (url, warc_ts,
    html): random-access payload fetch — each row costs ONE range read
    and ONE member gunzip, never a shard scan.  Narrow mapInPandas
    over the capture frame (its partitioning IS the fetch
    parallelism); handles are reused per batch so same-shard captures
    don't reopen the file.  In production ``filename`` resolves to an
    object-store ranged GET against the same (offset, length)."""
    import pandas as pd

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            tss: list[datetime.datetime | None] = []
            payloads: list[bytes] = []
            handles: dict[str, object] = {}
            try:
                for fname, off, ln in zip(
                        pdf["filename"], pdf["offset"], pdf["length"]):
                    # NULL coords arrive as None OR NaN (pandas
                    # turns a nullable long column into float64); a
                    # hostile negative offset would raise in seek()
                    # and a negative length would read(-1) = the
                    # whole rest of the shard — skip, never abort
                    if (fname is None or pd.isna(off) or pd.isna(ln)
                            or off < 0 or ln <= 0):
                        continue
                    f = handles.get(fname)
                    if f is None:
                        try:
                            f = handles[fname] = open(fname, "rb")
                        except OSError:
                            continue
                    f.seek(int(off))
                    blob = f.read(int(ln))
                    for url, ts, payload in iter_warc_responses(blob):
                        urls.append(url)
                        tss.append(ts)
                        payloads.append(payload)
            finally:
                for f in handles.values():
                    f.close()
            if urls:
                yield pd.DataFrame(
                    {"url": urls, "warc_ts": tss, "html": payloads})

    return (captures.select("filename", "offset", "length")
            .mapInPandas(kern, WARC_SCHEMA))
