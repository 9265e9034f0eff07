"""Multimodal column plumbing: decode / feature-extract / frame-sample.

Images/audio/video ride as opaque `binary` columns with typed metadata
structs.  Image HEADER decode (magic bytes + dimensions for
PNG/JPEG/GIF/BMP/WEBP) is REAL — pure-stdlib struct parsing, no
codec library needed.  Full raster/audio/video decode would need
PIL/ffmpeg/librosa which are NOT in this container, so that step is
STUBBED behind `WEBEXTRACT_REAL_MEDIA` — the deterministic fake derives
metadata purely from the payload bytes so the Spark-side plumbing
(schema, Arrow batch shape, mapInPandas signature, partitioning) is
real and fully tested, and the fake decode is SQL-expressible for the
DuckDB oracle.

Batch shape: mapInPandas receives pandas DataFrames of (doc_id: int64,
media: bytes); payload bytes are examined per element with vectorized
pandas ops where possible.  At 100 TB the media column dominates row
size → the caller repartitions by payload-size tier exactly like the
HTML path (pipeline.extracted_df).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from webextract import jpegmini

REAL_MEDIA = os.environ.get("WEBEXTRACT_REAL_MEDIA", "") == "1"


def _spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Conditional parallelism barrier for the CPU-heavy codec kernels —
    the media twin of corpus._spread (same probe, same skip-at-scale
    contract).  A single-row-group test parquet yields ONE scan task no
    matter how fine maxPartitionBytes is (a Parquet row group is the
    split atom), which serialized every encode+decode fixture onto one
    core (measured: media_video_ocr 35.8 s on local[32] = pure serial).
    The exchange, when it fires, carries the column-pruned narrow input
    (doc_id [+ text]) — never a media payload; at 100 TB the source
    arrives as thousands of row groups and the barrier self-disables."""
    from webextract.session import est_scan_partitions
    p = df.sparkSession.sparkContext.defaultParallelism
    if est_scan_partitions(df) < p:
        return df.repartition(p * 2, F.col(key))
    return df


def _media_from_doc_id(make_fn):
    """Factory for the with_X_media gate-input generators (r4 review:
    the per-codec wrappers were N copies of one closure): attach a
    `media` column of make_fn(doc_id) bytes via a narrow mapInPandas."""
    def attach(docs: DataFrame) -> DataFrame:
        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"],
                     "media": [make_fn(int(d)) for d in pdf["doc_id"]]})

        return _spread(docs.select("doc_id")).mapInPandas(
            gen, "doc_id bigint, media binary")

    return attach


def _media_from_text(render_fn):
    """Same factory for text-rendered payloads: media = render_fn(text)."""
    def attach(docs: DataFrame) -> DataFrame:
        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"],
                     "media": [render_fn(t or "") for t in pdf["text"]]})

        return _spread(docs.select("doc_id", "text")).mapInPandas(
            gen, "doc_id bigint, media binary")

    return attach

MEDIA_META_SCHEMA = ("doc_id bigint, n_bytes bigint, fmt string, "
                     "width int, height int, n_frames int")

_FMTS = ("jpeg", "png", "webp")


def parse_image_header(b: bytes) -> tuple[str, int, int] | None:
    """REAL image-header decode: (fmt, width, height) from magic bytes,
    or None if the payload is not a recognized image.  Pure stdlib —
    the subset of header parsing PIL does before any raster work.
    Never raises: a truncated/corrupt header returns None."""
    import struct
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return ("png", w, h)
        if b[:2] == b"\xff\xd8":                     # JPEG: scan for SOFn
            i = 2
            while i + 2 <= len(b):
                if b[i] != 0xFF:
                    return None
                marker = b[i + 1]
                if marker == 0xFF:
                    i += 1          # spec-legal fill byte before marker
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                if i + 4 > len(b):
                    return None     # truncated before segment length
                seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
                # SOF0-15 minus DHT(C4)/JPG(C8)/DAC(CC)
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if i + 9 > len(b):
                        return None  # SOF dims truncated
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    return ("jpeg", w, h)
                i += 2 + seglen
            return None
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return ("gif", w, h)
        # reserved bytes 6-9 must be zero — also rejects ASCII text
        # that happens to start with "BM"
        if b[:2] == b"BM" and len(b) >= 26 and b[6:10] == b"\x00\x00\x00\x00":
            w, h = struct.unpack("<ii", b[18:26])
            return ("bmp", w, abs(h))
        if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            chunk = b[12:16]
            if chunk == b"VP8X" and len(b) >= 30:    # 24-bit w-1 / h-1
                w = int.from_bytes(b[24:27], "little") + 1
                h = int.from_bytes(b[27:30], "little") + 1
                return ("webp", w, h)
            if chunk == b"VP8 " and len(b) >= 30:
                w, h = struct.unpack("<HH", b[26:30])
                return ("webp", w & 0x3FFF, h & 0x3FFF)
            if chunk == b"VP8L" and len(b) >= 25:    # 14-bit packed
                bits = int.from_bytes(b[21:25], "little")
                return ("webp", (bits & 0x3FFF) + 1,
                        ((bits >> 14) & 0x3FFF) + 1)
        return None
    except (struct.error, IndexError):
        return None


def _wav_chunk_walk(b: bytes) -> tuple | None:
    """ONE chunk walk shared by header and PCM decode (round-4 review:
    the two previously walked independently and could disagree about
    WHICH data chunk defined the frame count).  Returns (rate, ch, bps,
    n_frames, data_off, data_size) using the FIRST data chunk following
    a valid fmt chunk — the `wave` module's convention — or None."""
    import struct
    try:
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        i = 12
        rate = ch = bps = None
        data_off = data_size = None
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            size = struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(b):
                ch, rate = struct.unpack("<HI", b[i + 10:i + 16])
                bps = struct.unpack("<H", b[i + 22:i + 24])[0]
            elif (cid == b"data" and rate is not None
                  and data_off is None):
                data_off, data_size = i + 8, size
            i += 8 + size + (size & 1)        # chunks are word-aligned
        if not rate or data_off is None:
            # rate None (no fmt chunk) or 0 (corrupt header): a zero
            # rate would ZeroDivisionError the duration math downstream
            # and kill the task (round-3 review) — nulls, not a crash
            return None
        block = max(1, ch * (bps // 8))
        return (rate, ch, bps, data_size // block, data_off, data_size)
    except (struct.error, IndexError, TypeError):
        return None


def parse_wav_header(b: bytes) -> tuple[int, int, int, int] | None:
    """REAL WAV header decode: (sample_rate, channels, bits_per_sample,
    n_frames) from the RIFF/WAVE fmt + data chunks.  Pure stdlib chunk
    walk (the subset `wave` does before reading samples); returns None
    for non-WAV/corrupt payloads, never raises."""
    out = _wav_chunk_walk(b)
    return None if out is None else out[:4]


def make_wav_bytes(doc_id: int) -> bytes:
    """Deterministic VALID WAV payload for the header-decode gate:
    rate/channels/frames are pure functions of doc_id; fixed 128-byte
    payload (44-byte canonical header + zero samples, truncated data
    declared honestly in the chunk size)."""
    import struct
    rate = (8000, 16000, 22050, 44100)[doc_id % 4]
    ch = 1 + doc_id % 2
    bps = 16
    n_frames = 100 + doc_id % 900
    data_size = n_frames * ch * (bps // 8)
    hdr = (b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                   rate * ch * (bps // 8),
                                   ch * (bps // 8), bps)
           + b"data" + struct.pack("<I", data_size))
    return hdr.ljust(128, b"\x00")


def make_wav_pcm_bytes(doc_id: int) -> bytes:
    """Deterministic VALID WAV with REAL 16-bit PCM content (round-3
    verdict item 5): rate/channels from the header-gate formulas,
    64 + doc_id%64 frames, interleaved samples
    s(i, c) = ((doc_id*131 + i*17 + c*7919) % 65536) - 32768 —
    a pure integer function of (doc_id, frame, channel) so the DuckDB
    oracle recomputes every sample."""
    import struct
    rate = (8000, 16000, 22050, 44100)[doc_id % 4]
    ch = 1 + doc_id % 2
    nf = 64 + doc_id % 64
    samples = [((doc_id * 131 + i * 17 + c * 7919) % 65536) - 32768
               for i in range(nf) for c in range(ch)]
    data = struct.pack(f"<{len(samples)}h", *samples)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                    rate * ch * 2, ch * 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def parse_wav_pcm(b: bytes) -> tuple[int, int, int, list[list[int]]] | None:
    """REAL PCM decode: (rate, channels, n_frames, per-channel sample
    lists) from a 16-bit PCM WAV.  Pure-stdlib chunk walk + struct
    unpack (what `wave`+`audioop` would do); None for non-WAV /
    non-16-bit / truncated payloads, never raises."""
    import struct
    try:
        walk = _wav_chunk_walk(b)
        if walk is None:
            return None
        rate, ch, bps, nf, data_off, data_size = walk
        if bps != 16 or ch < 1 or nf == 0:
            return None
        data = b[data_off:data_off + data_size]
        if len(data) < nf * ch * 2:
            return None     # truncated: honest None, not a silently
                            # partial decode
        flat = struct.unpack(f"<{nf * ch}h", data[:2 * nf * ch])
        return (rate, ch, nf, [list(flat[c::ch]) for c in range(ch)])
    except (struct.error, IndexError, ValueError):
        return None


def wav_pcm_summary(b: bytes) -> str | None:
    """Deterministic transcript STAND-IN built from REAL decoded PCM
    (the ASR-model slot, reference docs/usage.md:14 `audio` input):
    integer per-channel signal statistics serialized as text, so the
    summary is exact in SQL and the `audio` InputFormat carries a
    content-bearing gate like every other format."""
    dec = parse_wav_pcm(b)
    if dec is None:
        return None
    rate, ch, nf, chans = dec
    parts = [f"audio {rate} hz {ch} ch {nf} frames"]
    for c, vals in enumerate(chans):
        parts.append(f"channel {c} min {min(vals)} max {max(vals)} "
                     f"sum {sum(vals)}")
    return " ".join(parts)


AUDIO_PCM_SCHEMA = ("doc_id bigint, channel int, n_samples bigint, "
                    "s_min int, s_max int, s_sum bigint, "
                    "s_mean double, s_rms double")


def audio_pcm_stats(df: DataFrame) -> DataFrame:
    """df(doc_id, media:binary) → one row per (doc, channel) with REAL
    decoded-PCM statistics (min/max/sum exact ints; mean/RMS rounded
    4dp).  1→N mapInPandas like frame_sample; non-PCM rows drop."""
    import math

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                dec = parse_wav_pcm(m if m is not None else b"")
                if dec is None:
                    continue
                _, _, nf, chans = dec
                for c, vals in enumerate(chans):
                    rows.append({
                        "doc_id": did, "channel": c, "n_samples": nf,
                        "s_min": min(vals), "s_max": max(vals),
                        "s_sum": sum(vals),
                        "s_mean": round(sum(vals) / nf, 4),
                        "s_rms": round(math.sqrt(
                            sum(v * v for v in vals) / nf), 4)})
            yield pd.DataFrame(
                rows, columns=["doc_id", "channel", "n_samples", "s_min",
                               "s_max", "s_sum", "s_mean", "s_rms"])

    return df.select("doc_id", "media").mapInPandas(fn, AUDIO_PCM_SCHEMA)


AUDIO_SILENCE_SCHEMA = ("doc_id bigint, channel int, n_silent bigint, "
                        "n_runs bigint, longest_run bigint")


def audio_silence(df: DataFrame, threshold: int = 4096,
                  min_run: int = 4) -> DataFrame:
    """df(doc_id, media:binary) → one row per (doc, channel) with
    REAL decoded-PCM silence segmentation: n_silent = samples with
    |amplitude| < threshold, n_runs = maximal consecutive-silent runs
    of length ≥ min_run, longest_run = the longest silent run (0 when
    none) — the voice-activity pre-gate an audio corpus pipeline runs
    before spending ASR compute (drop dead air, split on pauses).

    All-integer per-channel outputs over exact decoded int16 samples,
    so the oracle recomputes every run from the (doc_id, frame,
    channel) sample formula.  Same 1→N mapInPandas shape as
    audio_pcm_stats: per-payload work, embarrassingly parallel,
    non-PCM rows drop."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                dec = parse_wav_pcm(m if m is not None else b"")
                if dec is None:
                    continue
                for c, vals in enumerate(dec[3]):
                    n_sil = n_runs = longest = cur = 0
                    for v in vals:
                        if -threshold < v < threshold:
                            n_sil += 1
                            cur += 1
                        else:
                            if cur >= min_run:
                                n_runs += 1
                            longest = max(longest, cur)
                            cur = 0
                    if cur >= min_run:
                        n_runs += 1
                    longest = max(longest, cur)
                    rows.append({"doc_id": did, "channel": c,
                                 "n_silent": n_sil, "n_runs": n_runs,
                                 "longest_run": longest})
            yield pd.DataFrame(
                rows, columns=["doc_id", "channel", "n_silent",
                               "n_runs", "longest_run"])

    return df.select("doc_id", "media").mapInPandas(
        fn, AUDIO_SILENCE_SCHEMA)


# Attach a `media` column of REAL 16-bit-PCM WAV bytes built from
with_pcm_wav_media = _media_from_doc_id(make_wav_pcm_bytes)


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic stand-in for image/video header decode: metadata is
    a pure function of payload length (so the oracle can recompute it
    from octet_length).  Real decode would parse magic bytes + headers."""
    n = len(payload)
    return {"n_bytes": n, "fmt": _FMTS[n % 3],
            "width": 16 + n % 512, "height": 16 + (n * 7) % 512,
            "n_frames": 1 + n % 24}


def decode_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, media:binary) → metadata rows.

    Recognized image payloads get REAL header decode (magic bytes +
    dimensions); anything else falls through to the deterministic fake
    (the full-raster path PIL/ffmpeg would serve is the REAL_MEDIA
    stub)."""
    if REAL_MEDIA:
        raise NotImplementedError(
            "full raster decode requires PIL/ffmpeg — not in this container")
    for pdf in batches:
        metas = []
        for m in pdf["media"]:
            m = m if m is not None else b""
            hdr = parse_image_header(m)
            if hdr is not None:
                fmt, w, h = hdr
                metas.append({"n_bytes": len(m), "fmt": fmt, "width": w,
                              "height": h, "n_frames": 1})
            else:
                metas.append(fake_decode_meta(m))
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def media_meta(df: DataFrame) -> DataFrame:
    """df(doc_id, media:binary) → (doc_id, n_bytes, fmt, width, height,
    n_frames).  Narrow mapInPandas pass; Arrow both directions."""
    return df.select("doc_id", "media").mapInPandas(
        decode_meta_batches, MEDIA_META_SCHEMA)


AUDIO_META_SCHEMA = ("doc_id bigint, sample_rate int, channels int, "
                     "bits int, n_frames bigint, duration_ms bigint")


def audio_meta(df: DataFrame) -> DataFrame:
    """df(doc_id, media:binary) → REAL WAV header metadata (non-WAV
    rows get nulls).  Narrow mapInPandas pass, same plumbing shape as
    media_meta."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                hdr = parse_wav_header(m if m is not None else b"")
                if hdr is None:
                    rows.append({"doc_id": did, "sample_rate": None,
                                 "channels": None, "bits": None,
                                 "n_frames": None, "duration_ms": None})
                else:
                    rate, ch, bps, nf = hdr
                    rows.append({"doc_id": did, "sample_rate": rate,
                                 "channels": ch, "bits": bps,
                                 "n_frames": nf,
                                 "duration_ms": nf * 1000 // rate})
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media").mapInPandas(fn, AUDIO_META_SCHEMA)


# Attach a `media` column of REAL WAV bytes built from doc_id.
with_wav_media = _media_from_doc_id(make_wav_bytes)


def make_avi_bytes(doc_id: int) -> bytes:
    """Deterministic VALID uncompressed AVI (RIFF 'AVI ' with hdrl +
    movi lists, '00db' raw BGR frames): dimensions reuse the BMP
    formulas, n_frames = 3 + doc_id % 6.  The fixed header layout puts
    frame k's data at byte 232 + k*(8 + stride*h) — the formula the
    DuckDB oracle recomputes, while the PARSER below finds frames by
    really walking the RIFF tree."""
    import struct
    w = 4 + doc_id % 5
    h = 3 + doc_id % 4
    nf = 3 + doc_id % 6
    stride = (3 * w + 3) & ~3
    fs = stride * h

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + struct.pack("<I", len(data)) + data \
            + (b"\x00" if len(data) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(body)) + kind + body

    avih = struct.pack("<14I", 33367, fs * 30, 0, 0, nf, 0, 1, fs, w, h,
                       0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<12I", 0, 0, 0, 1, 30, 0,
                                            nf, fs, 0, 0, 0, 0))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fs,
                       2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    frames = b"".join(
        chunk(b"00db", bytes((doc_id + k + i) % 256
                             for i in range(fs)))
        for k in range(nf))
    movi = lst(b"movi", frames)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_frames(b: bytes) -> list[tuple[int, int, int]] | None:
    """REAL RIFF/AVI container walk: [(frame_idx, data_offset,
    data_size)] for every '00db'/'00dc' chunk inside the movi list.
    Pure-stdlib tree walk (the index a demuxer builds before seeking);
    None for non-AVI/corrupt payloads, never raises."""
    import struct
    try:
        if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
            return None
        out: list[tuple[int, int, int]] = []
        # declared extents are clamped to the REAL buffer (r4 review:
        # a mid-frame truncation must not yield offsets past len(b)),
        # and the walk is an explicit stack, not recursion (a payload
        # of thousands of nested LISTs must return, not RecursionError)
        top_end = min(8 + struct.unpack("<I", b[4:8])[0], len(b))
        stack: list[tuple[int, int]] = [(12, top_end)]
        while stack:
            i, end = stack.pop()
            while i + 8 <= end:
                cid = b[i:i + 4]
                size = struct.unpack("<I", b[i + 4:i + 8])[0]
                if i + 8 + size > end:
                    break                     # truncated chunk: stop
                if cid == b"LIST":
                    stack.append((i + 8 + size + (size & 1), end))
                    i, end = i + 12, i + 8 + size
                    continue
                if cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                    out.append((len(out), i + 8, size))
                i += 8 + size + (size & 1)
        return out if out else None
    except (struct.error, IndexError):
        return None


FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame_off bigint"


def frame_sample_batches(stride: int):
    """UDTF-style 1→N frame sampler: emit every `stride`-th frame's
    byte offset.  AVI payloads get REAL offsets from the RIFF
    container walk (parse_avi_frames); other payloads fall through to
    the deterministic fake (fixed-size 4 KiB frames) standing in for
    codecs that need ffmpeg."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if REAL_MEDIA:
            raise NotImplementedError("real frame decode not available")
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                m = m if m is not None else b""
                frames = parse_avi_frames(m)
                if frames is not None:        # REAL container offsets
                    for j, off, _sz in frames[::stride]:
                        ids.append(did)
                        idxs.append(j)
                        offs.append(off)
                    continue
                # single source of truth with media_meta (round-3
                # review): recognized still images really have ONE
                # frame; everything else gets fake_decode_meta's
                # formula — never two contradicting frame counts for
                # the same payload
                n_frames = (1 if parse_image_header(m) is not None
                            else fake_decode_meta(m)["n_frames"])
                for j in range(0, n_frames, stride):
                    ids.append(did)
                    idxs.append(j)
                    offs.append(j * 4096)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame_off": offs})

    return fn


# Attach a `media` column of REAL AVI bytes built from doc_id
with_avi_media = _media_from_doc_id(make_avi_bytes)


def make_mjpeg_avi_bytes(doc_id: int) -> bytes:
    """Deterministic VALID motion-JPEG AVI — the COMPRESSED-video wire
    format (fourcc 'MJPG'): every '00dc' chunk in the movi list is a
    REAL baseline JPEG (YCbCr 4:2:0, restart interval 2) produced by
    the same encoder as make_jpeg_raster_bytes.  Frame k's pixels are
    per-8x8-block solid gray (doc_id*11 + k*19 + bx*29 + by*37) % 256
    — DC-only under flat q=1, so the per-frame Huffman/RST/IDCT decode
    is byte-exact and the DuckDB oracle recomputes frame stats from
    the block formula.  (The reference rasterizes video through
    ffmpeg-backed deps, docs/usage.md:16-30; MJPEG is the codec this
    sandbox can implement for real end to end.)"""
    bw = 2 + doc_id % 3
    bh = 1 + doc_id % 3
    w, h = bw * 8, bh * 8
    nf = 1 + doc_id % 3
    frames = []
    for k in range(nf):
        rows = [bytes((doc_id * 11 + k * 19
                       + (x // 8) * 29 + (y // 8) * 37) % 256
                      for x in range(w)) for y in range(h)]
        frames.append(jpegmini.jpeg_encode_gray(w, h, rows,
                                                color=True, restart=2))
    return _avi_mjpeg_container(frames, w, h)


def _avi_mjpeg_container(frames: list[bytes], w: int, h: int) -> bytes:
    """RIFF/AVI scaffolding around pre-encoded MJPEG '00dc' frames
    (shared by the stats fixture and the video-OCR fixture)."""
    import struct

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + struct.pack("<I", len(data)) + data \
            + (b"\x00" if len(data) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(body)) + kind + body

    nf = len(frames)
    max_fs = max(len(f) for f in frames)
    avih = struct.pack("<14I", 33367, max_fs * 30, 0, 0, nf, 0, 1,
                       max_fs, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<12I", 0, 0, 0, 1, 30, 0,
                                            nf, max_fs, 0, 0, 0, 0))
    # biCompression = the 'MJPG' fourcc as a little-endian dword
    strf = struct.pack("<Iii2H", 40, w, h, 1, 24) + b"MJPG" \
        + struct.pack("<IiiII", max_fs, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


with_mjpeg_media = _media_from_doc_id(make_mjpeg_avi_bytes)


VIDEO_FRAME_STATS_SCHEMA = (
    "doc_id bigint, frame_idx int, n_px bigint, "
    "r_min int, r_max int, r_mean double, "
    "g_min int, g_max int, g_mean double, "
    "b_min int, b_max int, b_mean double")


def video_frame_stats(df: DataFrame) -> DataFrame:
    """REAL compressed-video frame decode: walk the RIFF/AVI container
    (parse_avi_frames), entropy-decode every MJPEG frame through the
    full baseline-JPEG path, and emit per-frame per-channel pixel
    stats — a 1→N narrow mapInPandas kernel, the frame-level sibling
    of raster_stats.  Frames that are not decodable rasters (e.g. raw
    '00db' payloads from the uncompressed flavor) are skipped; the
    payload never enters a shuffle."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                m = m if m is not None else b""
                frames = parse_avi_frames(m)
                if frames is None:
                    continue
                for idx, off, sz in frames:
                    st = image_raster_stats(m[off:off + sz])
                    if st is None:
                        continue
                    row = {"doc_id": did, "frame_idx": idx}
                    row.update(st)
                    rows.append(row)
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "n_px",
                               "r_min", "r_max", "r_mean",
                               "g_min", "g_max", "g_mean",
                               "b_min", "b_max", "b_mean"])

    return df.select("doc_id", "media").mapInPandas(
        fn, VIDEO_FRAME_STATS_SCHEMA)


def frame_sample(df: DataFrame, stride: int = 4) -> DataFrame:
    return df.select("doc_id", "media").mapInPandas(
        frame_sample_batches(stride), FRAME_SAMPLE_SCHEMA)


def make_image_bytes(doc_id: int) -> bytes:
    """Deterministic VALID image payload (real header per spec) for the
    header-decode gate: png/jpeg/gif rotating by doc_id%3, dimensions a
    pure function of doc_id so the DuckDB oracle recomputes them.
    Fixed payload sizes (png 64 / jpeg 96 / gif 48 bytes)."""
    import struct
    w = 1 + doc_id % 1024
    h = 1 + (3 * doc_id) % 1024
    k = doc_id % 3
    if k == 0:
        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        b = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
             + b"\x00\x00\x00\x00")
        return b.ljust(64, b"\x00")
    if k == 1:
        app0 = (b"\xff\xe0" + struct.pack(">H", 16)
                + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
                + struct.pack(">HH", h, w)
                + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01")
        return (b"\xff\xd8" + app0 + sof0).ljust(94, b"\x00") + b"\xff\xd9"
    return (b"GIF89a" + struct.pack("<HH", w, h)).ljust(48, b"\x00")


# Attach a `media` column of REAL image bytes built from doc_id
with_real_image_media = _media_from_doc_id(make_image_bytes)


# ---------------------------------------------------------------------------
# real raster path: pixel decode for uncompressed 24-bit BMP (round-2
# review item 7) AND 8-bit RGB PNG (round-3 verdict item 3 — zlib is
# stdlib: inflate + per-scanline unfilter, all five PNG filter types).
# Everything downstream (raster stats, OCR, classify) runs on the
# shared decode_rgb() so compressed-codec coverage extends the whole
# pixel family at once.
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Adam7 pass grid (PNG spec §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, start: int, h: int, stride: int,
                  bpp: int) -> tuple[list[bytes], int] | None:
    """Undo per-scanline filtering for one (sub-)image beginning at
    ``start`` in the inflated stream: h scanlines of (1 filter byte +
    stride data bytes), prior row all-zero at entry (each Adam7 pass
    restarts filtering).  Returns (rows, next_offset); None on a
    truncated stream or invalid filter type."""
    rows: list[bytes] = []
    prior = bytes(stride)
    off = start
    for _y in range(h):
        if off + 1 + stride > len(raw):
            return None
        ft = raw[off]
        line = bytearray(raw[off + 1: off + 1 + stride])
        if ft == 1:                          # Sub
            for k in range(bpp, stride):
                line[k] = (line[k] + line[k - bpp]) & 0xFF
        elif ft == 2:                        # Up
            for k in range(stride):
                line[k] = (line[k] + prior[k]) & 0xFF
        elif ft == 3:                        # Average
            for k in range(stride):
                left = line[k - bpp] if k >= bpp else 0
                line[k] = (line[k] + ((left + prior[k]) >> 1)) & 0xFF
        elif ft == 4:                        # Paeth
            for k in range(stride):
                left = line[k - bpp] if k >= bpp else 0
                ul = prior[k - bpp] if k >= bpp else 0
                line[k] = (line[k] + _paeth(left, prior[k], ul)) & 0xFF
        elif ft != 0:
            return None                      # invalid filter type
        prior = bytes(line)
        rows.append(prior)
        off += 1 + stride
    return rows, off


# lazily-built 256-entry tables: byte -> its 8/depth packed samples,
# MSB-first (PNG spec §7.2 pixel ordering within a byte)
_PNG_BIT_TABLES: dict[int, list[bytes]] = {}


def _png_unpack_bits(row: bytes, depth: int) -> bytes:
    """Unpack a packed sub-byte scanline (1/2/4-bit samples, MSB
    first) to one byte per sample — table-driven, one dict lookup per
    BYTE not per sample.  Caller truncates the trailing pad samples."""
    tab = _PNG_BIT_TABLES.get(depth)
    if tab is None:
        n, mask = 8 // depth, (1 << depth) - 1
        tab = [bytes((v >> (8 - depth * (k + 1))) & mask for k in range(n))
               for v in range(256)]
        _PNG_BIT_TABLES[depth] = tab
    return b"".join(map(tab.__getitem__, row))


def _png_pack_bits(row: bytes, depth: int) -> bytes:
    """Pack one-byte-per-sample values (each < 2**depth) into the
    PNG sub-byte wire layout, MSB-first with zero pad bits."""
    n = 8 // depth
    out = bytearray((len(row) + n - 1) // n)
    for i, v in enumerate(row):
        out[i // n] |= v << (8 - depth * (i % n + 1))
    return bytes(out)


def png_decode_rgb(b: bytes) -> tuple[int, int, list[bytes]] | None:
    """REAL PNG pixel decode for ALL FIVE color types at every legal
    bit depth: RGB (type 2, 8/16-bit), GRAYSCALE (type 0, 1/2/4/8/16-
    bit, left-bit-replication scaling to 8-bit per spec §12.5),
    PALETTE (type 3, 1/2/4/8-bit packed indices, PLTE lookup),
    GRAY+ALPHA (type 4) and RGBA (type 6) at 8/16-bit — alpha is
    DISCARDED (the PIL ``convert("RGB")`` convention) — each in
    sequential OR Adam7-interlaced scan order.  Concatenate IDAT
    chunks, zlib-inflate, undo the per-scanline filter (all 5 types,
    left-neighbor offset = max(1, bytes-per-pixel) so sub-byte rows
    filter at byte granularity per spec; each interlace pass restarts
    filtering per §8.2), unpack sub-byte samples MSB-first, scatter
    interlaced passes onto the pixel grid, reduce 16-bit samples to
    their high byte (the PIL/libpng 16→8 convention), expand to
    (w, h, top-down RGB rows).  Returns None for non-PNG / corrupt
    streams (palette index past PLTE is a spec error -> None); never
    raises."""
    import struct
    import zlib
    try:
        if b[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        i, w, h, ok = 8, 0, 0, False
        ctype, depth, ilace = -1, 0, 0
        plte = b""
        idat = bytearray()
        while i + 8 <= len(b):
            ln = struct.unpack(">I", b[i:i + 4])[0]
            typ = b[i + 4:i + 8]
            data = b[i + 8:i + 8 + ln]
            if len(data) < ln:
                return None                      # truncated chunk
            if typ == b"IHDR":
                if ln < 13:
                    return None                  # short IHDR declaration
                w, h = struct.unpack(">II", data[:8])
                depth, ctype, comp, filt, ilace = data[8:13]
                legal = {0: (1, 2, 4, 8, 16), 2: (8, 16),
                         3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
                if (comp, filt) != (0, 0) or ilace not in (0, 1) \
                        or depth not in legal.get(ctype, ()):
                    return None                  # illegal declaration
                ok = True
            elif typ == b"PLTE":
                if ln % 3:
                    return None                  # spec: PLTE is RGB triples
                plte = data
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
            i += 12 + ln                         # len+type+data+crc
        if not ok or w <= 0 or h <= 0:
            return None
        if ctype == 3 and not plte:
            return None                          # palette image needs PLTE
        raw = zlib.decompress(bytes(idat))
        samples = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        bpp_f = max(1, samples * depth // 8)     # filter left-offset

        def region(off: int, pw: int, ph: int):
            # unfilter one (sub-)image and normalize its rows to
            # exactly `samples` bytes per pixel: sub-byte samples are
            # unpacked MSB-first (then cut to the real width — the
            # last byte of a packed row carries pad bits), 16-bit
            # big-endian samples reduce to their high byte (v >> 8)
            # via a C-speed slice — never per-pixel Python
            stride = (pw * samples * depth + 7) // 8
            got = _png_unfilter(raw, off, ph, stride, bpp_f)
            if got is None:
                return None
            rows, off2 = got
            if depth < 8:
                rows = [_png_unpack_bits(r, depth)[:pw * samples]
                        for r in rows]
            elif depth == 16:
                rows = [r[0::2] for r in rows]
            return rows, off2

        if ilace == 0:
            got = region(0, w, h)
            if got is None:
                return None
            rows = got[0]
        else:
            grid = [bytearray(samples * w) for _ in range(h)]
            off = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue                     # empty pass emits nothing
                got = region(off, pw, ph)
                if got is None:
                    return None
                prows, off = got
                sp = samples
                for j, prow in enumerate(prows):
                    tgt = grid[y0 + j * dy]
                    for k in range(pw):
                        x = x0 + k * dx
                        tgt[sp * x:sp * (x + 1)] = \
                            prow[sp * k:sp * (k + 1)]
            rows = [bytes(r) for r in grid]

        if ctype == 6:
            # RGBA: drop the alpha sample (PIL convert("RGB"))
            out = []
            for row in rows:
                rgb = bytearray(3 * w)
                rgb[0::3] = row[0::4]
                rgb[1::3] = row[1::4]
                rgb[2::3] = row[2::4]
                out.append(bytes(rgb))
            return (w, h, out)
        if ctype == 4:
            rows = [row[0::2] for row in rows]   # drop alpha, keep gray
        if ctype == 2:
            return (w, h, rows)
        if ctype in (0, 4):
            if depth < 8:
                # spec §12.5 left-bit-replication == multiply by
                # 255/(2^depth - 1); a translate table keeps it C-speed
                scale = {1: 255, 2: 85, 4: 17}[depth]
                tab = bytes((v * scale) & 0xFF for v in range(256))
                rows = [row.translate(tab) for row in rows]
            # grayscale: expand each byte to (g, g, g) — slice
            # assignment, no per-pixel Python
            out = []
            for row in rows:
                rgb = bytearray(3 * w)
                rgb[0::3] = row
                rgb[1::3] = row
                rgb[2::3] = row
                out.append(bytes(rgb))
            return (w, h, out)
        # ctype == 3: palette lookup via bytes.translate (C-speed);
        # indices past the palette are a spec error
        n_entries = len(plte) // 3
        if any(max(row) >= n_entries for row in rows if row):
            return None
        pad = bytes(256 - n_entries)
        rmap = plte[0::3] + pad
        gmap = plte[1::3] + pad
        bmap = plte[2::3] + pad
        out = []
        for row in rows:
            rgb = bytearray(3 * w)
            rgb[0::3] = row.translate(rmap)
            rgb[1::3] = row.translate(gmap)
            rgb[2::3] = row.translate(bmap)
            out.append(bytes(rgb))
        return (w, h, out)
    except (struct.error, IndexError, ValueError, zlib.error):
        return None


def _png_filter_rows(rows: list[bytes], bpp: int,
                     ft_base: int) -> bytearray:
    """Filter one (sub-)image's scanlines with type (ft_base + y) % 5
    — cycling through all five filters so the decoder's unfilter paths
    are exercised by every synthetic payload.  Prior row starts
    all-zero (each Adam7 pass restarts filtering per spec)."""
    raw = bytearray()
    prior = bytes(len(rows[0])) if rows else b""
    for y, line in enumerate(rows):
        stride = len(line)
        ft = (ft_base + y) % 5
        out = bytearray(line)
        if ft == 1:
            for k in range(stride - 1, bpp - 1, -1):
                out[k] = (line[k] - line[k - bpp]) & 0xFF
        elif ft == 2:
            for k in range(stride):
                out[k] = (line[k] - prior[k]) & 0xFF
        elif ft == 3:
            for k in range(stride):
                left = line[k - bpp] if k >= bpp else 0
                out[k] = (line[k] - ((left + prior[k]) >> 1)) & 0xFF
        elif ft == 4:
            for k in range(stride):
                left = line[k - bpp] if k >= bpp else 0
                ul = prior[k - bpp] if k >= bpp else 0
                out[k] = (line[k] - _paeth(left, prior[k], ul)) & 0xFF
        raw.append(ft)
        raw += out
        prior = line
    return raw


def _png_pack(w: int, h: int, rows: list[bytes], bpp: int, ctype: int,
              plte: bytes = b"", depth: int = 8,
              interlace: bool = False) -> bytes:
    """Shared PNG writer: per-scanline filtering (all five types in
    rotation via _png_filter_rows), deflate, spec-valid chunks (PLTE
    inserted for palette images).  ``depth`` 16 expects rows already
    holding big-endian 2-byte samples (bpp counts BYTES per pixel);
    ``interlace`` splits the image into the 7 Adam7 passes, each
    filtered independently in pass order."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    if not interlace:
        raw = _png_filter_rows(rows, bpp, 0)
    else:
        raw = bytearray()
        n = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            prows = [b"".join(rows[y0 + j * dy][bpp * (x0 + k * dx):
                                                bpp * (x0 + k * dx) + bpp]
                              for k in range(pw))
                     for j in range(ph)]
            raw += _png_filter_rows(prows, bpp, n)
            n += ph
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                       1 if interlace else 0)
    body = chunk(b"IHDR", ihdr)
    if plte:
        body += chunk(b"PLTE", plte)
    return (b"\x89PNG\r\n\x1a\n" + body
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def png_encode_rgb(w: int, h: int, rows: list[bytes]) -> bytes:
    """Spec-valid 8-bit RGB PNG (color type 2) from top-down RGB rows."""
    return _png_pack(w, h, rows, 3, 2)


def png_encode_gray(w: int, h: int, rows: list[bytes]) -> bytes:
    """Spec-valid 8-bit grayscale PNG (color type 0) from top-down
    gray rows (one byte per pixel)."""
    return _png_pack(w, h, rows, 1, 0)


def png_encode_palette(w: int, h: int, rows: list[bytes],
                       plte: bytes) -> bytes:
    """Spec-valid 8-bit palette PNG (color type 3): ``rows`` are
    palette-index bytes, ``plte`` the RGB-triple color table."""
    return _png_pack(w, h, rows, 1, 3, plte=plte)


def png_encode_rgb_interlaced(w: int, h: int, rows: list[bytes]) -> bytes:
    """Spec-valid Adam7-INTERLACED 8-bit RGB PNG from top-down rows."""
    return _png_pack(w, h, rows, 3, 2, interlace=True)


def png_encode_rgb16(w: int, h: int, rows16: list[bytes]) -> bytes:
    """Spec-valid 16-bit RGB PNG: ``rows16`` hold big-endian 2-byte
    samples (6 bytes per pixel)."""
    return _png_pack(w, h, rows16, 6, 2, depth=16)


def png_encode_rgba(w: int, h: int, rows: list[bytes]) -> bytes:
    """Spec-valid 8-bit RGBA PNG (color type 6): ``rows`` hold
    (r, g, b, a) quads, 4 bytes per pixel."""
    return _png_pack(w, h, rows, 4, 6)


def png_encode_gray_alpha(w: int, h: int, rows: list[bytes]) -> bytes:
    """Spec-valid 8-bit grayscale+alpha PNG (color type 4): ``rows``
    hold (g, a) pairs, 2 bytes per pixel."""
    return _png_pack(w, h, rows, 2, 4)


def png_encode_palette_subbyte(w: int, h: int, rows: list[bytes],
                               plte: bytes, depth: int) -> bytes:
    """Spec-valid sub-byte palette PNG (color type 3, depth 1/2/4):
    ``rows`` hold one index byte per pixel; packed MSB-first here."""
    packed = [_png_pack_bits(r, depth) for r in rows]
    return _png_pack(w, h, packed, 1, 3, plte=plte, depth=depth)


def png_encode_gray_subbyte(w: int, h: int, rows: list[bytes],
                            depth: int) -> bytes:
    """Spec-valid sub-byte grayscale PNG (color type 0, depth 1/2/4):
    ``rows`` hold one RAW sample byte per pixel (< 2**depth) — the
    decoder scales by left-bit-replication."""
    packed = [_png_pack_bits(r, depth) for r in rows]
    return _png_pack(w, h, packed, 1, 0, depth=depth)


def gif_decode_rgb(b: bytes) -> tuple[int, int, list[bytes]] | None:
    """REAL GIF decode for the first frame: global OR local color
    table, full variable-width LZW decompression (clear/end codes,
    12-bit cap, little-endian bit packing), sequential or 4-pass
    INTERLACED row order (r5) → (w, h, top-down RGB rows).  Handles
    any conformant GIF87a/89a first frame, not just the synthetic
    encoder's output; None for corrupt payloads, never raises."""
    import struct
    try:
        if b[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        sw, sh, packed = struct.unpack("<HHB", b[6:11])
        i = 13
        gct_n = 0
        palette = b""
        if packed & 0x80:
            gct_n = 2 << (packed & 0x07)
            palette = b[i:i + 3 * gct_n]
            if len(palette) < 3 * gct_n:
                return None
            i += 3 * gct_n
        # skip extension blocks to the first image descriptor
        while i < len(b) and b[i] == 0x21:
            i += 2
            while i < len(b) and b[i]:
                i += 1 + b[i]
            i += 1
        if i >= len(b) or b[i] != 0x2C:
            return None
        _, _, w, h, ipacked = struct.unpack("<HHHHB", b[i + 1:i + 10])
        if w <= 0 or h <= 0:
            return None
        interlaced = bool(ipacked & 0x40)
        i += 10
        if ipacked & 0x80:                    # local color table wins
            gct_n = 2 << (ipacked & 0x07)
            palette = b[i:i + 3 * gct_n]
            if len(palette) < 3 * gct_n:
                return None
            i += 3 * gct_n
        if not gct_n:
            return None                       # no table at all
        mcs = b[i]
        i += 1
        data = bytearray()                    # concat LZW sub-blocks
        while i < len(b) and b[i]:
            n = b[i]
            data += b[i + 1:i + 1 + n]
            i += 1 + n
        # --- LZW ---
        clear, end = 1 << mcs, (1 << mcs) + 1
        width = mcs + 1
        dict_init = {c: bytes([c]) for c in range(clear)}
        table = dict(dict_init)
        next_code = end + 1
        prev: bytes | None = None
        out = bytearray()
        acc = nbits = 0
        pos = 0
        while True:
            while nbits < width:
                if pos >= len(data):
                    return None               # stream ended w/o END
                acc |= data[pos] << nbits
                nbits += 8
                pos += 1
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = dict(dict_init)
                next_code = end + 1
                width = mcs + 1
                prev = None
                continue
            if code == end:
                break
            if prev is None:
                entry = table[code]           # KeyError → corrupt
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]       # the KwKwK case
            else:
                return None
            out += entry
            if len(out) >= w * h:
                break        # frame complete — never expand past the
                             # declared raster (LZW-bomb guard, r4
                             # review: a 1×1 header over megabytes of
                             # codes must not inflate to gigabytes)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
        if len(out) < w * h:
            return None
        # interlace: the stream's k-th row lands at _gif_row_order[k]
        order = (_gif_interlace_order(h) if interlaced else range(h))
        rows: list[bytes | None] = [None] * h
        for k, y in enumerate(order):
            row = bytearray()
            for x in range(w):
                p = out[k * w + x]
                if p >= gct_n:
                    return None
                row += palette[3 * p:3 * p + 3]
            rows[y] = bytes(row)
        return (w, h, rows)
    except (struct.error, IndexError, KeyError, ValueError):
        return None


def _gif_interlace_order(h: int) -> list[int]:
    """GIF 4-pass interlace row schedule (spec appendix E): rows
    arrive 0,8,16,… then 4,12,… then 2,6,… then 1,3,5,…"""
    return ([y for y in range(0, h, 8)] + [y for y in range(4, h, 8)]
            + [y for y in range(2, h, 4)] + [y for y in range(1, h, 2)])


def gif_encode_gray(w: int, h: int, idx_rows: list[bytes], *,
                    interlace: bool = False,
                    local_table: bool = False) -> bytes:
    """Spec-valid GIF89a from 8-bit index rows with a 256-entry
    grayscale color table — GLOBAL by default, in the image
    descriptor when ``local_table`` (r5); ``interlace`` permutes rows
    into the 4-pass schedule and sets the flag.  Codes are emitted
    literally with periodic CLEAR codes so the code width stays mcs+1
    (the classic uncompressed-GIF technique) — the DECODER above
    still runs its full LZW path on the result."""
    import struct
    table = bytes(v for i in range(256) for v in (i, i, i))
    ipacked = (0x80 | 0x07 if local_table else 0) | (0x40 if interlace
                                                     else 0)
    hdr = (b"GIF89a"
           + struct.pack("<HHBBB", w, h,
                         0 if local_table else 0x80 | 0x07, 0, 0)
           + (b"" if local_table else table)
           + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
           + (table if local_table else b""))
    if interlace:
        idx_rows = [idx_rows[y] for y in _gif_interlace_order(h)]
    mcs = 8
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    bits = bytearray()
    acc = nbits = 0

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    count = 0
    for row in idx_rows:
        for p in row:
            # decoder adds one table entry per literal after the first;
            # clear before next_code (258 + count) reaches 1 << 9
            if count == 253:
                put(clear)
                count = 0
            put(p)
            count += 1
    put(end)
    if nbits:
        bits.append(acc & 0xFF)
    blocks = b"".join(
        bytes([min(255, len(bits) - j)]) + bytes(bits[j:j + 255])
        for j in range(0, len(bits), 255))
    return hdr + bytes([mcs]) + blocks + b"\x00\x3b"


def bmp_decode_rgb(b: bytes) -> tuple[int, int, list[bytes]] | None:
    """Uncompressed 24-bit BMP → (w, h, top-down RGB rows); None for
    non-BMP / compressed / non-24bpp payloads, never raises."""
    import struct
    try:
        if b[:2] != b"BM" or len(b) < 54:
            return None
        off = struct.unpack("<I", b[10:14])[0]
        w, h = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        comp = struct.unpack("<I", b[30:34])[0]
        topdown = h < 0
        h = abs(h)
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        stride = (3 * w + 3) & ~3
        if off + stride * h > len(b):
            return None
        rows: list[bytes] = []
        order = range(h) if topdown else range(h - 1, -1, -1)
        for r in order:
            row = b[off + r * stride: off + r * stride + 3 * w]
            rgb = bytearray(3 * w)
            rgb[0::3] = row[2::3]                # R <- slot 2
            rgb[1::3] = row[1::3]                # G
            rgb[2::3] = row[0::3]                # B <- slot 0
            rows.append(bytes(rgb))
        return (w, h, rows)
    except (struct.error, IndexError, ValueError):
        return None


def decode_rgb(b: bytes) -> tuple[int, int, list[bytes]] | None:
    """Container-agnostic raster decode: BMP24, PNG RGB8, paletted GIF
    (full LZW), or baseline JPEG (full Huffman + IDCT) → (w, h,
    top-down RGB rows).  The single entry point every pixel-level
    operator (raster stats / OCR / classify) goes through."""
    out = bmp_decode_rgb(b)
    if out is None:
        out = png_decode_rgb(b)
    if out is None:
        out = gif_decode_rgb(b)
    if out is None:
        out = jpegmini.jpeg_decode_rgb(b)
    return out


def make_gif_bytes(doc_id: int) -> bytes:
    """Deterministic VALID GIF89a: grayscale palette, pixel index
    (doc_id*7 + x*13 + y*17) % 256 — every channel equals the index,
    so the DuckDB oracle recomputes the stats from the formula while
    the decoder really runs LZW on the wire bytes.  Container variant
    rotates by doc_id % 3 (r5): plain / 4-pass INTERLACED / LOCAL
    color table — all three must be pixel-transparent, so the oracle
    is unchanged."""
    w = 4 + doc_id % 5
    h = 3 + doc_id % 4
    rows = [bytes((doc_id * 7 + x * 13 + y * 17) % 256
                  for x in range(w)) for y in range(h)]
    v = doc_id % 3
    return gif_encode_gray(w, h, rows, interlace=v == 1,
                           local_table=v == 2)


# Attach a `media` column of REAL LZW-coded GIF bytes built from
with_gif_media = _media_from_doc_id(make_gif_bytes)


def make_jpeg_raster_bytes(doc_id: int) -> bytes:
    """Deterministic VALID baseline JPEG (4th real codec): YCbCr 4:2:0
    color, restart interval 2, per-8x8-block SOLID gray value
    (doc_id*11 + bx*29 + by*37) % 256.  Solid blocks are DC-only under
    flat q=1 quantization, so decode is byte-exact and the DuckDB
    oracle recomputes the stats from the block formula — while the wire
    bytes still run the full Huffman / bitstream / RST / IDCT path."""
    bw = 2 + doc_id % 3
    bh = 1 + doc_id % 3
    w, h = bw * 8, bh * 8
    rows = [bytes((doc_id * 11 + (x // 8) * 29 + (y // 8) * 37) % 256
                  for x in range(w)) for y in range(h)]
    return jpegmini.jpeg_encode_gray(w, h, rows, color=True, restart=2)


# Attach a `media` column of REAL entropy-coded JPEG bytes built from
with_jpeg_media = _media_from_doc_id(make_jpeg_raster_bytes)


def make_jpeg_prog_bytes(doc_id: int) -> bytes:
    """Deterministic VALID PROGRESSIVE JPEG (SOF2, r5): the same
    per-8x8-block solid formula as make_jpeg_raster_bytes, encoded as
    successive-approximation scans (DC first/refine, AC first/refine
    with EOB runs), alternating GRAYSCALE (doc_id even) and 4:2:0
    COLOR (doc_id odd — MCU-interleaved DC scans + per-component AC
    scans over subsampled grids).  Flat q=1 keeps decode byte-exact,
    so the gate reuses the media_raster_jpeg oracle verbatim while the
    wire bytes exercise every progressive decode path."""
    bw = 2 + doc_id % 3
    bh = 1 + doc_id % 3
    w, h = bw * 8, bh * 8
    rows = [bytes((doc_id * 11 + (x // 8) * 29 + (y // 8) * 37) % 256
                  for x in range(w)) for y in range(h)]
    if doc_id % 2:
        return jpegmini.jpeg_encode_color_progressive(w, h, rows)
    return jpegmini.jpeg_encode_gray_progressive(w, h, rows)


with_jpeg_prog_media = _media_from_doc_id(make_jpeg_prog_bytes)


def image_raster_stats(b: bytes) -> dict | None:
    """REAL pixel statistics over any decode_rgb-supported container
    (BMP24, PNG RGB8, paletted GIF): per-channel min/max/mean over
    every pixel (the
    shape of PIL's ImageStat.Stat).  Returns None for undecodable
    payloads; never raises.  Channel slicing is bytes-level
    (row[0::3]) — C-speed, no per-pixel Python."""
    dec = decode_rgb(b)
    if dec is None:
        return None
    w, h, rows = dec
    mins = [255, 255, 255]   # R, G, B
    maxs = [0, 0, 0]
    sums = [0, 0, 0]
    for row in rows:
        for c in range(3):
            ch = row[c::3]
            mins[c] = min(mins[c], min(ch))
            maxs[c] = max(maxs[c], max(ch))
            sums[c] = sums[c] + sum(ch)
    n = w * h
    return {"n_px": n,
            "r_min": mins[0], "r_max": maxs[0],
            "r_mean": round(sums[0] / n, 4),
            "g_min": mins[1], "g_max": maxs[1],
            "g_mean": round(sums[1] / n, 4),
            "b_min": mins[2], "b_max": maxs[2],
            "b_mean": round(sums[2] / n, 4)}


# back-compat name (pre-round-4 the stats path was BMP-only)
bmp_raster_stats = image_raster_stats


RASTER_STATS_SCHEMA = ("doc_id bigint, n_px bigint, r_min int, r_max int, "
                       "r_mean double, g_min int, g_max int, g_mean double, "
                       "b_min int, b_max int, b_mean double")

_NULL_STATS = {k: None for k in
               ("n_px", "r_min", "r_max", "r_mean", "g_min", "g_max",
                "g_mean", "b_min", "b_max", "b_mean")}


def raster_stats(df: DataFrame) -> DataFrame:
    """df(doc_id, media:binary) → per-channel pixel statistics for
    BMP24 / PNG-RGB8 / paletted-GIF payloads (nulls otherwise).  Same narrow
    mapInPandas plumbing as media_meta."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                st = image_raster_stats(m if m is not None else b"")
                row = {"doc_id": did}
                row.update(st if st is not None else _NULL_STATS)
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media").mapInPandas(fn, RASTER_STATS_SCHEMA)


def make_bmp_bytes(doc_id: int) -> bytes:
    """Deterministic VALID uncompressed 24-bit BMP: dimensions and every
    pixel are pure functions of (doc_id, x, y) so the DuckDB oracle
    recomputes the channel stats exactly.  Bottom-up rows, 4-byte row
    padding per spec."""
    import struct
    w = 4 + doc_id % 5
    h = 3 + doc_id % 4
    stride = (3 * w + 3) & ~3
    img_size = stride * h
    hdr = (b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                         2835, 2835, 0, 0))
    rows = []
    for y in range(h - 1, -1, -1):        # bottom-up storage order
        row = bytearray()
        for x in range(w):
            row.append((doc_id + x + y) % 256)                # B
            row.append((doc_id * 3 + x * 5 + y * 7) % 256)    # G
            row.append((doc_id * 11 + x * 13 + y * 17) % 256)  # R
        row.extend(b"\x00" * (stride - 3 * w))
        rows.append(bytes(row))
    return hdr + b"".join(rows)


# Attach a `media` column of REAL uncompressed-BMP bytes built
with_bmp_media = _media_from_doc_id(make_bmp_bytes)


# ---------------------------------------------------------------------------
# EXIF: real TIFF-IFD metadata inside JPEG APP1 — parse (camera make,
# orientation, GPS DMS) and strip (the GPS-PII scrub every production
# training-data pipeline runs before images enter a corpus).
# Reference behavior: the reference delegates image metadata to
# PIL-backed deps (docs/usage.md:16-30); here the IFD walker is real
# stdlib struct parsing in BOTH byte orders.
# ---------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _exif_tiff_bytes(doc_id: int) -> bytes:
    """Deterministic TIFF blob: byte order alternates II/MM by parity;
    IFD0 carries Make (ASCII, external), Orientation (inline SHORT)
    and — for doc_id % 3 != 0 — a GPS sub-IFD with DMS rationals."""
    import struct
    e = "<" if doc_id % 2 == 0 else ">"
    has_gps = doc_id % 3 != 0
    make = f"CAM{doc_id % 10}\x00".encode()
    orientation = 1 + doc_id % 8

    def entry(tag: int, typ: int, count: int, value4: bytes) -> bytes:
        return struct.pack(e + "HHI", tag, typ, count) + value4

    n0 = 3 if has_gps else 2
    ifd0_end = 8 + 2 + n0 * 12 + 4
    make_off = ifd0_end
    gps_off = make_off + len(make) + (len(make) & 1)
    ents = [
        entry(0x010F, 2, len(make), struct.pack(e + "I", make_off)),
        entry(0x0112, 3, 1, struct.pack(e + "HH", orientation, 0)),
    ]
    if has_gps:
        ents.append(entry(0x8825, 4, 1, struct.pack(e + "I", gps_off)))
    ifd0 = struct.pack(e + "H", n0) + b"".join(ents) + struct.pack(e + "I", 0)
    out = (struct.pack(e + "2sHI", b"II" if e == "<" else b"MM", 42, 8)
           + ifd0 + make + b"\x00" * (len(make) & 1))
    if has_gps:
        lat = (doc_id % 90, doc_id % 60, (doc_id * 7) % 60000)
        lon = ((doc_id * 3) % 180, (doc_id * 5) % 60,
               (doc_id * 11) % 60000)
        rat_lat_off = gps_off + 2 + 4 * 12 + 4
        rat_lon_off = rat_lat_off + 24
        gents = [
            entry(0x0001, 2, 2, b"N\x00\x00\x00"),
            entry(0x0002, 5, 3, struct.pack(e + "I", rat_lat_off)),
            entry(0x0003, 2, 2, b"E\x00\x00\x00"),
            entry(0x0004, 5, 3, struct.pack(e + "I", rat_lon_off)),
        ]
        gifd = (struct.pack(e + "H", 4) + b"".join(gents)
                + struct.pack(e + "I", 0))
        rats = b""
        for d, m, ms in (lat, lon):
            rats += struct.pack(e + "IIIIII", d, 1, m, 1, ms, 1000)
        out += gifd + rats
    return out


def make_jpeg_exif_bytes(doc_id: int) -> bytes:
    """Deterministic VALID baseline JPEG with a REAL EXIF APP1 segment
    spliced after SOI: raster = the solid-block gray formula of
    make_jpeg_raster_bytes; metadata = _exif_tiff_bytes formulas."""
    import struct
    bw = 2 + doc_id % 3
    bh = 1 + doc_id % 3
    w, h = bw * 8, bh * 8
    rows = [bytes((doc_id * 11 + (x // 8) * 29 + (y // 8) * 37) % 256
                  for x in range(w)) for y in range(h)]
    jpg = jpegmini.jpeg_encode_gray(w, h, rows)
    payload = b"Exif\x00\x00" + _exif_tiff_bytes(doc_id)
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpg[:2] + app1 + jpg[2:]


with_exif_jpeg_media = _media_from_doc_id(make_jpeg_exif_bytes)


def _tiff_ifd_entries(b: bytes, e: str, off: int) -> dict:
    """One IFD at ``off`` -> {tag: python value} with proper
    inline-vs-offset resolution for ASCII/SHORT/LONG/RATIONAL."""
    import struct
    n = struct.unpack_from(e + "H", b, off)[0]
    out = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from(e + "HHI", b, off + 2 + i * 12)
        vpos = off + 2 + i * 12 + 8
        size = _TIFF_TYPE_SIZE.get(typ, 0) * count
        if size == 0:
            continue
        if size > 4:
            vpos = struct.unpack_from(e + "I", b, vpos)[0]
        if typ == 2:
            out[tag] = b[vpos:vpos + count].split(b"\x00")[0].decode(
                "ascii", "replace")
        elif typ == 3:
            out[tag] = struct.unpack_from(e + f"{count}H", b, vpos)
        elif typ == 4:
            out[tag] = struct.unpack_from(e + f"{count}I", b, vpos)
        elif typ == 5:
            flat = struct.unpack_from(e + f"{2 * count}I", b, vpos)
            out[tag] = tuple(zip(flat[0::2], flat[1::2]))
    return out


def exif_parse(b: bytes) -> dict | None:
    """Walk the JPEG for an APP1-Exif segment and parse its TIFF: ->
    {byte_order, make, orientation, lat_deg/min/msec, lon_*} (GPS keys
    None when absent).  Never raises; None when no EXIF."""
    import struct
    if b[:2] != b"\xff\xd8":
        return None
    i = 2
    tiff = None
    while i + 4 <= len(b) and b[i] == 0xFF:
        marker = b[i + 1]
        if marker in (0xD9, 0xDA):
            break
        seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
        if marker == 0xE1 and b[i + 4:i + 10] == b"Exif\x00\x00":
            tiff = b[i + 10:i + 2 + seglen]
            break
        i += 2 + seglen
    if tiff is None or len(tiff) < 8:
        return None
    try:
        bo = tiff[:2]
        e = "<" if bo == b"II" else ">"
        if struct.unpack_from(e + "H", tiff, 2)[0] != 42:
            return None
        ifd0_off = struct.unpack_from(e + "I", tiff, 4)[0]
        ifd0 = _tiff_ifd_entries(tiff, e, ifd0_off)
        out = {"byte_order": bo.decode(),
               "make": ifd0.get(0x010F),
               "orientation": (ifd0.get(0x0112) or (None,))[0],
               "lat_deg": None, "lat_min": None, "lat_msec": None,
               "lon_deg": None, "lon_min": None, "lon_msec": None}
        if 0x8825 in ifd0:
            gps = _tiff_ifd_entries(tiff, e, ifd0[0x8825][0])
            for tag, pre in ((0x0002, "lat"), (0x0004, "lon")):
                r = gps.get(tag)
                if r and len(r) == 3 and all(den for _, den in r):
                    out[f"{pre}_deg"] = r[0][0] // r[0][1]
                    out[f"{pre}_min"] = r[1][0] // r[1][1]
                    out[f"{pre}_msec"] = r[2][0] * 1000 // r[2][1]
        return out
    except (struct.error, IndexError):
        return None


def exif_strip(b: bytes) -> bytes:
    """Remove every APP1-Exif segment (the `exiftool -all=` scrub);
    entropy-coded data and all other segments pass through verbatim."""
    import struct
    if b[:2] != b"\xff\xd8":
        return b
    out = bytearray(b"\xff\xd8")
    i = 2
    while i + 4 <= len(b) and b[i] == 0xFF:
        marker = b[i + 1]
        if marker in (0xD9, 0xDA):
            break
        seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i:i + 2 + seglen]
        if not (marker == 0xE1 and seg[4:10] == b"Exif\x00\x00"):
            out += seg
        i += 2 + seglen
    out += b[i:]
    return bytes(out)


EXIF_SCHEMA = ("doc_id bigint, byte_order string, make string, "
               "orientation int, lat_deg int, lat_min int, lat_msec int, "
               "lon_deg int, lon_min int, lon_msec int")

_NULL_EXIF = {k: None for k in
              ("byte_order", "make", "orientation", "lat_deg", "lat_min",
               "lat_msec", "lon_deg", "lon_min", "lon_msec")}


def exif_meta(df: DataFrame) -> DataFrame:
    """df(doc_id, media) -> parsed EXIF frame (nulls for payloads
    without EXIF).  Narrow Arrow mapInPandas, media never shuffles."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, mb in zip(pdf["doc_id"], pdf["media"]):
                ex = exif_parse(mb if mb is not None else b"")
                row = {"doc_id": did}
                row.update(ex if ex is not None else _NULL_EXIF)
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media").mapInPandas(fn, EXIF_SCHEMA)


EXIF_STRIP_SCHEMA = ("doc_id bigint, had_gps boolean, "
                     "orientation_after int, n_px bigint")


def exif_strip_frame(df: DataFrame) -> DataFrame:
    """df(doc_id, media) -> (doc_id, had_gps, orientation_after, n_px):
    the GPS-PII scrub gate — strip APP1, prove the EXIF is gone
    (orientation_after NULL) AND the raster still decodes (n_px from a
    REAL decode of the stripped bytes)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, mb in zip(pdf["doc_id"], pdf["media"]):
                raw = mb if mb is not None else b""
                before = exif_parse(raw)
                had = bool(before and before["lat_deg"] is not None)
                stripped = exif_strip(raw)
                after = exif_parse(stripped)
                dec = decode_rgb(stripped)
                rows.append({
                    "doc_id": did, "had_gps": had,
                    "orientation_after":
                        after["orientation"] if after else None,
                    "n_px": dec[0] * dec[1] if dec else None})
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media").mapInPandas(fn, EXIF_STRIP_SCHEMA)


def make_neardup_bmp_bytes(doc_id: int) -> bytes:
    """Deterministic VALID 16x16 gray BMP24 with built-in NEAR-DUP
    structure: groups of 4 consecutive doc_ids share one base texture
    (coefficients keyed on base = doc_id - doc_id%4), and each member
    perturbs only the 2x2 top-left corner by +96*(doc_id%4) mod 256 —
    so within-group dHashes differ in at most 2 bits while
    across-group textures have group-specific gradients (the base
    multiplies the x/y coefficients, not just the offset — a constant
    offset would leave every adjacent-pixel comparison, hence the
    whole dHash, unchanged)."""
    import struct
    base = doc_id - doc_id % 4
    m = doc_id % 4
    cx = 13 + (base % 7) * 29
    cy = 7 + (base % 5) * 23
    w = h = 16

    def g(x: int, y: int) -> int:
        v = (base * 37 + x * cx + y * cy + x * y) % 256
        if x < 2 and y < 2:
            v = (v + m * 96) % 256
        return v

    stride = 3 * w                       # 48 bytes: already 4-aligned
    img_size = stride * h
    hdr = (b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                         2835, 2835, 0, 0))
    rows = []
    for y in range(h - 1, -1, -1):       # bottom-up storage order
        row = bytearray()
        for x in range(w):
            v = g(x, y)
            row.extend((v, v, v))        # B = G = R = gray
        rows.append(bytes(row))
    return hdr + b"".join(rows)


with_neardup_bmp_media = _media_from_doc_id(make_neardup_bmp_bytes)

DHASH_GRID_W, DHASH_GRID_H = 9, 8        # classic dHash grid


def image_dhash(b: bytes) -> tuple[int, int] | None:
    """64-bit difference hash (Krawetz dHash) over any
    decode_rgb-supported container: nearest-neighbor sample to a 9x8
    integer-luma grid, bit idx = gy*8+gx set iff grid[gy][gx] >
    grid[gy][gx+1], packed row-major into two NON-NEGATIVE 32-bit
    halves (hi = bits 0..31 at weight 2^(31-idx)) — two uint32-range
    bigints sidestep 64-bit sign wrangling in both engines.  Luma is
    integer (299r+587g+114b)//1000, exact for gray payloads."""
    dec = decode_rgb(b)
    if dec is None:
        return None
    w, h, rows = dec
    grid = []
    for gy in range(DHASH_GRID_H):
        row = rows[(gy * h) // DHASH_GRID_H]
        grow = []
        for gx in range(DHASH_GRID_W):
            sx = (gx * w) // DHASH_GRID_W
            r, gg, bl = row[3 * sx], row[3 * sx + 1], row[3 * sx + 2]
            grow.append((299 * r + 587 * gg + 114 * bl) // 1000)
        grid.append(grow)
    hi = lo = 0
    for gy in range(DHASH_GRID_H):
        for gx in range(DHASH_GRID_W - 1):
            if grid[gy][gx] > grid[gy][gx + 1]:
                idx = gy * 8 + gx
                if idx < 32:
                    hi |= 1 << (31 - idx)
                else:
                    lo |= 1 << (63 - idx)
    return hi, lo


DHASH_SCHEMA = "doc_id bigint, dh_hi bigint, dh_lo bigint"


def dhash_frame(df: DataFrame) -> DataFrame:
    """df(doc_id, media:binary) -> (doc_id, dh_hi, dh_lo): the
    perceptual-hash projection feeding corpus.dhash_neardup.  Same
    narrow Arrow mapInPandas plumbing as raster_stats — per-payload
    codec work is Python by necessity (no PIL in-sandbox) but
    embarrassingly parallel; the 100 TB media column never shuffles
    (only the 3-long hash frame does, downstream)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, mb in zip(pdf["doc_id"], pdf["media"]):
                dh = image_dhash(mb if mb is not None else b"")
                rows.append({"doc_id": did,
                             "dh_hi": dh[0] if dh else None,
                             "dh_lo": dh[1] if dh else None})
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media").mapInPandas(fn, DHASH_SCHEMA)


def make_png_bytes(doc_id: int) -> bytes:
    """Deterministic VALID 8-bit RGB PNG: same (doc_id, x, y) pixel
    formula and dimensions as make_bmp_bytes, so the DuckDB oracle for
    the PNG raster gate reuses the BMP formula verbatim — but the bytes
    go through real zlib deflate + per-row filtering (type y % 5)."""
    w = 4 + doc_id % 5
    h = 3 + doc_id % 4
    return png_encode_rgb(w, h, _png_rgb_rows(doc_id, w, h))


# Attach a `media` column of REAL zlib-compressed PNG bytes built
with_png_media = _media_from_doc_id(make_png_bytes)


def _png_rgb_rows(doc_id: int, w: int, h: int) -> list[bytes]:
    """The make_bmp_bytes pixel formula as top-down RGB rows — shared
    by the RGB8, Adam7-interlaced, and 16-bit variants so one oracle
    branch covers all three containers."""
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            row.append((doc_id * 11 + x * 13 + y * 17) % 256)  # R
            row.append((doc_id * 3 + x * 5 + y * 7) % 256)     # G
            row.append((doc_id + x + y) % 256)                 # B
        rows.append(bytes(row))
    return rows


_PNG_PLTE16 = bytes(c for i in range(16)
                    for c in ((i * 17 + 3) % 256, (i * 29 + 7) % 256,
                              (i * 43 + 11) % 256))


def make_png_variant_bytes(doc_id: int) -> bytes:
    """Deterministic VALID PNG rotating through NINE real-web variants
    by doc_id % 9 — RGB8, GRAYSCALE8, PALETTE8 (round-4 verdict item
    5), Adam7-INTERLACED RGB8, 16-BIT RGB, RGBA8, GRAY+ALPHA8, 4-BIT
    PALETTE, and 2-BIT GRAYSCALE (r5: the full color-type × bit-depth
    grid on the real raster path).  The interlaced/16-bit/RGBA flavors
    reuse the RGB8 pixel formula (16-bit samples are v*257 = v<<8|v so
    the high-byte reduction is exact; alpha is decode-discarded), the
    gray+alpha flavor the GRAY8 formula, the 4-bit palette flavor the
    PALETTE8 formula (16 entries = exactly 4 bits), keeping every
    variant SQL-recomputable for the raster-stats oracle."""
    w = 4 + doc_id % 5
    h = 3 + doc_id % 4
    v = doc_id % 9
    if v == 0:
        return make_png_bytes(doc_id)
    if v == 1:  # grayscale: g(x, y) replicated into all 3 channels
        rows = [bytes((doc_id * 7 + x * 13 + y * 17) % 256
                      for x in range(w)) for y in range(h)]
        return png_encode_gray(w, h, rows)
    if v == 2:
        # palette: 16 entries, channel values affine in the index
        rows = [bytes((doc_id + x * 3 + y * 5) % 16
                      for x in range(w)) for y in range(h)]
        return png_encode_palette(w, h, rows, _PNG_PLTE16)
    if v == 3:  # Adam7 interlaced, RGB8 formula
        return png_encode_rgb_interlaced(w, h, _png_rgb_rows(doc_id, w, h))
    if v == 4:  # 16-bit RGB, each sample v*257 (big-endian v, v)
        rows16 = [bytes(b for s in row for b in (s, s))
                  for row in _png_rgb_rows(doc_id, w, h)]
        return png_encode_rgb16(w, h, rows16)
    if v == 5:  # RGBA: RGB8 formula + alpha the decoder must discard
        rgba = [bytes(b for x in range(w)
                      for b in (row[3 * x], row[3 * x + 1], row[3 * x + 2],
                                (doc_id * 5 + x * 7) % 256))
                for row in _png_rgb_rows(doc_id, w, h)]
        return png_encode_rgba(w, h, rgba)
    if v == 6:  # gray+alpha: GRAY8 formula + discarded alpha
        ga = [bytes(b for x in range(w)
                    for b in ((doc_id * 7 + x * 13 + y * 17) % 256,
                              (doc_id + x * 11 + y * 3) % 256))
              for y in range(h)]
        return png_encode_gray_alpha(w, h, ga)
    if v == 7:  # 4-bit palette: PALETTE8 formula, packed 2 px/byte
        rows = [bytes((doc_id + x * 3 + y * 5) % 16
                      for x in range(w)) for y in range(h)]
        return png_encode_palette_subbyte(w, h, rows, _PNG_PLTE16, 4)
    # v == 8: 2-bit grayscale — raw sample s in 0..3, decoder scales
    # by left-bit-replication to s*85
    rows = [bytes((doc_id + x * 3 + y * 5) % 4
                  for x in range(w)) for y in range(h)]
    return png_encode_gray_subbyte(w, h, rows, 2)


# PNG payloads rotating rgb/gray/palette color types by doc_id
with_png_variant_media = _media_from_doc_id(make_png_variant_bytes)


def picture_classify(df: DataFrame) -> DataFrame:
    """Operator C7's deterministic stand-in: classify each image by its
    DOMINANT COLOR CHANNEL computed from real decoded pixels
    (raster_stats — BMP or PNG container) — the classify-stage plumbing
    (decode → feature → label) with a rule in place of the ML model.
    Deterministic tiebreak r ≥ g ≥ b; undecodable payloads label
    'unknown'."""
    st = raster_stats(df)
    label = (F.when(F.col("r_mean").isNull(), "unknown")
             .when((F.col("r_mean") >= F.col("g_mean"))
                   & (F.col("r_mean") >= F.col("b_mean")), "red")
             .when(F.col("g_mean") >= F.col("b_mean"), "green")
             .otherwise("blue"))
    return st.select("doc_id", label.alias("label"),
                     "r_mean", "g_mean", "b_mean")


# ---------------------------------------------------------------------------
# deterministic OCR pipeline (operator C5's deterministic stand-in):
# render text into a REAL uncompressed BMP with a 3x5 bitmap font, then
# OCR it back by glyph matching — actual pixel-level processing end to
# end (the reference's OCR stage shape without the ML model), pure
# stdlib, byte-exact round-trip gated against the DuckDB oracle.
# ---------------------------------------------------------------------------

_FONT = {
    "0": ("###", "###", "# #", "###", "###"),
    "1": (" # ", "## ", " # ", " # ", "###"),
    "2": ("###", "  #", "###", "#  ", "###"),
    "3": ("###", "  #", "###", "  #", "###"),
    "4": ("# #", "# #", "###", "  #", "  #"),
    "5": ("###", "#  ", "###", "  #", "###"),
    "6": ("###", "#  ", "###", "# #", "###"),
    "7": ("###", "  #", "  #", "  #", "  #"),
    "8": ("###", "# #", "###", "# #", "###"),
    "9": ("###", "# #", "###", "  #", "###"),
    "a": ("###", "# #", "###", "# #", "# #"),
    "b": ("## ", "# #", "## ", "# #", "## "),
    "c": ("###", "#  ", "#  ", "#  ", "###"),
    "d": ("## ", "# #", "# #", "# #", "## "),
    "e": ("###", "#  ", "###", "#  ", "###"),
    "f": ("###", "#  ", "###", "#  ", "#  "),
    "g": ("###", "#  ", "# #", "# #", "###"),
    "h": ("# #", "# #", "###", "# #", "# #"),
    "i": ("###", " # ", " # ", " # ", "###"),
    "j": ("  #", "  #", "  #", "# #", "###"),
    "k": ("# #", "## ", "#  ", "## ", "# #"),
    "l": ("#  ", "#  ", "#  ", "#  ", "###"),
    "m": ("# #", "###", "###", "# #", "# #"),
    "n": ("## ", "# #", "# #", "# #", "# #"),
    "o": (" # ", "# #", "# #", "# #", " # "),
    "p": ("###", "# #", "###", "#  ", "#  "),
    "q": (" ##", "# #", "###", "  #", "  #"),
    "r": ("## ", "# #", "## ", "# #", "# #"),
    "s": (" ##", "#  ", " # ", "  #", "## "),
    "t": ("###", " # ", " # ", " # ", " # "),
    "u": ("# #", "# #", "# #", "# #", "###"),
    "v": ("# #", "# #", "# #", " # ", " # "),
    "w": ("# #", "# #", "###", "###", "# #"),
    "x": ("# #", "# #", " # ", "# #", "# #"),
    "y": ("# #", "# #", " # ", " # ", " # "),
    "z": ("###", "  #", " # ", "#  ", "###"),
    " ": ("   ", "   ", "   ", "   ", "   "),
}
_FONT_REV = {v: k for k, v in _FONT.items()}
OCR_COLS = 32            # glyph cells per image row
OCR_MAX_CHARS = 128      # rendered text cap (mirrored by the oracle)
_CELL_W, _CELL_H = 4, 6  # 3x5 glyph + 1px spacing


# r6: per-character cell rows prerendered ONCE (glyph "#" -> 3 black
# bytes, anything else white; the 4th spacing column and the 6th
# spacing row are white) — rendering a line is then a bytes-join of
# cell rows instead of per-pixel Python writes.  Byte-identical to
# the per-pixel canvas by construction (pinned in test_media).
_WHITE_CELL_ROW = b"\xff" * (3 * _CELL_W)


def _glyph_cell_rows(glyph) -> list:
    rows = []
    for gy in range(_CELL_H):
        row = glyph[gy] if glyph is not None and gy < len(glyph) else ""
        rows.append(b"".join(
            (b"\x00\x00\x00" if gx < len(row) and row[gx] == "#"
             else b"\xff\xff\xff") for gx in range(_CELL_W)))
    return rows


_CELL_ROWS = {ch: _glyph_cell_rows(g) for ch, g in _FONT.items()}
_WHITE_CELL = [_WHITE_CELL_ROW] * _CELL_H


def _render_glyph_rows(text: str) -> tuple[int, int, list[bytes]]:
    """Rasterize up to OCR_MAX_CHARS of [a-z0-9 ] text as black 3x5
    glyphs on white: (w, h, top-down RGB rows) — the container-neutral
    canvas both the BMP and PNG writers serialize."""
    s = text[:OCR_MAX_CHARS]
    n_rows = max(1, -(-len(s) // OCR_COLS))
    w, h = OCR_COLS * _CELL_W, n_rows * _CELL_H
    rows = []
    for cy in range(n_rows):
        line = s[cy * OCR_COLS:(cy + 1) * OCR_COLS]
        cells = [_CELL_ROWS.get(ch, _WHITE_CELL) for ch in line]
        if len(cells) < OCR_COLS:
            cells.extend([_WHITE_CELL] * (OCR_COLS - len(cells)))
        for gy in range(_CELL_H):
            rows.append(b"".join(c[gy] for c in cells))
    return (w, h, rows)


def render_text_bmp(text: str) -> bytes:
    """Rendered glyph canvas in a REAL uncompressed 24-bit BMP
    (spec-valid: bottom-up rows, 4-byte stride).  Black-on-white is
    channel-symmetric, so RGB rows serialize as BGR unchanged."""
    import struct
    w, h, rows = _render_glyph_rows(text)
    stride = (3 * w + 3) & ~3
    pad = b"\x00" * (stride - 3 * w)
    img = b"".join(rows[y] + pad for y in range(h - 1, -1, -1))
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img),
                         2835, 2835, 0, 0))
    return hdr + img


def render_text_png(text: str) -> bytes:
    """Rendered glyph canvas in a REAL zlib-compressed 8-bit RGB PNG —
    the compressed-codec flavor of the OCR round-trip."""
    w, h, rows = _render_glyph_rows(text)
    return png_encode_rgb(w, h, rows)


# 15-bit glyph pattern (row-major 3x5, MSB = top-left) -> char, the
# vectorized mirror of _FONT_REV's tuple-of-strings keys.
_FONT_REV_BITS = {
    sum(1 << (14 - (gy * 3 + gx))
        for gy, row in enumerate(pat) for gx, c in enumerate(row)
        if c == "#"): ch
    for pat, ch in _FONT_REV.items()
}
_POW15 = np.array([1 << (14 - i) for i in range(15)], dtype=np.int32)


def ocr_image(b: bytes) -> str | None:
    """OCR the glyph grid back out of a rendered image (BMP or PNG via
    decode_rgb): slice each cell's 3x5 pixel block, threshold,
    reverse-match against the font.  Returns None for undecodable /
    wrong-geometry payloads; unknown glyph patterns decode as '?'.

    Vectorized: the R channel thresholds in one numpy pass, each
    cell's 3x5 ink mask packs into a 15-bit int (same pixels the
    per-cell loop sampled: columns 0..2, rows 0..4 of each
    _CELL_W x _CELL_H cell), and glyphs resolve via a dict keyed on
    the packed pattern — bit-for-bit the old reverse match."""
    dec = decode_rgb(b)
    if dec is None:
        return None
    w, h, rows = dec
    if w % _CELL_W or h % _CELL_H:
        return None        # foreign raster, not a glyph grid
    px = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, 3 * w)
    ink = px[:, ::3] < 128                       # R channel threshold
    cells = ink.reshape(h // _CELL_H, _CELL_H, w // _CELL_W, _CELL_W)
    pats = cells[:, :5, :, :3].transpose(0, 2, 1, 3).reshape(-1, 15)
    keys = pats.astype(np.int32) @ _POW15
    rev = _FONT_REV_BITS
    return "".join([rev.get(int(k), "?") for k in keys]).rstrip()


# back-compat name (pre-round-4 the OCR path was BMP-only)
ocr_bmp = ocr_image


# Attach rendered-text BMPs built from a [a-z0-9 ]-canonicalized
with_text_bmp_media = _media_from_text(render_text_bmp)


# PNG flavor of with_text_bmp_media: rendered-text PNGs built from
with_text_png_media = _media_from_text(render_text_png)


def render_text_jpeg(text: str) -> bytes:
    """Rendered glyph canvas in a REAL baseline JPEG (grayscale,
    1-component, restart interval 3).  JPEG is lossy, but with flat
    q=1 quantization the reconstruction error is bounded well below
    the OCR threshold (ink<128 on a 0/255 canvas), so the glyph
    round-trip stays byte-exact end to end."""
    w, h, rows = _render_glyph_rows(text)
    gray = [bytes(r[0::3]) for r in rows]   # canvas is channel-symmetric
    return jpegmini.jpeg_encode_gray(w, h, gray, color=False, restart=3)


# JPEG flavor: rendered-text JPEGs exercise lossy-codec OCR
with_text_jpeg_media = _media_from_text(render_text_jpeg)

VIDEO_OCR_FRAMES = 3          # frames per clip
VIDEO_OCR_WINDOW = 32         # chars of text per frame


def render_text_mjpeg(text: str) -> bytes:
    """Rendered text as a REAL 3-frame motion-JPEG AVI: frame k
    carries the k-th 32-char window of the text as a glyph-grid
    baseline JPEG — video subtitles/captions for the OCR path."""
    frames, dims = [], (0, 0)
    for k in range(VIDEO_OCR_FRAMES):
        w, h, rows = _render_glyph_rows(
            text[k * VIDEO_OCR_WINDOW:(k + 1) * VIDEO_OCR_WINDOW])
        gray = [bytes(r[0::3]) for r in rows]   # channel-symmetric canvas
        frames.append(jpegmini.jpeg_encode_gray(w, h, gray,
                                                color=False, restart=3))
        if k == 0:
            dims = (w, h)       # header dims only; the walker is chunk-led
    return _avi_mjpeg_container(frames, *dims)


with_text_mjpeg_media = _media_from_text(render_text_mjpeg)

VIDEO_OCR_SCHEMA = "doc_id bigint, frame_idx int, ocr_text string"


def video_ocr(df: DataFrame) -> DataFrame:
    """df(doc_id, media:binary) -> (doc_id, frame_idx, ocr_text): walk
    the RIFF/AVI tree, entropy-decode every MJPEG frame through the
    full baseline-JPEG path, and OCR each frame's glyph grid — the
    frame-level sibling of media_ocr (caption/subtitle extraction).
    1->N narrow Arrow kernel; undecodable frames are skipped and the
    payload never enters a shuffle."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                m = m if m is not None else b""
                frames = parse_avi_frames(m)
                if frames is None:
                    continue
                for idx, off, sz in frames:
                    txt = ocr_image(m[off:off + sz])
                    if txt is None:
                        continue
                    rows.append({"doc_id": did, "frame_idx": idx,
                                 "ocr_text": txt})
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "ocr_text"])

    return df.select("doc_id", "media").mapInPandas(fn, VIDEO_OCR_SCHEMA)


def media_ocr(df: DataFrame) -> DataFrame:
    """df(doc_id, media:binary) → (doc_id, ocr_text); any decode_rgb
    container (BMP/PNG/GIF/JPEG) decodes.  Narrow mapInPandas, same
    plumbing as the other media kernels."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"],
                 "ocr_text": [ocr_image(m if m is not None else b"")
                              for m in pdf["media"]]})

    return df.select("doc_id", "media").mapInPandas(
        fn, "doc_id bigint, ocr_text string")


def with_fake_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary `media` column derived from text
    (stands in for a crawled image payload; ASCII text → n_bytes ==
    length(text), which the oracle uses)."""
    return docs.withColumn("media", F.encode(F.col("text"), "utf-8"))
