"""Baseline JPEG codec (jpegmini): round-trips, error bounds, hostile
bytes, and the decode_rgb / OCR integration.

Parity target: the reference converts real raster images through its
OCR/classify stages (reference docs/usage.md:16-20); JPEG is the
dominant web raster format, so the pixel-operator family needs a real
baseline-JPEG path.
"""
import random

from webextract import jpegmini as J


def _block_solid(w, h, f):
    return [bytes(f(x // 8, y // 8) for x in range(w)) for y in range(h)]


def test_gray_block_solid_exact():
    """Per-8x8-block-solid content is DC-only under q=1: decode must be
    byte-exact, including with restart intervals."""
    rng = random.Random(1)
    for _ in range(8):
        bw, bh = rng.randint(1, 5), rng.randint(1, 4)
        w, h = bw * 8, bh * 8
        vals = {(x, y): rng.randint(0, 255)
                for x in range(bw) for y in range(bh)}
        rows = _block_solid(w, h, lambda bx, by: vals[(bx, by)])
        enc = J.jpeg_encode_gray(w, h, rows, color=False,
                                 restart=rng.choice([0, 1, 3]))
        got = J.jpeg_decode_rgb(enc)
        assert got is not None and got[:2] == (w, h)
        for y in range(h):
            exp = bytes(c for x in range(w) for c in [rows[y][x]] * 3)
            assert got[2][y] == exp


def test_color_420_block_solid_exact():
    """3-component 4:2:0 interleaved MCUs with constant chroma decode
    byte-exactly (chroma DC=0 -> 128; upsample is replication)."""
    rng = random.Random(2)
    for _ in range(8):
        bw, bh = rng.randint(1, 5), rng.randint(1, 4)
        w, h = bw * 8, bh * 8       # often NOT multiples of 16: pads MCUs
        vals = {(x, y): rng.randint(0, 255)
                for x in range(bw) for y in range(bh)}
        rows = _block_solid(w, h, lambda bx, by: vals[(bx, by)])
        enc = J.jpeg_encode_gray(w, h, rows, color=True,
                                 restart=rng.choice([0, 2]))
        got = J.jpeg_decode_rgb(enc)
        assert got is not None and got[:2] == (w, h)
        for y in range(h):
            exp = bytes(c for x in range(w) for c in [rows[y][x]] * 3)
            assert got[2][y] == exp


def test_arbitrary_content_error_bound():
    """Arbitrary (non-block-solid) images exercise the AC run/ZRL/EOB
    Huffman paths; with q=1 the only loss is FDCT rounding — max
    per-pixel error must stay tiny (and far below the OCR threshold)."""
    rng = random.Random(3)
    for _ in range(5):
        w, h = rng.randint(5, 40), rng.randint(5, 40)  # non-multiple dims
        rows = [bytes(rng.randint(0, 255) for _ in range(w))
                for _ in range(h)]
        enc = J.jpeg_encode_gray(w, h, rows, color=False, restart=3)
        got = J.jpeg_decode_rgb(enc)
        assert got is not None and got[:2] == (w, h)
        maxerr = max(abs(got[2][y][3 * x] - rows[y][x])
                     for y in range(h) for x in range(w))
        assert maxerr <= 4


def test_restart_markers_on_wire():
    """restart=1 must put real RSTn markers in the stream and still
    round-trip (DC predictors reset at every boundary)."""
    rows = _block_solid(32, 8, lambda bx, by: 40 * bx + 7)
    enc = J.jpeg_encode_gray(32, 8, rows, color=False, restart=1)
    assert b"\xff\xd0" in enc and b"\xff\xd1" in enc
    got = J.jpeg_decode_rgb(enc)
    assert got is not None
    assert got[2][0] == bytes(c for x in range(32)
                              for c in [rows[0][x]] * 3)


def test_hostile_bytes_never_raise():
    enc = J.jpeg_encode_gray(16, 16, [bytes(range(16))] * 16, color=True)
    for cut in range(0, len(enc), 5):
        J.jpeg_decode_rgb(enc[:cut])
    rng = random.Random(4)
    for _ in range(300):
        bb = bytearray(enc)
        bb[rng.randrange(len(bb))] ^= 1 << rng.randrange(8)
        J.jpeg_decode_rgb(bytes(bb))
    assert J.jpeg_decode_rgb(b"") is None
    assert J.jpeg_decode_rgb(b"\xff\xd8\xff\xd9") is None
    assert J.jpeg_decode_rgb(b"not a jpeg at all") is None


def test_progressive_malformed_rejected():
    """A baseline stream relabeled SOF2 carries a full-band DC scan
    (Ss=0, Se=63) — a spec violation the progressive path must refuse
    as None, not decode as garbage."""
    enc = bytearray(J.jpeg_encode_gray(8, 8, [bytes(range(8))] * 8))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    assert J.jpeg_decode_rgb(bytes(enc)) is None


def test_progressive_matches_baseline_bit_exact():
    """r5: the four-scan successive-approximation encode must decode
    to EXACTLY the baseline path's pixels on every content class —
    the property that licenses reusing the baseline gate oracle."""
    import numpy as np
    rng = np.random.RandomState(7)
    for w, h in [(8, 8), (24, 16), (17, 13), (1, 1), (40, 40), (9, 25)]:
        for kind in range(4):
            if kind == 0:
                img = rng.randint(0, 256, (h, w), dtype=np.uint8)
            elif kind == 1:
                img = np.full((h, w), 77, dtype=np.uint8)
            elif kind == 2:
                img = ((np.arange(h)[:, None] * 7
                        + np.arange(w)[None, :] * 13) % 256
                       ).astype(np.uint8)
            else:
                img = np.zeros((h, w), dtype=np.uint8)
                img[::3, ::5] = 255           # long zero runs -> ZRL/EOB
            rows = [img[y].tobytes() for y in range(h)]
            base = J.jpeg_decode_rgb(J.jpeg_encode_gray(w, h, rows))
            prog = J.jpeg_decode_rgb(
                J.jpeg_encode_gray_progressive(w, h, rows))
            assert base is not None and base == prog, (w, h, kind)


def test_progressive_truncation_never_raises():
    import numpy as np
    img = ((np.arange(16)[:, None] * 11 + np.arange(24)[None, :] * 5)
           % 256).astype(np.uint8)
    b = J.jpeg_encode_gray_progressive(24, 16,
                                       [img[y].tobytes() for y in range(16)])
    for cut in range(0, len(b), 3):
        J.jpeg_decode_rgb(b[:cut])            # None or partial, no raise
    # bit flips through the scan data must not raise either
    for flip in range(100, min(len(b), 400), 17):
        crafted = bytearray(b)
        crafted[flip] ^= 0x55
        J.jpeg_decode_rgb(bytes(crafted))


def test_progressive_ocr_roundtrip():
    """Glyph canvases survive the progressive pipeline: AC refinement
    carries real ink coefficients here, not just EOB runs."""
    from webextract.jpegmini import jpeg_encode_gray_progressive
    from webextract.media import _render_glyph_rows, ocr_image
    for text in ("hello world 42", "the quick brown fox", "z" * 60):
        w, h, rows = _render_glyph_rows(text)
        gray = [bytes(r[0::3]) for r in rows]
        got = ocr_image(jpeg_encode_gray_progressive(w, h, gray))
        assert got == text[:128].rstrip()


def test_decode_rgb_dispatch_and_gate_formula():
    """media.decode_rgb routes JPEG payloads; the gate payload's pixels
    match the oracle's block formula exactly."""
    from webextract.media import decode_rgb, make_jpeg_raster_bytes
    for doc_id in (0, 1, 2, 7, 123):
        b = make_jpeg_raster_bytes(doc_id)
        dec = decode_rgb(b)
        assert dec is not None
        w, h, rows = dec
        assert (w, h) == (8 * (2 + doc_id % 3), 8 * (1 + doc_id % 3))
        for y in range(h):
            for x in range(w):
                v = (doc_id * 11 + (x // 8) * 29 + (y // 8) * 37) % 256
                assert rows[y][3 * x:3 * x + 3] == bytes([v, v, v])


def test_ocr_jpeg_roundtrip():
    """Lossy-container OCR: the rendered glyph canvas survives JPEG
    encode/decode byte-exactly at the text level."""
    from webextract.media import ocr_image, render_text_jpeg
    for text in ("hello world 42", "", "z" * 130, "the quick brown fox"):
        got = ocr_image(render_text_jpeg(text))
        assert got == text[:128].rstrip()


def test_color_progressive_matches_baseline_color():
    """r5: 4:2:0 color progressive streams — MCU-INTERLEAVED DC scans
    plus per-component AC scans over each component's OWN subsampled
    block grid (smaller than the MCU-padded store) — decode to exactly
    the baseline color path's pixels."""
    import numpy as np
    rng = np.random.RandomState(11)
    for w, h in [(16, 16), (17, 13), (1, 1), (33, 31), (40, 8)]:
        img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        rows = [img[y].tobytes() for y in range(h)]
        base = J.jpeg_decode_rgb(J.jpeg_encode_gray(w, h, rows,
                                                    color=True))
        prog = J.jpeg_decode_rgb(J.jpeg_encode_color_progressive(
            w, h, rows))
        assert base is not None and base == prog, (w, h)


def test_exif_roundtrip_and_strip():
    """EXIF writer -> IFD walker round-trip in both byte orders (II on
    even doc_ids, MM on odd), GPS DMS rationals exact, and the strip
    pass removes the APP1 without disturbing a single raster byte."""
    from webextract import media
    for d in (0, 1, 2, 3, 6, 17, 100, 255):
        b = media.make_jpeg_exif_bytes(d)
        ex = media.exif_parse(b)
        assert ex["byte_order"] == ("II" if d % 2 == 0 else "MM")
        assert ex["make"] == f"CAM{d % 10}"
        assert ex["orientation"] == 1 + d % 8
        if d % 3 != 0:
            assert (ex["lat_deg"], ex["lat_min"], ex["lat_msec"]) == \
                (d % 90, d % 60, (d * 7) % 60000)
            assert (ex["lon_deg"], ex["lon_min"], ex["lon_msec"]) == \
                ((d * 3) % 180, (d * 5) % 60, (d * 11) % 60000)
        else:
            assert ex["lat_deg"] is None and ex["lon_deg"] is None
        s = media.exif_strip(b)
        assert media.exif_parse(s) is None
        assert media.decode_rgb(s) == media.decode_rgb(b[:2] + b[2:])
        assert media.decode_rgb(s)[2] == media.decode_rgb(b)[2]


def test_exif_parse_hostile_bytes():
    """Truncated/corrupt EXIF must return None or partial fields,
    never raise — the 10^11-payload job-abort guard."""
    from webextract import media
    good = media.make_jpeg_exif_bytes(5)
    for i in range(2, min(len(good), 220), 7):
        media.exif_parse(good[:i])          # must not raise
        media.exif_strip(good[:i])
    bad = bytearray(good)
    bad[30] ^= 0xFF                         # corrupt inside the TIFF
    media.exif_parse(bytes(bad))
    assert media.exif_parse(b"") is None
    assert media.exif_strip(b"junk") == b"junk"


def test_video_ocr_frame_windows():
    """render_text_mjpeg puts the k-th 32-char window in frame k; the
    frame walk + per-frame OCR recovers each window rstripped, and the
    refactored AVI container still parses for the stats fixture."""
    from webextract import media
    for t in ("the quick brown fox jumps over the lazy dog "
              "pack my box with five dozen jugs", "", "tiny"):
        b = media.render_text_mjpeg(t)
        fr = media.parse_avi_frames(b)
        assert len(fr) == 3
        got = [media.ocr_image(b[o:o + s]) for _, o, s in fr]
        assert got == [t[k * 32:(k + 1) * 32].rstrip() for k in range(3)]
    assert media.parse_avi_frames(media.make_mjpeg_avi_bytes(7))


def test_encode_block_cache_byte_identity():
    """r6: _encode_block memoizes (block, dc_pred) -> concatenated
    bits.  Cold-cache and warm-cache encodes must be byte-identical
    for glyph-like AND dense noise content, at every restart/color
    combination — a cache-key bug would silently corrupt streams."""
    import numpy as np

    from webextract import jpegmini as J
    rng = np.random.RandomState(3)
    for restart in (0, 2):
        for color in (False, True):
            rows = [bytes(rng.randint(0, 256, 24, dtype=np.uint8))
                    for _ in range(16)]
            J._BLOCK_CACHE.clear()
            cold = J.jpeg_encode_gray(24, 16, rows, color=color,
                                      restart=restart)
            warm = J.jpeg_encode_gray(24, 16, rows, color=color,
                                      restart=restart)
            assert cold == warm
            # decode round-trips through the r6 inline scan loop
            assert J.jpeg_decode_rgb(cold) is not None


def test_decode_scan_hostile_streams():
    """r6 inline entropy loop: truncated and bit-flipped streams must
    return None or a decoded frame deterministically, never raise —
    same contract as the _BitReader path it replaced."""
    import numpy as np

    from webextract import jpegmini as J
    rng = np.random.RandomState(4)
    rows = [bytes(rng.randint(0, 256, 32, dtype=np.uint8))
            for _ in range(24)]
    enc = J.jpeg_encode_gray(32, 24, rows, restart=3)
    assert J.jpeg_decode_rgb(enc) is not None
    for cut in range(2, len(enc), 11):
        J.jpeg_decode_rgb(enc[:cut])        # must not raise
    for i in range(len(enc) // 2, len(enc), 13):
        mod = bytearray(enc)
        mod[i] ^= 0x55
        a = J.jpeg_decode_rgb(bytes(mod))
        b = J.jpeg_decode_rgb(bytes(mod))
        assert a == b                        # deterministic outcome


def test_bitwriter_chunked_flush_identity():
    """r6: _BitWriter accumulates bits in one big int and flushes in
    chunks (to_bytes + C-level 0xFF00 stuffing).  Must emit the exact
    byte stream of a per-byte reference emitter for arbitrary put
    sequences, including mid-stream pad_align + marker injection (the
    restart pattern)."""
    import random

    from webextract import jpegmini as J

    class Ref:
        def __init__(self):
            self.out = bytearray()
            self._acc = 0
            self._n = 0

        def put(self, code, length):
            self._acc = (self._acc << length) | (code & ((1 << length) - 1))
            self._n += length
            while self._n >= 8:
                b = (self._acc >> (self._n - 8)) & 0xFF
                self._n -= 8
                self._acc &= (1 << self._n) - 1
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)

        def pad_align(self):
            if self._n:
                self.put((1 << (8 - self._n)) - 1, 8 - self._n)

    rnd = random.Random(11)
    for trial in range(60):
        a, b = J._BitWriter(), Ref()
        for _ in range(rnd.randint(0, 600)):
            ln = rnd.randint(1, 26)
            code = rnd.getrandbits(ln)
            a.put(code, ln)
            b.put(code, ln)
            if rnd.random() < 0.02:          # restart boundary
                a.pad_align()
                b.pad_align()
                a.out += bytes([0xFF, 0xD0])
                b.out += bytes([0xFF, 0xD0])
        a.pad_align()
        b.pad_align()
        assert bytes(a.out) == bytes(b.out)


def test_gray_segment_memo_identity():
    """r6: 1-component baseline scans decode through a per-restart-
    segment memo.  Cold and warm caches must agree; restart=0 and
    restart=3 encodes of one plane must decode to the same pixels
    (single-segment vs many-segment paths); truncated/corrupted
    streams stay deterministic through the memo."""
    import numpy as np

    from webextract import jpegmini as J

    rng = np.random.RandomState(12)
    for trial in range(6):
        w = int(rng.randint(8, 72))
        h = int(rng.randint(8, 48))
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        rows = [img[y].tobytes() for y in range(h)]
        enc3 = J.jpeg_encode_gray(w, h, rows, restart=3)
        enc0 = J.jpeg_encode_gray(w, h, rows, restart=0)
        J._SEG_CACHE.clear()
        cold = J.jpeg_decode_rgb(enc3)
        warm = J.jpeg_decode_rgb(enc3)
        assert cold is not None and cold == warm
        assert J.jpeg_decode_rgb(enc0) == cold
        for cut in range(2, len(enc3), 17):
            a = J.jpeg_decode_rgb(enc3[:cut])
            assert a == J.jpeg_decode_rgb(enc3[:cut])
        for i in range(len(enc3) // 2, len(enc3), 19):
            mod = bytearray(enc3)
            mod[i] ^= 0x41
            assert J.jpeg_decode_rgb(bytes(mod)) == \
                J.jpeg_decode_rgb(bytes(mod))
