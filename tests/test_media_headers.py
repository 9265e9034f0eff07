"""Real image-header decode (VERDICT item 10): magic bytes + dimensions
parsed pure-Python, no codec library.  Round-trips the synthesizer's
valid headers and hand-built BMP/WEBP payloads the gate doesn't cover.
"""

import struct

from webextract.media import (fake_decode_meta, make_image_bytes,
                              parse_image_header)


def test_png_jpeg_gif_roundtrip():
    for doc_id in (0, 1, 2, 1023, 1024, 9999, 31415):
        w = 1 + doc_id % 1024
        h = 1 + (3 * doc_id) % 1024
        fmt = ("png", "jpeg", "gif")[doc_id % 3]
        assert parse_image_header(make_image_bytes(doc_id)) == (fmt, w, h)


def test_payload_sizes_fixed():
    assert len(make_image_bytes(0)) == 64    # png
    assert len(make_image_bytes(1)) == 96    # jpeg
    assert len(make_image_bytes(2)) == 48    # gif


def test_bmp_header():
    hdr = (b"BM" + struct.pack("<I", 26) + b"\x00\x00\x00\x00"
           + struct.pack("<I", 26) + struct.pack("<I", 12)
           + struct.pack("<ii", 640, -480))
    assert parse_image_header(hdr) == ("bmp", 640, 480)
    # ASCII text starting with BM must NOT decode (reserved bytes != 0)
    assert parse_image_header(b"BM the quick brown fox jumps over") is None


def test_webp_headers():
    vp8x = (b"RIFF" + struct.pack("<I", 22) + b"WEBPVP8X"
            + struct.pack("<I", 10) + b"\x00\x00\x00\x00"
            + (299).to_bytes(3, "little") + (149).to_bytes(3, "little"))
    assert parse_image_header(vp8x) == ("webp", 300, 150)
    bits = (63 | (127 << 14)) & 0xFFFFFFFF
    vp8l = (b"RIFF" + struct.pack("<I", 17) + b"WEBPVP8L"
            + struct.pack("<I", 5) + b"\x2f" + struct.pack("<I", bits))
    assert parse_image_header(vp8l) == ("webp", 64, 128)


def test_non_image_falls_back_to_fake():
    for payload in (b"", b"plain text content here", b"\x89PNGbroken",
                    b"\xff\xd8\x00junk", b"GIF9"):
        assert parse_image_header(payload) is None
        meta = fake_decode_meta(payload)
        assert meta["n_bytes"] == len(payload)


def test_truncated_headers_never_raise():
    for doc_id in (0, 1, 2):
        full = make_image_bytes(doc_id)
        for cut in range(0, len(full)):
            parse_image_header(full[:cut])  # must not raise


def test_wav_header_roundtrip():
    from webextract.media import make_wav_bytes, parse_wav_header
    for doc_id in (0, 1, 2, 3, 7, 899, 1234):
        rate = (8000, 16000, 22050, 44100)[doc_id % 4]
        ch = 1 + doc_id % 2
        nf = 100 + doc_id % 900
        assert parse_wav_header(make_wav_bytes(doc_id)) == (rate, ch, 16, nf)


def test_wav_header_rejects_and_never_raises():
    from webextract.media import make_wav_bytes, parse_wav_header
    assert parse_wav_header(b"RIFF....WEBP") is None
    assert parse_wav_header(b"RIFFxxxxWAVE") is None      # no fmt chunk
    assert parse_wav_header(b"") is None
    full = make_wav_bytes(5)
    for cut in range(len(full)):
        parse_wav_header(full[:cut])                      # total


def test_wav_with_extra_chunks():
    """LIST/INFO chunks before fmt must be skipped (word-aligned)."""
    import struct
    from webextract.media import parse_wav_header
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOx"       # odd size -> pad
    fmt = (b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100,
                                 44100 * 4, 4, 16))
    data = b"data" + struct.pack("<I", 400)
    wav = b"RIFF" + struct.pack("<I", 0) + b"WAVE" + odd + b"\x00" + fmt + data
    assert parse_wav_header(wav) == (44100, 2, 16, 100)


def test_bmp_raster_stats_edges():
    """Pixel-level BMP decode (r2 item 7): round-trips the synthetic
    pattern; rejects compressed/non-24bpp/truncated payloads with None
    instead of raising."""
    from webextract.media import bmp_raster_stats, make_bmp_bytes
    b = make_bmp_bytes(7)
    st = bmp_raster_stats(b)
    w, h = 4 + 7 % 5, 3 + 7 % 4
    assert st["n_px"] == w * h
    rs = [(7 * 11 + x * 13 + y * 17) % 256
          for x in range(w) for y in range(h)]
    assert st["r_min"] == min(rs) and st["r_max"] == max(rs)
    assert st["r_mean"] == round(sum(rs) / len(rs), 4)
    assert bmp_raster_stats(b"") is None
    assert bmp_raster_stats(b[:40]) is None                 # truncated
    assert bmp_raster_stats(b[:54] + b"\x00") is None       # short data
    import struct
    comp = b[:30] + struct.pack("<I", 1) + b[34:]           # RLE flag
    assert bmp_raster_stats(comp) is None


def test_ocr_font_roundtrip():
    """C5 stand-in: glyph patterns are unique (decodability) and the
    render→OCR round-trip is exact for the supported alphabet; foreign
    payloads decode to None, unknown glyphs to '?'."""
    from webextract.media import (_FONT, _FONT_REV, ocr_bmp,
                                  render_text_bmp, make_bmp_bytes)
    assert len(_FONT_REV) == len(_FONT) == 37
    for s in ("hello world 42", "pack my box with five dozen jugs 019",
              "", "a", "x" * 200):
        assert ocr_bmp(render_text_bmp(s)) == s[:128].rstrip()
    assert ocr_bmp(b"") is None
    assert ocr_bmp(b"not a bmp at all") is None
    assert ocr_bmp(make_bmp_bytes(3)) is None   # wrong cell geometry
    # glyph from outside the font renders blank -> decodes as space
    assert ocr_bmp(render_text_bmp("a!b")) == "a b"


def test_picture_classify_labels(spark):
    """C7 stand-in: labels follow the dominant channel means with the
    documented r>=g>=b tiebreak."""
    from webextract.media import picture_classify, with_bmp_media
    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    rows = picture_classify(with_bmp_media(docs)).collect()
    assert len(rows) == 40
    for r in rows:
        want = ("red" if r.r_mean >= r.g_mean and r.r_mean >= r.b_mean
                else "green" if r.g_mean >= r.b_mean else "blue")
        assert r.label == want


def test_png_codec_roundtrip():
    """PNG decode (r3 verdict item 3): inflate + unfilter reconstruct
    every pixel for all five per-row filter types; corrupt/unsupported
    payloads return None instead of raising."""
    from webextract.media import (make_png_bytes, png_decode_rgb,
                                  png_encode_rgb, parse_image_header)
    for did in (0, 1, 2, 3, 4, 7, 19):       # covers all w×h combos
        b = make_png_bytes(did)
        assert parse_image_header(b)[0] == "png"
        w, h, rows = png_decode_rgb(b)
        assert (w, h) == (4 + did % 5, 3 + did % 4)
        for y in range(h):
            for x in range(w):
                assert rows[y][3 * x] == (did * 11 + x * 13 + y * 17) % 256
                assert rows[y][3 * x + 1] == (did * 3 + x * 5 + y * 7) % 256
                assert rows[y][3 * x + 2] == (did + x + y) % 256
    # tall image exercises every filter type (h >= 5): explicit check
    tall = png_encode_rgb(3, 6, [bytes((y, y * 2 % 256, y * 3 % 256)) * 3
                                 for y in range(6)])
    w, h, rows = png_decode_rgb(tall)
    assert (w, h) == (3, 6)
    assert rows == [bytes((y, y * 2 % 256, y * 3 % 256)) * 3
                    for y in range(6)]
    # edge handling
    b = make_png_bytes(5)
    assert png_decode_rgb(b"") is None
    assert png_decode_rgb(b[:20]) is None                  # truncated IHDR
    assert png_decode_rgb(b[:8] + b[8:].replace(b"IDAT", b"IDAX")) is None
    # every legal depth×type is SUPPORTED since r5 — but a headers-only
    # stream (no IDAT) must still be None, and an ILLEGAL combination
    # (depth 4 RGB: spec allows sub-byte only for gray/palette) too
    import struct, zlib
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    assert png_decode_rgb(deep) is None          # no IDAT at all
    ihdr4 = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    shallow = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
               + ihdr4
               + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr4)
                             & 0xFFFFFFFF))
    assert png_decode_rgb(shallow) is None       # depth 4 RGB is illegal


def test_png_gray_and_palette_variants():
    """Round-4 verdict item 5: grayscale + palette PNGs decode on the
    real raster path; spec errors (missing PLTE, index past the
    palette) return None."""
    from webextract.media import (make_png_variant_bytes, png_decode_rgb,
                                  png_encode_gray, png_encode_palette)
    # gray roundtrip: every channel equals the gray byte
    rows = [bytes((y * 31 + x * 7) % 256 for x in range(5))
            for y in range(6)]          # h=6 cycles all filters
    w, h, got = png_decode_rgb(png_encode_gray(5, 6, rows))
    assert (w, h) == (5, 6)
    for y in range(6):
        assert got[y][0::3] == rows[y]
        assert got[y][1::3] == rows[y]
        assert got[y][2::3] == rows[y]
    # palette roundtrip
    plte = bytes(c for i in range(4) for c in (i * 50, i * 60, i * 70))
    idx = [bytes((x + y) % 4 for x in range(4)) for y in range(6)]
    w, h, got = png_decode_rgb(png_encode_palette(4, 6, idx, plte))
    assert (w, h) == (4, 6)
    for y in range(6):
        for x in range(4):
            i = (x + y) % 4
            assert got[y][3 * x:3 * x + 3] == bytes(
                (i * 50, i * 60, i * 70))
    # spec errors
    bad = png_encode_palette(2, 2, [b"\x05\x00", b"\x00\x01"], plte)
    assert png_decode_rgb(bad) is None          # index 5 >= 4 entries
    # palette-typed image with the PLTE chunk stripped
    stripped = png_encode_palette(2, 2, [b"\x00\x01", b"\x01\x00"], plte)
    i = stripped.find(b"PLTE") - 4
    ln = int.from_bytes(stripped[i:i + 4], "big")
    stripped = stripped[:i] + stripped[i + 12 + ln:]
    assert png_decode_rgb(stripped) is None
    # variant fixture rotation decodes for all nine variants
    for did in range(18):
        out = png_decode_rgb(make_png_variant_bytes(did))
        assert out is not None
        assert (out[0], out[1]) == (4 + did % 5, 3 + did % 4)


def test_png_interlace_and_16bit():
    """r5: Adam7 scan order and 16-bit depth decode to the same pixels
    as the sequential 8-bit path; damage and unsupported combos return
    None."""
    from webextract.media import (_png_rgb_rows, png_decode_rgb,
                                  png_encode_rgb, png_encode_rgb16,
                                  png_encode_rgb_interlaced)
    # all 7 passes non-empty needs w,h > 8; also hit edge geometries
    for (w, h) in [(19, 11), (9, 9), (8, 8), (1, 1), (1, 9), (9, 1)]:
        rows = _png_rgb_rows(23, w, h)
        seq = png_decode_rgb(png_encode_rgb(w, h, rows))
        lace = png_decode_rgb(png_encode_rgb_interlaced(w, h, rows))
        assert seq == lace == (w, h, rows), (w, h)
        rows16 = [bytes(x for s in r for x in (s, s)) for r in rows]
        assert png_decode_rgb(png_encode_rgb16(w, h, rows16)) == \
            (w, h, rows), (w, h)
    # high byte wins when the low byte disagrees (libpng 16->8)
    got = png_decode_rgb(png_encode_rgb16(
        1, 1, [bytes([0xAB, 0x00, 0x01, 0xFF, 0x80, 0x7F])]))
    assert got == (1, 1, [bytes([0xAB, 0x01, 0x80])])
    # truncation anywhere in an interlaced payload: None, never raises
    b = png_encode_rgb_interlaced(19, 11, _png_rgb_rows(5, 19, 11))
    for cut in range(0, len(b), 7):
        png_decode_rgb(b[:cut])                 # must not raise
    # 16-bit palette is a spec violation -> None
    import struct
    bad = bytearray(png_encode_rgb16(2, 2, [bytes(12), bytes(12)]))
    ihdr_at = bad.find(b"IHDR")
    bad[ihdr_at + 13] = 3                       # ctype byte -> palette
    assert png_decode_rgb(bytes(bad)) is None


def test_png_alpha_and_subbyte_variants():
    """r5 grid completion: alpha color types (4, 6) decode with alpha
    DISCARDED (PIL convert('RGB') convention), sub-byte gray scales by
    left-bit-replication, sub-byte palette unpacks MSB-first, and the
    interlaced scatter handles 4-byte pixels; spec violations None."""
    from webextract.media import (_png_pack, png_decode_rgb,
                                  png_encode_gray_alpha,
                                  png_encode_gray_subbyte,
                                  png_encode_palette_subbyte,
                                  png_encode_rgba)
    # RGBA: alpha bytes must not leak into the RGB output
    w, h = 5, 6                                   # h=6 cycles all filters
    rgba = [bytes(v for x in range(w)
                  for v in ((x * 7 + y) % 256, (x + y * 5) % 256,
                            (x * 3 + y * 11) % 256, (x * 13 + y) % 256))
            for y in range(h)]
    got = png_decode_rgb(png_encode_rgba(w, h, rgba))
    assert got is not None and got[:2] == (w, h)
    for y in range(h):
        for x in range(w):
            assert got[2][y][3 * x:3 * x + 3] == bytes(
                ((x * 7 + y) % 256, (x + y * 5) % 256,
                 (x * 3 + y * 11) % 256))
    # interlaced RGBA: the Adam7 scatter moves 4-byte pixels intact
    lace = png_decode_rgb(_png_pack(w, h, rgba, 4, 6, interlace=True))
    assert lace == got
    # gray+alpha: gray replicated to RGB, alpha dropped
    ga = [bytes(v for x in range(w)
                for v in ((x * 31 + y * 7) % 256, (x + y) % 256))
          for y in range(h)]
    got = png_decode_rgb(png_encode_gray_alpha(w, h, ga))
    for y in range(h):
        assert got[2][y][0::3] == got[2][y][1::3] == got[2][y][2::3] \
            == ga[y][0::2]
    # sub-byte gray at every depth: raw sample s -> s * (255/(2^d-1))
    for d, scale in ((1, 255), (2, 85), (4, 17)):
        rows = [bytes((x * 3 + y) % (1 << d) for x in range(9))
                for y in range(6)]                # w=9: pad bits in play
        got = png_decode_rgb(png_encode_gray_subbyte(9, 6, rows, d))
        assert got[:2] == (9, 6), d
        for y in range(6):
            assert got[2][y][0::3] == bytes(v * scale for v in rows[y]), d
    # sub-byte palette: MSB-first index unpack + PLTE lookup
    plte = bytes(c for i in range(4) for c in (i * 50, i * 60, i * 70))
    idx = [bytes((x + y) % 4 for x in range(5)) for y in range(6)]
    got = png_decode_rgb(png_encode_palette_subbyte(5, 6, idx, plte, 2))
    for y in range(6):
        for x in range(5):
            i = (x + y) % 4
            assert got[2][y][3 * x:3 * x + 3] == bytes(
                (i * 50, i * 60, i * 70))
    # index past the palette inside the packed bits is a spec error
    bad = png_encode_palette_subbyte(2, 2, [b"\x03\x00", b"\x00\x01"],
                                     bytes(9), 2)   # 3-entry PLTE
    assert png_decode_rgb(bad) is None
    # illegal declarations: sub-byte RGBA / 16-bit palette-alpha combos
    import struct, zlib
    for depth, ctype in ((4, 6), (2, 4), (16, 3), (3, 0)):
        ih = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, 0)
        b = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ih
             + struct.pack(">I", zlib.crc32(b"IHDR" + ih) & 0xFFFFFFFF))
        assert png_decode_rgb(b) is None, (depth, ctype)


def test_png_raster_and_ocr_match_bmp():
    """The PNG container must be transparent: stats and OCR text equal
    the BMP flavor byte-for-byte on the same content."""
    from webextract.media import (bmp_raster_stats, image_raster_stats,
                                  make_bmp_bytes, make_png_bytes,
                                  ocr_image, render_text_bmp,
                                  render_text_png)
    for did in (0, 3, 11):
        assert image_raster_stats(make_png_bytes(did)) == \
            bmp_raster_stats(make_bmp_bytes(did))
    for s in ("hello world 42", "", "x" * 200, "a!b"):
        assert ocr_image(render_text_png(s)) == \
            ocr_image(render_text_bmp(s))
    assert ocr_image(make_png_bytes(3)) is None    # wrong cell geometry


def test_wav_pcm_roundtrip():
    """PCM decode (r3 verdict item 5): every synthesized sample
    reconstructs exactly; summary string is deterministic; corrupt /
    non-16-bit payloads return None instead of raising."""
    from webextract.media import (make_wav_bytes, make_wav_pcm_bytes,
                                  parse_wav_pcm, wav_pcm_summary)
    for did in (0, 1, 2, 3, 5, 63, 64):
        b = make_wav_pcm_bytes(did)
        rate, ch, nf, chans = parse_wav_pcm(b)
        assert rate == (8000, 16000, 22050, 44100)[did % 4]
        assert ch == 1 + did % 2
        assert nf == 64 + did % 64
        for c in range(ch):
            for i in range(nf):
                want = ((did * 131 + i * 17 + c * 7919) % 65536) - 32768
                assert chans[c][i] == want
        s = wav_pcm_summary(b)
        assert s.startswith(f"audio {rate} hz {ch} ch {nf} frames")
        assert s.count("channel") == ch
    assert parse_wav_pcm(b"") is None
    assert parse_wav_pcm(b"RIFF1234WAVE") is None
    # header-only WAV (zero-sample payload from the header gate): the
    # declared frames are not present -> honest None, not garbage
    assert wav_pcm_summary(make_wav_bytes(3)) is None
    b = make_wav_pcm_bytes(7)
    assert parse_wav_pcm(b[:60]) is None          # truncated data


def test_extract_audio_kernel():
    """The extraction kernel routes WAV payloads through the PCM
    transcript path (fmt=audio, status=success); compressed audio
    magic is an honest skip."""
    from webextract.extract import extract_document
    from webextract.media import make_wav_pcm_bytes, wav_pcm_summary
    b = make_wav_pcm_bytes(11)
    out = extract_document(b)
    assert out.status == "success" and out.fmt == "audio"
    assert out.text == wav_pcm_summary(b)
    ogg = extract_document(b"OggS" + b"\x00" * 64)
    assert ogg.status == "skipped" and ogg.fmt == "audio"


def test_avi_frame_walk_roundtrip():
    """RIFF/AVI container walk (r4): real frame offsets match the fixed
    layout formula; truncated/corrupt payloads return None."""
    from webextract.media import make_avi_bytes, parse_avi_frames
    for did in (0, 1, 5, 7, 23):
        b = make_avi_bytes(did)
        w, h, nf = 4 + did % 5, 3 + did % 4, 3 + did % 6
        fs = ((3 * w + 3) & ~3) * h
        frames = parse_avi_frames(b)
        assert len(frames) == nf
        for k, (idx, off, sz) in enumerate(frames):
            assert idx == k and sz == fs
            assert off == 232 + k * (8 + fs)
            # the offset really points at the frame payload
            assert b[off - 8:off - 4] == b"00db"
    assert parse_avi_frames(b"") is None
    assert parse_avi_frames(b"RIFF\x00\x00\x00\x00WAVE") is None
    b = make_avi_bytes(3)
    assert parse_avi_frames(b[:100]) is None        # no movi reached
    # r4 review: at EVERY truncation point, returned offsets must stay
    # inside the actual buffer (the declared RIFF size lies past a cut)
    for cut in range(len(b)):
        got = parse_avi_frames(b[:cut])
        assert got is None or all(o + sz <= cut for _, o, sz in got), cut
    # adversarial deep LIST nesting must return, not RecursionError
    import struct
    deep = b"".join(b"LIST" + struct.pack("<I", 4 + 12 * (3000 - k))
                    + b"hdrl" for k in range(3000))
    payload = b"RIFF" + struct.pack("<I", 4 + len(deep)) + b"AVI " + deep
    assert parse_avi_frames(payload) is None
    # LZW bomb guard: a 1x1 GIF towing megabytes of codes must not
    # inflate — decode returns promptly with the 1-pixel raster
    from webextract.media import gif_decode_rgb, gif_encode_gray
    bomb = gif_encode_gray(1, 1, [b"\x05"])
    big_tail = gif_encode_gray(200, 200, [bytes(range(200))] * 200)
    # graft the big image's LZW stream onto the 1x1 header: fixed
    # layout = 6 (sig) + 7 (LSD) + 768 (palette) + 10 (descriptor)
    crafted = bomb[:791] + big_tail[791:]
    out = gif_decode_rgb(crafted)
    assert out is not None and (out[0], out[1]) == (1, 1)
    assert len(out[2]) == 1 and len(out[2][0]) == 3  # exactly 1 px


def test_gif_lzw_roundtrip():
    """GIF LZW decode (r4): full variable-width LZW with clear/end
    codes reconstructs every pixel, including images long enough to
    exercise the encoder's periodic-clear cadence; corrupt payloads
    return None."""
    from webextract.media import (gif_decode_rgb, gif_encode_gray,
                                  make_gif_bytes, parse_image_header)
    for did in (0, 1, 5, 7, 19, 23):
        b = make_gif_bytes(did)
        assert parse_image_header(b)[0] == "gif"
        w, h, rows = gif_decode_rgb(b)
        assert (w, h) == (4 + did % 5, 3 + did % 4)
        for y in range(h):
            for x in range(w):
                v = (did * 7 + x * 13 + y * 17) % 256
                assert rows[y][3 * x:3 * x + 3] == bytes((v, v, v))
    # > 253 pixels forces mid-stream CLEAR codes
    big = gif_encode_gray(40, 30, [bytes((x + y) % 256 for x in range(40))
                                   for y in range(30)])
    w, h, rows = gif_decode_rgb(big)
    assert (w, h) == (40, 30)
    assert all(rows[y][3 * x] == (x + y) % 256
               for y in range(30) for x in range(40))
    # totality
    assert gif_decode_rgb(b"") is None
    assert gif_decode_rgb(b"GIF89a") is None
    from webextract.media import make_image_bytes
    assert gif_decode_rgb(make_image_bytes(2)) is None   # header-only GIF
    full = make_gif_bytes(7)
    for cut in range(len(full)):
        r = gif_decode_rgb(full[:cut])
        assert r is None or (len(r[2]) == r[1])


def test_mjpeg_video_frame_decode():
    """Compressed-video path (r5): every '00dc' chunk is a REAL
    baseline JPEG; per-frame stats must match the block formula
    byte-exactly, and damage must degrade gracefully (skip, not raise,
    never a phantom frame)."""
    from webextract.media import (image_raster_stats,
                                  make_mjpeg_avi_bytes, parse_avi_frames)
    for did in (0, 2, 9, 42):
        b = make_mjpeg_avi_bytes(did)
        bw, bh, nf = 2 + did % 3, 1 + did % 3, 1 + did % 3
        frames = parse_avi_frames(b)
        assert len(frames) == nf
        for k, off, sz in frames:
            assert b[off:off + 2] == b"\xff\xd8"     # real JPEG SOI
            st = image_raster_stats(b[off:off + sz])
            vals = [(did * 11 + k * 19 + bx * 29 + by * 37) % 256
                    for bx in range(bw) for by in range(bh)]
            assert st["n_px"] == bw * bh * 64
            assert (st["r_min"], st["r_max"]) == (min(vals), max(vals))
            assert st["r_mean"] == round(sum(vals) / len(vals), 4)
            assert st["g_mean"] == st["r_mean"] == st["b_mean"]
    # a frame whose entropy stream is cut must decode to None, while
    # the container walk still clamps its extent inside the buffer
    b = make_mjpeg_avi_bytes(5)
    k0, off0, sz0 = parse_avi_frames(b)[0]
    assert image_raster_stats(b[off0:off0 + sz0 // 2]) is None
    # corrupting a frame's JPEG marker leaves OTHER frames decodable
    broken = bytearray(b)
    broken[off0] = 0x00
    got = [image_raster_stats(bytes(broken)[o:o + s]) is not None
           for _, o, s in parse_avi_frames(bytes(broken))]
    assert got[0] is False and any(got[1:])


def test_render_glyph_rows_cellrow_identity():
    """The r6 cell-row glyph renderer must be byte-identical to the
    per-pixel reference canvas for every glyph, blank cells, partial
    last rows, and unsupported characters."""
    import random
    import string

    from webextract.media import (_CELL_H, _CELL_W, _FONT, OCR_COLS,
                                  OCR_MAX_CHARS, _render_glyph_rows)

    def reference(text):
        s = text[:OCR_MAX_CHARS]
        n_rows = max(1, -(-len(s) // OCR_COLS))
        w, h = OCR_COLS * _CELL_W, n_rows * _CELL_H
        px = [bytearray(b"\xff" * (3 * w)) for _ in range(h)]
        for idx, ch in enumerate(s):
            glyph = _FONT.get(ch)
            if glyph is None:
                continue
            cy, cx = divmod(idx, OCR_COLS)
            for gy, row in enumerate(glyph):
                for gx, ink in enumerate(row):
                    if ink == "#":
                        x = cx * _CELL_W + gx
                        y = cy * _CELL_H + gy
                        px[y][3 * x:3 * x + 3] = b"\x00\x00\x00"
        return (w, h, [bytes(r) for r in px])

    rng = random.Random(11)
    alphabet = string.ascii_lowercase + string.digits + "  @?"
    cases = ["", "a", " " * 10, "".join(sorted(_FONT)),
             "the quick brown fox 0123456789"]
    cases += ["".join(rng.choice(alphabet)
                      for _ in range(rng.randint(0, 200)))
              for _ in range(200)]
    for t in cases:
        assert reference(t) == _render_glyph_rows(t), repr(t[:40])
