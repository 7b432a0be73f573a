#!/usr/bin/env python3
"""Generate the committed binary image fixtures and their expected decode
statistics (provenance for the q_media_pixels / q_media_features /
q_media_resize oracles and MultimodalSpec assertions).

Pure-stdlib PNG/BMP encoders (zlib + struct) writing deterministic pixel
patterns; the expected per-fixture statistics are computed HERE, from the
raw patterns, by an implementation independent of the Scala decoder — so
a defiltering/stride/channel-order/palette-lookup bug in the engine
cannot cancel out.

Coverage:
  - PNG 8-bit, color types 0/2/4/6, rows cycling all five filter types
    (None/Sub/Up/Average/Paeth) so the full defilter path is exercised.
  - PNG 16-bit (types 0 and 2): the decoder narrows to 8-bit by taking
    each sample's high byte (the spec-sanctioned approximation); expected
    stats here are computed over the same high-byte pattern.
  - PNG palette (type 3) at bit depth 8 and at depth 4 with an odd width
    (sub-byte index unpacking + partial trailing byte), PLTE lookup → RGB.
  - BMP 24bpp bottom-up (padded stride), 32bpp, 24bpp top-down (negative
    height) that must decode identically to its bottom-up twin.
  - BMP 8bpp uncompressed with a 64-color table (biClrUsed=64, odd width).
  - BMP 8bpp BI_RLE8: encoded runs + an absolute-mode segment per row +
    EOL/EOF escapes (bottom-up, as RLE mandates).

Run from the repo root:  python3 tools/make_fixtures.py
Writes src/main/resources/graft/fixtures/ and prints the expected-value
tables to paste into SparkEntry.oracleSql / MultimodalSpec.
"""
import os, struct, zlib

OUT = "src/main/resources/graft/fixtures"

# ---------- deterministic pixel patterns (8-bit effective values) ----------

def pat_grey(x, y):  return ((x * 31 + y * 7) % 256,)
def pat_rgb(x, y):   return ((x * 37 + y * 101) % 256, (x * 59 + y * 13) % 256,
                             (x * 83 + y * 29) % 256)
def pat_rgba(x, y):  return pat_rgb(x, y) + ((x * 17 + y * 43) % 256,)
def pat_greya(x, y): return pat_grey(x, y) + ((x * 11 + y * 61) % 256,)

# 16-bit raw sample patterns (the decoder keeps the high byte)
def pat16_grey(x, y): return ((x * 4021 + y * 257) % 65536,)
def pat16_rgb(x, y):  return ((x * 4021 + y * 257) % 65536,
                              (x * 1031 + y * 523) % 65536,
                              (x * 757 + y * 3001) % 65536)
def hi8(pat16):
    return lambda x, y: tuple(v >> 8 for v in pat16(x, y))

# palettes + index patterns
PAL64 = [((i * 53) % 256, (i * 97) % 256, (i * 31) % 256) for i in range(64)]
PAL16 = [((i * 29) % 256, (i * 61) % 256, (i * 101) % 256) for i in range(16)]
def idx_pal8(x, y): return (x * 5 + y * 11) % 64
def idx_pal4(x, y): return (x * 3 + y * 7) % 16
def idx_bmp8(x, y): return ((x // 3) * 7 + y * 13) % 64   # runs of 3 for RLE
def pal_pat(palette, idx):
    return lambda x, y: palette[idx(x, y)]

# ---------- PNG encoder (no interlace; depths 8/16 + palette 4/8) ----------

def _png_chunks(w, h, depth, color_type, raw_rows, filter_bpp, extra=()):
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    filtered = bytearray()
    for y, row in enumerate(raw_rows):
        ft = y % 5  # cycle every filter type
        prev = raw_rows[y - 1] if y > 0 else bytes(len(row))
        filtered.append(ft)
        for i, v in enumerate(row):
            a = row[i - filter_bpp] if i >= filter_bpp else 0
            b = prev[i]
            c = prev[i - filter_bpp] if i >= filter_bpp else 0
            if ft == 0:   f = v
            elif ft == 1: f = (v - a) & 0xff
            elif ft == 2: f = (v - b) & 0xff
            elif ft == 3: f = (v - (a + b) // 2) & 0xff
            else:         f = (v - paeth(a, b, c)) & 0xff
            filtered.append(f)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", zlib.crc32(typ + data) & 0xffffffff))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    body = b"".join(chunk(t, d) for t, d in extra)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + body +
            chunk(b"IDAT", zlib.compress(bytes(filtered))) +
            chunk(b"IEND", b""))

def png(w, h, color_type, pat):
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = [bytes(c for x in range(w) for c in pat(x, y)) for y in range(h)]
    return _png_chunks(w, h, 8, color_type, raw, ch)

def png16(w, h, color_type, pat16):
    ch = {0: 1, 2: 3}[color_type]
    raw = [b"".join(struct.pack(">H", v) for x in range(w)
                    for v in pat16(x, y)) for y in range(h)]
    return _png_chunks(w, h, 16, color_type, raw, ch * 2)

def png_pal(w, h, depth, palette, idx):
    per_byte = 8 // depth
    raw = []
    for y in range(h):
        row = bytearray()
        for i in range(0, w, per_byte):
            b = 0
            for j in range(per_byte):
                v = idx(i + j, y) if i + j < w else 0
                b = (b << depth) | v
            row.append(b)
        raw.append(bytes(row))
    plte = b"".join(bytes(rgb) for rgb in palette)
    return _png_chunks(w, h, depth, 3, raw, 1, extra=((b"PLTE", plte),))

# ---------- BMP encoder (BITMAPINFOHEADER; BI_RGB 8/24/32, BI_RLE8) ----------

def _bmp_header(w, hdr_h, bpp, compression, data_len, palette=()):
    tbl = b"".join(bytes((c[2], c[1], c[0], 0)) for c in palette)
    off = 54 + len(tbl)
    return (b"BM" + struct.pack("<IHHI", off + data_len, 0, 0, off) +
            struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, bpp, compression,
                        data_len, 2835, 2835, len(palette), 0) + tbl)

def bmp(w, h, bpp, pat, top_down=False):
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            px = pat(x, y)
            row += bytes((px[2], px[1], px[0]))  # BGR
            if nch == 4:
                row += bytes((px[3],))
        row += b"\xaa" * (stride - len(row))     # non-zero padding on purpose
        rows.append(bytes(row))
    if not top_down:
        rows = rows[::-1]                         # bottom-up storage
    data = b"".join(rows)
    return _bmp_header(w, -h if top_down else h, bpp, 0, len(data)) + data

def bmp8(w, h, palette, idx):
    stride = (w + 3) & ~3
    rows = []
    for y in range(h):
        row = bytes(idx(x, y) for x in range(w)) + b"\xaa" * (stride - w)
        rows.append(row)
    data = b"".join(rows[::-1])                   # bottom-up
    return _bmp_header(w, h, 8, 0, len(data), palette) + data

def bmp_rle8(w, h, palette, idx):
    out = bytearray()
    for y in range(h - 1, -1, -1):                # RLE rows are bottom-up
        row = [idx(x, y) for x in range(w)]
        x = 0
        first_seg = True
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            if first_seg and run >= 3:
                # absolute-mode segment (escape 00, count>=3, literals,
                # word-aligned) to exercise that decoder branch
                out += bytes((0, run)) + bytes(row[x:x + run])
                if run & 1:
                    out.append(0)
            else:
                out += bytes((run, row[x]))
            first_seg = False
            x += run
        out += bytes((0, 0))                      # end of line
    out += bytes((0, 1))                          # end of bitmap
    return _bmp_header(w, h, 8, 1, len(out), palette) + bytes(out)

# ---------- Adam7 interlaced PNG (round 9: closes the interlace stub) ----------

# pass origins/strides from the PNG spec §8.2
ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

def _filter_pass(raw_rows, filter_bpp):
    """Filter one pass's scanlines (cycling all five filter types); the
    filter context resets at each pass boundary, as the spec mandates."""
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
    out = bytearray()
    for y, row in enumerate(raw_rows):
        ft = y % 5
        prev = raw_rows[y - 1] if y > 0 else bytes(len(row))
        out.append(ft)
        for i, v in enumerate(row):
            a = row[i - filter_bpp] if i >= filter_bpp else 0
            b = prev[i]
            c = prev[i - filter_bpp] if i >= filter_bpp else 0
            if ft == 0:   f = v
            elif ft == 1: f = (v - a) & 0xff
            elif ft == 2: f = (v - b) & 0xff
            elif ft == 3: f = (v - (a + b) // 2) & 0xff
            else:         f = (v - paeth(a, b, c)) & 0xff
            out.append(f)
    return out

def _png_adam7(w, h, depth, color_type, pass_row, filter_bpp, extra=()):
    """pass_row(x0, y0, dx, dy, pw, j) -> packed bytes of pass scanline j."""
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", zlib.crc32(typ + data) & 0xffffffff))
    stream = bytearray()
    for (x0, y0, dx, dy) in ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw <= 0 or ph <= 0:
            continue  # empty passes contribute no bytes
        rows = [pass_row(x0, y0, dx, dy, pw, j) for j in range(ph)]
        stream += _filter_pass(rows, filter_bpp)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1)
    body = b"".join(chunk(t, d) for t, d in extra)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + body +
            chunk(b"IDAT", zlib.compress(bytes(stream))) +
            chunk(b"IEND", b""))

def png_adam7(w, h, color_type, pat):
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    def pass_row(x0, y0, dx, dy, pw, j):
        return bytes(c for i in range(pw) for c in pat(x0 + i * dx, y0 + j * dy))
    return _png_adam7(w, h, 8, color_type, pass_row, ch)

def png16_adam7(w, h, color_type, pat16):
    ch = {0: 1, 2: 3}[color_type]
    def pass_row(x0, y0, dx, dy, pw, j):
        return b"".join(struct.pack(">H", v) for i in range(pw)
                        for v in pat16(x0 + i * dx, y0 + j * dy))
    return _png_adam7(w, h, 16, color_type, pass_row, ch * 2)

def png_adam7_pal(w, h, depth, palette, idx):
    per_byte = 8 // depth
    def pass_row(x0, y0, dx, dy, pw, j):
        row = bytearray()
        for i in range(0, pw, per_byte):
            b = 0
            for k in range(per_byte):
                v = idx(x0 + (i + k) * dx, y0 + j * dy) if i + k < pw else 0
                b = (b << depth) | v
            row.append(b)
        return bytes(row)
    plte = b"".join(bytes(rgb) for rgb in palette)
    return _png_adam7(w, h, depth, 3, pass_row, 1, extra=((b"PLTE", plte),))

# ---------- BMP 4bpp / RLE4 / BI_BITFIELDS (round 9) ----------

def bmp4(w, h, palette, idx):
    stride = ((w + 1) // 2 + 3) & ~3
    rows = []
    for y in range(h):
        row = bytearray()
        for i in range(0, w, 2):
            hi = idx(i, y)
            lo = idx(i + 1, y) if i + 1 < w else 0
            row.append((hi << 4) | lo)
        row += b"\xaa" * (stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows[::-1])                   # bottom-up
    return _bmp_header(w, h, 4, 0, len(data), palette) + data

def bmp_rle4(w, h, palette, idx):
    out = bytearray()
    for y in range(h - 1, -1, -1):                # RLE rows are bottom-up
        row = [idx(x, y) for x in range(w)]
        x = 0
        first_seg = True
        while x < w:
            # a "run" in RLE4 alternates the two nibbles of the value byte:
            # count how far the alternating pair row[x],row[x+1] extends
            a = row[x]
            b = row[x + 1] if x + 1 < w else a
            run = 1
            while x + run < w and run < 255 and \
                    row[x + run] == (a if run % 2 == 0 else b):
                run += 1
            if first_seg and run >= 3:
                # absolute-mode segment: escape 00, count, packed nibbles,
                # word-aligned — exercises that decoder branch
                seg = row[x:x + run]
                packed = bytearray()
                for i in range(0, len(seg), 2):
                    hi = seg[i]
                    lo = seg[i + 1] if i + 1 < len(seg) else 0
                    packed.append((hi << 4) | lo)
                if len(packed) & 1:
                    packed.append(0)
                out += bytes((0, run)) + bytes(packed)
            else:
                out += bytes((run, (a << 4) | b))
            first_seg = False
            x += run
        out += bytes((0, 0))                      # end of line
    out += bytes((0, 1))                          # end of bitmap
    return _bmp_header(w, h, 4, 2, len(out), palette) + bytes(out)

# 5-6-5 sub-byte channels: the decoder scales v -> v*255//maxval (floor),
# so the expected pattern here applies the SAME floor scaling
def pat_565_fields(x, y):
    return ((x * 5 + y * 3) % 32, (x * 7 + y) % 64, (x * 11 + y * 5) % 32)

def pat_565(x, y):
    r5, g6, b5 = pat_565_fields(x, y)
    return (r5 * 255 // 31, g6 * 255 // 63, b5 * 255 // 31)

def bmp16_565(w, h):
    """16bpp BI_BITFIELDS with 5-6-5 masks appended after the 40-byte
    header (the BITMAPINFOHEADER+masks layout)."""
    stride = (w * 2 + 3) & ~3
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            r5, g6, b5 = pat_565_fields(x, y)
            row += struct.pack("<H", (r5 << 11) | (g6 << 5) | b5)
        row += b"\xaa" * (stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows[::-1])
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    off = 54 + len(masks)
    return (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off) +
            struct.pack("<IiiHHIIiiII", 40, w, h, 1, 16, 3,
                        len(data), 2835, 2835, 0, 0) + masks + data)

def bmp32_bf(w, h, pat):
    """32bpp BI_BITFIELDS, BITMAPV3INFOHEADER (56 bytes) with in-header
    ARGB8888 masks — 8-bit fields, so scaling is the identity and the
    fixture isolates mask decomposition + the alpha channel."""
    stride = w * 4
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            r, g, b, a = pat(x, y)
            row += struct.pack("<I", (a << 24) | (r << 16) | (g << 8) | b)
        rows.append(bytes(row))
    data = b"".join(rows[::-1])
    off = 14 + 56
    return (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off) +
            struct.pack("<IiiHHIIiiII", 56, w, h, 1, 32, 3,
                        len(data), 2835, 2835, 0, 0) +
            struct.pack("<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF,
                        0xFF000000) + data)

# ---------- independent expected-statistics implementation ----------

def lum_of(px, ch):
    return px[0] if ch <= 2 else (299 * px[0] + 587 * px[1] + 114 * px[2]) // 1000

def stats(w, h, ch, pat):
    lumas = [lum_of(pat(x, y), ch) for y in range(h) for x in range(w)]
    hist = [0] * 8
    for l in lumas:
        hist[l >> 5] += 1
    n = len(lumas)
    feat = [c / n for c in hist]
    norm = sum(f * f for f in feat) ** 0.5
    return sum(lumas) / n, norm

# nearest-neighbor resize expectations: src = (dst * src_dim) // dst_dim —
# the exact integer mapping Multimodal.resizePixels uses
def resize_stats(w, h, ch, pat, tw, th):
    lumas = [lum_of(pat(x * w // tw, y * h // th), ch)
             for y in range(th) for x in range(tw)]
    return sum(lumas) / len(lumas)

RESIZE_W, RESIZE_H = 3, 2

FIXTURES = [
    ("png_grey.png",      8, 8, 1, pat_grey,  lambda: png(8, 8, 0, pat_grey)),
    ("png_rgb.png",       8, 8, 3, pat_rgb,   lambda: png(8, 8, 2, pat_rgb)),
    ("png_greya.png",     8, 8, 2, pat_greya, lambda: png(8, 8, 4, pat_greya)),
    ("png_rgba.png",      8, 8, 4, pat_rgba,  lambda: png(8, 8, 6, pat_rgba)),
    ("bmp24.bmp",         5, 6, 3, pat_rgb,   lambda: bmp(5, 6, 24, pat_rgb)),
    ("bmp32.bmp",         4, 4, 4, pat_rgba,  lambda: bmp(4, 4, 32, pat_rgba)),
    ("bmp24_topdown.bmp", 5, 6, 3, pat_rgb,   lambda: bmp(5, 6, 24, pat_rgb, top_down=True)),
    ("png_pal8.png",      8, 8, 3, pal_pat(PAL64, idx_pal8),
     lambda: png_pal(8, 8, 8, PAL64, idx_pal8)),
    ("png_pal4.png",      6, 5, 3, pal_pat(PAL16, idx_pal4),
     lambda: png_pal(6, 5, 4, PAL16, idx_pal4)),
    ("png_grey16.png",    8, 8, 1, hi8(pat16_grey),
     lambda: png16(8, 8, 0, pat16_grey)),
    ("png_rgb16.png",     8, 8, 3, hi8(pat16_rgb),
     lambda: png16(8, 8, 2, pat16_rgb)),
    ("bmp_pal8.bmp",      7, 5, 3, pal_pat(PAL64, idx_bmp8),
     lambda: bmp8(7, 5, PAL64, idx_bmp8)),
    ("bmp_rle8.bmp",     10, 4, 3, pal_pat(PAL64, idx_bmp8),
     lambda: bmp_rle8(10, 4, PAL64, idx_bmp8)),
]

# Round-9 additions. doc_ids continue AFTER the four JPEG fixtures
# (make_jpeg_fixtures.py BASE_ID=13 → -14..-17), so base 17 → -18...
# Odd dimensions on the Adam7 fixtures exercise partial passes; 10x9 and
# 9x7 keep every one of the seven passes non-empty.
BASE_ID2 = 17
FIXTURES2 = [
    ("png_adam7_rgb.png",   10, 9, 3, pat_rgb,
     lambda: png_adam7(10, 9, 2, pat_rgb)),
    ("png_adam7_pal4.png",   9, 7, 3, pal_pat(PAL16, idx_pal4),
     lambda: png_adam7_pal(9, 7, 4, PAL16, idx_pal4)),
    ("png_adam7_grey16.png", 8, 8, 1, hi8(pat16_grey),
     lambda: png16_adam7(8, 8, 0, pat16_grey)),
    ("bmp_pal4.bmp",         7, 5, 3, pal_pat(PAL16, idx_pal4),
     lambda: bmp4(7, 5, PAL16, idx_pal4)),
    ("bmp_rle4.bmp",        10, 4, 3, pal_pat(PAL16, idx_pal4),
     lambda: bmp_rle4(10, 4, PAL16, idx_pal4)),
    ("bmp16_565.bmp",        6, 5, 3, pat_565,
     lambda: bmp16_565(6, 5)),
    ("bmp32_bf.bmp",         4, 4, 4, pat_rgba,
     lambda: bmp32_bf(4, 4, pat_rgba)),
]

def main():
    os.makedirs(OUT, exist_ok=True)
    both = [(-(i + 1), f) for i, f in enumerate(FIXTURES)] + \
           [(-(BASE_ID2 + i + 1), f) for i, f in enumerate(FIXTURES2)]
    print("-- fixture expected values (doc_id = -(position), pre-round) --")
    for did, (name, w, h, ch, pat, enc) in both:
        data = enc()
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        luma, norm = stats(w, h, ch, pat)
        print(f"{name}: doc_id={did} bytes={len(data)} w={w} h={h} ch={ch} "
              f"luma_mean={luma!r} feature_norm={norm!r} "
              f"(6dp: {round(luma,6)}, {round(norm,6)})")
    print(f"-- nearest-neighbor resize to {RESIZE_W}x{RESIZE_H} --")
    for did, (name, w, h, ch, pat, enc) in both:
        rl = resize_stats(w, h, ch, pat, RESIZE_W, RESIZE_H)
        print(f"{name}: doc_id={did} resized_luma_mean={rl!r} "
              f"(6dp: {round(rl,6)})")

if __name__ == "__main__":
    main()
