#!/usr/bin/env python3
"""Generate the committed binary image fixtures and their expected decode
statistics (provenance for the q_media_pixels / q_media_features oracles
and MultimodalSpec assertions).

Pure-stdlib PNG/BMP encoders (zlib + struct) writing deterministic pixel
patterns; the expected per-fixture statistics are computed HERE, from the
raw patterns, by an implementation independent of the Scala decoder — so
a defiltering/stride/channel-order bug in the engine cannot cancel out.

PNG rows cycle through all five filter types (None/Sub/Up/Average/Paeth)
so the fixtures exercise the full defilter path. BMP fixtures cover
bottom-up 24bpp with a padded stride, 32bpp, and a top-down (negative
height) variant that must decode identically to its bottom-up twin.

Run from the repo root:  python3 tools/make_fixtures.py
Writes src/main/resources/graft/fixtures/ and prints the expected-value
tables to paste into SparkEntry.oracleSql / MultimodalSpec.
"""
import os, struct, zlib

OUT = "src/main/resources/graft/fixtures"

# ---------- deterministic pixel patterns ----------

def pat_grey(x, y):  return ((x * 31 + y * 7) % 256,)
def pat_rgb(x, y):   return ((x * 37 + y * 101) % 256, (x * 59 + y * 13) % 256,
                             (x * 83 + y * 29) % 256)
def pat_rgba(x, y):  return pat_rgb(x, y) + ((x * 17 + y * 43) % 256,)
def pat_greya(x, y): return pat_grey(x, y) + ((x * 11 + y * 61) % 256,)

# ---------- PNG encoder (8-bit depth, no interlace) ----------

def png(w, h, color_type, pat):
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = [bytes(c for x in range(w) for c in pat(x, y)) for y in range(h)]
    bpp = ch  # bytes per pixel at bit depth 8

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    filtered = bytearray()
    for y, row in enumerate(raw):
        ft = y % 5  # cycle every filter type
        prev = raw[y - 1] if y > 0 else bytes(len(row))
        filtered.append(ft)
        for i, v in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:   f = v
            elif ft == 1: f = (v - a) & 0xff
            elif ft == 2: f = (v - b) & 0xff
            elif ft == 3: f = (v - (a + b) // 2) & 0xff
            else:         f = (v - paeth(a, b, c)) & 0xff
            filtered.append(f)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", zlib.crc32(typ + data) & 0xffffffff))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(filtered))) +
            chunk(b"IEND", b""))

# ---------- BMP encoder (BITMAPINFOHEADER, BI_RGB) ----------

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
    hdr_h = -h if top_down else h
    header = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54) +
              struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, bpp, 0,
                          len(data), 2835, 2835, 0, 0))
    return header + data

# ---------- independent expected-statistics implementation ----------

def stats(w, h, ch, pat):
    lumas = []
    for y in range(h):
        for x in range(w):
            px = pat(x, y)
            if ch <= 2:
                lum = px[0]
            else:
                lum = (299 * px[0] + 587 * px[1] + 114 * px[2]) // 1000
            lumas.append(lum)
    hist = [0] * 8
    for l in lumas:
        hist[l >> 5] += 1
    n = len(lumas)
    feat = [c / n for c in hist]
    norm = sum(f * f for f in feat) ** 0.5
    return sum(lumas) / n, norm

FIXTURES = [
    ("png_grey.png",      8, 8, 1, pat_grey,  lambda: png(8, 8, 0, pat_grey)),
    ("png_rgb.png",       8, 8, 3, pat_rgb,   lambda: png(8, 8, 2, pat_rgb)),
    ("png_greya.png",     8, 8, 2, pat_greya, lambda: png(8, 8, 4, pat_greya)),
    ("png_rgba.png",      8, 8, 4, pat_rgba,  lambda: png(8, 8, 6, pat_rgba)),
    ("bmp24.bmp",         5, 6, 3, pat_rgb,   lambda: bmp(5, 6, 24, pat_rgb)),
    ("bmp32.bmp",         4, 4, 4, pat_rgba,  lambda: bmp(4, 4, 32, pat_rgba)),
    ("bmp24_topdown.bmp", 5, 6, 3, pat_rgb,   lambda: bmp(5, 6, 24, pat_rgb, top_down=True)),
]

def main():
    os.makedirs(OUT, exist_ok=True)
    print(f"-- fixture expected values (doc_id = -(position), luma_mean/feature_norm pre-round) --")
    for i, (name, w, h, ch, pat, enc) in enumerate(FIXTURES):
        data = enc()
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        luma, norm = stats(w, h, ch, pat)
        print(f"{name}: doc_id={-(i+1)} bytes={len(data)} w={w} h={h} ch={ch} "
              f"luma_mean={luma!r} feature_norm={norm!r} "
              f"(6dp: {round(luma,6)}, {round(norm,6)})")

if __name__ == "__main__":
    main()
