#!/usr/bin/env python3
"""Round-9b video fixtures: an INTERLACED animated GIF and a Motion-JPEG
AVI, plus their expected decode statistics (provenance for the new
q_media_video oracle rows and MultimodalSpec assertions).

Same methodology as tools/make_av_fixtures.py / make_jpeg_fixtures.py:
pure-stdlib encoders over deterministic integer patterns; the expected
statistics are computed HERE from the raw patterns (GIF) or by the
independent Python JPEG decoder twin over the encoded bytes (AVI), so a
de-interlace, container-walk, or entropy-decode bug in the Scala engine
cannot cancel out.

Coverage added:
  - gif_interlaced.gif (doc_id -205): 3-frame animation, every frame
    interlace-flagged — rows stored in the GIF89a appendix-E four-pass
    order; stats pinned to the DISPLAY-order pattern, so a decoder that
    ignores the interlace flag fails the oracle.
  - avi_mjpeg.avi (doc_id -206): 5 JFIF frames in a RIFF AVI container
    (hdrl with avih/strh/strf, movi with two bare 00dc chunks, a
    LIST('rec ') holding two more + an interleaved audio 01wb chunk to be
    skipped, one 00db chunk, JUNK padding and a trailing idx1). Frame
    payloads come from make_jpeg_fixtures.encode_jpeg; expected lumas
    from its decode_jpeg twin. n=3 sampling must pick file frames
    floor(i*5/3) = 0,1,3.

Run from the repo root:  python3 tools/make_video_fixtures.py
"""
import math, os, struct, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_av_fixtures import (lzw_encode, lzw_decode, sub_blocks, palette,
                              pal_bytes, frame_indices, frame_stats,
                              sample_positions)
from make_jpeg_fixtures import encode_jpeg, decode_jpeg, pat_rgb

OUT = "src/main/resources/graft/fixtures"

# ======================= interlaced GIF =======================

def interlace_order(h):
    """GIF89a appendix E: pass 1 rows 0,8,16…, pass 2 rows 4,12…,
    pass 3 rows 2,6,10…, pass 4 rows 1,3,5…"""
    rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, h, step))
    return rows

def gif_bytes_interlaced(canvas_w, canvas_h, gct, frames):
    """frames: list of (w, h, display_order_indices). Every frame is
    full-canvas at (0,0) with the interlace flag set; the index stream is
    stored in four-pass row order."""
    gct_bits = int(math.log2(len(gct))) - 1
    out = b"GIF89a"
    out += struct.pack("<HH", canvas_w, canvas_h)
    out += bytes([0x80 | 0x70 | gct_bits, 0, 0])
    out += pal_bytes(gct)
    for (w, h, idx) in frames:
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE: delay 10
        stored = []
        for row in interlace_order(h):
            stored.extend(idx[row * w:(row + 1) * w])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x40])
        mcs = max(2, int(math.log2(len(gct))))
        out += bytes([mcs]) + sub_blocks(lzw_encode(stored, mcs))
    return out + b"\x3b"

# =========================== MJPEG AVI ===========================

def chunk(fourcc, payload):
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad

def lst(listtype, payload):
    return chunk(b"LIST", listtype + payload)

def avi_bytes(w, h, jpeg_frames):
    """Minimal spec-shaped AVI: RIFF('AVI ' LIST('hdrl' avih LIST('strl'
    strh strf)) JUNK LIST('movi' …) idx1). Frame chunks are 00dc except
    the last (00db); frames 2 and 3 sit inside a LIST('rec ') together
    with a to-be-skipped 01wb audio chunk."""
    n = len(jpeg_frames)
    avih = struct.pack("<14I", 40000, 0, 0, 0x10, n, 0, 1, 0, w, h,
                       0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack("<10I", 0, 0, 0, 1, 25, 0, n, 0,
                                           0, 0) + struct.pack("<4H", 0, 0,
                                                               w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    movi_body += chunk(b"00dc", jpeg_frames[0])
    movi_body += chunk(b"00dc", jpeg_frames[1])
    movi_body += lst(b"rec ", chunk(b"00dc", jpeg_frames[2]) +
                     chunk(b"01wb", b"\x00\x01" * 9) +   # odd-ish audio blob
                     chunk(b"00dc", jpeg_frames[3]))
    movi_body += chunk(b"00db", jpeg_frames[4])
    movi = lst(b"movi", movi_body)
    idx1 = chunk(b"idx1", struct.pack("<4sIII", b"00dc", 0x10, 4, 100) * n)
    body = b"AVI " + hdrl + chunk(b"JUNK", b"\x00" * 11) + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body

def int_luma(r, g, b):
    return (299 * r + 587 * g + 114 * b) // 1000

def jpeg_frame_stats(data):
    w, h, ch, px = decode_jpeg(data)
    n = w * h
    s = sum(int_luma(px[i * ch], px[i * ch + 1], px[i * ch + 2])
            for i in range(n))
    return dict(width=w, height=h, luma_mean=s / n)

# =========================== main ===========================

def main():
    os.makedirs(OUT, exist_ok=True)

    # ---- interlaced GIF (doc_id -205): 3 frames, 9x13, 8-color ----
    pal8 = palette(8, salt=11)
    w, h = 9, 13
    frames, stats = [], []
    for f in range(3):
        idx = frame_indices(w, h, f, 8)
        frames.append((w, h, idx))
        stats.append(frame_stats(w, h, idx, pal8))
    gif = gif_bytes_interlaced(w, h, pal8, frames)
    # self-check: LZW round-trip + de-interlace must restore display order
    order = interlace_order(h)
    for f in range(3):
        idx = frame_indices(w, h, f, 8)
        stored = []
        for row in order:
            stored.extend(idx[row * w:(row + 1) * w])
        dec = lzw_decode(lzw_encode(stored, 3), 3)
        resto = [0] * (w * h)
        for sy, dy in enumerate(order):
            resto[dy * w:(dy + 1) * w] = dec[sy * w:(sy + 1) * w]
        assert resto == idx, f"de-interlace round-trip failed frame {f}"
    print("interlace self-check: all frames round-trip to display order")
    with open(os.path.join(OUT, "gif_interlaced.gif"), "wb") as fh:
        fh.write(gif)
    print(f"wrote gif_interlaced.gif: {len(gif)} bytes")

    # ---- MJPEG AVI (doc_id -206): 5 frames, 16x8 color 4:4:4 ----
    jf = [encode_jpeg(16, 8, (lambda f: lambda x, y:
                              pat_rgb(x + 3 * f, y + 2 * f))(f), color=True)
          for f in range(5)]
    avi = avi_bytes(16, 8, jf)
    astats = [jpeg_frame_stats(d) for d in jf]
    with open(os.path.join(OUT, "avi_mjpeg.avi"), "wb") as fh:
        fh.write(avi)
    print(f"wrote avi_mjpeg.avi: {len(avi)} bytes "
          f"(frames {[len(d) for d in jf]})")

    print("\n--- q_media_video NEW rows (n=3 sampled) ---")
    for did, st_list in ((-205, stats), (-206, astats)):
        sel = sample_positions(len(st_list), 3)
        for ord_i, fi in enumerate(sel):
            st = st_list[fi]
            print(f"  ({did}, {ord_i}, {st['width']}, {st['height']}, "
                  f"{st['luma_mean']!r}),  -- file-frame {fi}")

    print("\n--- frame profile (framesAll n=4 real path) ---")
    for did, st_list in ((-205, stats), (-206, astats)):
        sel = sample_positions(len(st_list), 4)
        st0 = st_list[sel[0]]
        print(f"  ({did}, {len(sel)}, {st0['width'] * st0['height'] * 3})")

if __name__ == "__main__":
    main()
