#!/usr/bin/env python3
"""Generate the committed binary AUDIO (WAV) and VIDEO (animated GIF)
fixtures and their expected decode statistics (provenance for the
q_media_audio / q_media_video oracles and MultimodalSpec assertions).

Pure-stdlib encoders (struct + a real GIF LZW compressor) writing
deterministic integer sample/index patterns; the expected statistics are
computed HERE, from the raw patterns, by an implementation independent of
the Scala decoder — so a chunk-walk, sign-extension, LZW-dictionary, or
palette-lookup bug in the engine cannot cancel out.

Audio coverage:
  - 16-bit PCM mono (plain fmt/data layout).
  - 16-bit PCM stereo (interleaved frames).
  - 8-bit unsigned PCM mono (the 8-bit center-128 convention).
  - 16-bit PCM with a junk LIST chunk of ODD size before fmt (chunk
    walking + the RIFF even-padding rule).

Video coverage (GIF, real LZW — variable code width, clear/end codes):
  - 4-frame full-canvas animation, 8-color global table, per-frame GCE.
  - single-frame GIF with a comment extension (87a-style minimal).
  - 3-frame GIF where one frame carries its own LOCAL color table and the
    frames sit at a nonzero (left,top) offset with smaller dims.
  - 5-frame 16-color GIF wide enough to push the LZW code width up.

Run from the repo root:  python3 tools/make_av_fixtures.py
Writes src/main/resources/graft/fixtures/ and prints the expected-value
tables to paste into SparkEntry.oracleSql / MultimodalSpec.
"""
import math, os, struct

OUT = "src/main/resources/graft/fixtures"

# =========================== WAV ===========================
# Deterministic integer sample patterns (exact in both languages).

def wav16_mono_samples():
    return [((k * 2477 + 101) % 8192) - 4096 for k in range(64)]

def wav16_stereo_frames():
    return [(((k * 331) % 4001) - 2000, ((k * 577) % 3001) - 1500)
            for k in range(48)]

def wav8_mono_bytes():
    return [(k * 37 + 11) % 256 for k in range(80)]

def wav16_chunky_samples():
    return [((k * 911) % 2048) - 1024 for k in range(40)]

def wav_bytes(rate, bits, channels, interleaved, junk_before_fmt=None):
    """interleaved: list of ints — signed for 16-bit, unsigned 0..255 for
    8-bit — already channel-interleaved."""
    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in interleaved)
    else:
        data = bytes(interleaved)
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    chunks = b""
    if junk_before_fmt is not None:
        chunks += b"LIST" + struct.pack("<I", len(junk_before_fmt)) + junk_before_fmt
        if len(junk_before_fmt) % 2 == 1:
            chunks += b"\x00"          # RIFF pad byte for odd chunk sizes
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2 == 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

def audio_stats(rate, bits, channels, interleaved):
    """Independent stat computation over the RAW integer pattern.
    Normalization: 16-bit x/32768; 8-bit (u-128)/128. rms over ALL
    interleaved samples; zero_cross counts strict sign flips (product < 0)
    along channel 0."""
    denom = 32768.0 if bits == 16 else 128.0
    centered = [s if bits == 16 else s - 128 for s in interleaved]
    n = len(centered)
    n_frames = n // channels
    sumsq = sum(s * s for s in centered)         # exact integer
    rms = math.sqrt(sumsq / n) / denom
    peak = max(abs(s) for s in centered) / denom
    ch0 = centered[::channels]
    zc = sum(1 for i in range(1, len(ch0)) if ch0[i - 1] * ch0[i] < 0)
    dur = n_frames * 1000.0 / rate
    return dict(sample_rate=rate, channels=channels, bits=bits,
                n_frames=n_frames, duration_ms=dur, rms=rms, peak=peak,
                zero_cross=zc)

AUDIO_FIXTURES = []  # (name, bytes, stats)

def build_audio():
    m = wav16_mono_samples()
    AUDIO_FIXTURES.append(("wav16_mono.wav",
                           wav_bytes(8000, 16, 1, m),
                           audio_stats(8000, 16, 1, m)))
    st = wav16_stereo_frames()
    inter = [x for fr in st for x in fr]
    AUDIO_FIXTURES.append(("wav16_stereo.wav",
                           wav_bytes(16000, 16, 2, inter),
                           audio_stats(16000, 16, 2, inter)))
    u8 = wav8_mono_bytes()
    AUDIO_FIXTURES.append(("wav8_mono.wav",
                           wav_bytes(11025, 8, 1, u8),
                           audio_stats(11025, 8, 1, u8)))
    ck = wav16_chunky_samples()
    AUDIO_FIXTURES.append(("wav16_chunks.wav",
                           wav_bytes(22050, 16, 1, ck,
                                     junk_before_fmt=b"INFOjunk!"),  # odd len 9
                           audio_stats(22050, 16, 1, ck)))

# =========================== GIF ===========================

def lzw_encode(indices, min_code_size):
    """Real GIF LZW: variable code width, LSB-first bit packing, leading
    clear code, trailing end code, dictionary reset at 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits = []

    def emit(code, width):
        for b in range(width):
            out_bits.append((code >> b) & 1)

    table = {(c,): c for c in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    w = ()
    for c in indices:
        wc = w + (c,)
        if wc in table:
            w = wc
        else:
            emit(table[w], width)
            table[wc] = next_code
            next_code += 1
            # standard "early change" (giflib): the moment the NEXT code to
            # assign reaches 2^width, subsequent codes use width+1 bits
            if next_code == (1 << width) and width < 12:
                width += 1
            if next_code >= 4096:
                emit(clear, width)
                table = {(c2,): c2 for c2 in range(clear)}
                next_code = end + 1
                width = min_code_size + 1
            w = (c,)
    if w:
        emit(table[w], width)
    emit(end, width)
    # pack LSB-first into bytes
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        v = 0
        for j, bit in enumerate(out_bits[i:i + 8]):
            v |= bit << j
        by.append(v)
    return bytes(by)

def sub_blocks(data):
    out = b""
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00"

def palette(n, salt=0):
    return [(((i * 53 + salt * 19) % 256, (i * 97 + salt * 7) % 256,
              (i * 29 + salt * 113) % 256)) for i in range(n)]

def pal_bytes(pal):
    return b"".join(bytes(c) for c in pal)

def gif_bytes(canvas_w, canvas_h, gct, frames, with_gce=True,
              comment=None, version=b"89a"):
    """frames: list of (left, top, w, h, indices, lct_or_None)."""
    gct_bits = int(math.log2(len(gct))) - 1
    out = b"GIF" + version
    out += struct.pack("<HH", canvas_w, canvas_h)
    out += bytes([0x80 | (0x70) | gct_bits, 0, 0])   # GCT flag, 8-bit color res
    out += pal_bytes(gct)
    if comment is not None:
        out += b"\x21\xfe" + sub_blocks(comment)
    for (left, top, w, h, idx, lct) in frames:
        if with_gce:
            out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"   # GCE: delay 10, no transp
        packed = 0
        body = b""
        if lct is not None:
            packed = 0x80 | (int(math.log2(len(lct))) - 1)
            body = pal_bytes(lct)
        out += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + bytes([packed]) + body
        mcs = max(2, int(math.log2(len(lct if lct is not None else gct))))
        out += bytes([mcs]) + sub_blocks(lzw_encode(idx, mcs))
    return out + b"\x3b"

def frame_indices(w, h, f, npal):
    # x*y*f term: frames must NOT be luma-identical permutations of each
    # other, or a wrong-frame-selected bug could pass the stats check
    return [(x * 7 + y * 11 + f * 3 + x * y * f) % npal
            for y in range(h) for x in range(w)]

def luma_rgb(r, g, b):
    return (299 * r + 587 * g + 114 * b) // 1000

def frame_stats(w, h, idx, pal):
    s = sum(luma_rgb(*pal[i]) for i in idx)
    return dict(width=w, height=h, luma_mean=s / (w * h))

def sample_positions(f, n):
    """Evenly spaced selection: all frames if f <= n else floor(i*f/n)."""
    if f <= n:
        return list(range(f))
    return [i * f // n for i in range(n)]

VIDEO_FIXTURES = []  # (name, bytes, [per-frame stats in FILE order])

def build_video():
    # 1. 4-frame full-canvas animation, 8-color GCT, GCE per frame
    pal8 = palette(8)
    frames, stats = [], []
    for f in range(4):
        idx = frame_indices(10, 8, f, 8)
        frames.append((0, 0, 10, 8, idx, None))
        stats.append(frame_stats(10, 8, idx, pal8))
    VIDEO_FIXTURES.append(("gif_anim.gif",
                           gif_bytes(10, 8, pal8, frames), stats))
    # 2. single frame, 4-color table, comment extension, no GCE, 87a
    pal4 = palette(4, salt=3)
    idx = frame_indices(7, 5, 0, 4)
    VIDEO_FIXTURES.append(("gif_single.gif",
                           gif_bytes(7, 5, pal4, [(0, 0, 7, 5, idx, None)],
                                     with_gce=False, comment=b"graft fixture",
                                     version=b"87a"),
                           [frame_stats(7, 5, idx, pal4)]))
    # 3. 3 frames at offset (1,1), 5x4, middle frame has its own LCT
    gct = palette(8, salt=1)
    lct = palette(8, salt=5)
    frames, stats = [], []
    for f in range(3):
        idx = frame_indices(5, 4, f, 8)
        use = lct if f == 1 else None
        frames.append((1, 1, 5, 4, idx, use))
        stats.append(frame_stats(5, 4, idx, lct if f == 1 else gct))
    VIDEO_FIXTURES.append(("gif_lct.gif",
                           gif_bytes(6, 6, gct, frames), stats))
    # 4. 5 frames, 16-color table, 12x3 — pushes LZW code width growth
    pal16 = palette(16, salt=7)
    frames, stats = [], []
    for f in range(5):
        idx = frame_indices(12, 3, f, 16)
        frames.append((0, 0, 12, 3, idx, None))
        stats.append(frame_stats(12, 3, idx, pal16))
    VIDEO_FIXTURES.append(("gif_wide.gif",
                           gif_bytes(12, 3, pal16, frames), stats))

# ==================== LZW self-check (decoder) ====================
# Independent spec-derived decoder (prefix/suffix tables, KwKwK case,
# early width change) used to assert every emitted GIF stream round-trips
# to its raw index pattern — an encoder bug cannot reach the fixtures.

def lzw_decode(data, min_code_size):
    clear = 1 << min_code_size
    end = clear + 1
    bitpos = 0
    nbits = len(data) * 8

    def read(width):
        nonlocal bitpos
        if bitpos + width > nbits:
            raise ValueError("truncated")
        v = 0
        for j in range(width):
            v |= ((data[(bitpos + j) >> 3] >> ((bitpos + j) & 7)) & 1) << j
        bitpos += width
        return v

    prefix = [0] * 4096
    suffix = [0] * 4096
    width = min_code_size + 1
    nxt = end + 1
    prev = -1
    out = []

    def expand(c):
        seq = []
        while c >= clear:
            seq.append(suffix[c])
            c = prefix[c]
        seq.append(c)
        return seq[::-1]

    while True:
        code = read(width)
        if code == clear:
            width = min_code_size + 1
            nxt = end + 1
            prev = -1
            continue
        if code == end:
            return out
        if prev == -1:
            if code >= clear:
                raise ValueError("bad first code")
            out.append(code)
            prev = code
            continue
        if code < nxt:
            seq = expand(code)
        elif code == nxt:
            seq = expand(prev)
            seq = seq + [seq[0]]
        else:
            raise ValueError("code gap")
        out.extend(seq)
        if nxt < 4096:
            prefix[nxt] = prev
            suffix[nxt] = seq[0]
            nxt += 1
            # the decoder lags the encoder by one entry, so it bumps the
            # width one entry EARLY to stay bit-aligned (giflib pairing)
            if nxt == (1 << width) - 1 and width < 12:
                width += 1
        prev = code

def selfcheck_gifs():
    for name, _, _ in VIDEO_FIXTURES:
        pass  # stats already raw-pattern derived; check the streams below
    checks = [
        (10, 8, 4, 8, 0), (7, 5, 1, 4, 3), (5, 4, 3, 8, 1), (12, 3, 5, 16, 7)]
    for (w, h, nf, npal, _salt) in checks:
        for f in range(nf):
            idx = frame_indices(w, h, f, npal)
            mcs = max(2, int(math.log2(npal)))
            enc = lzw_encode(idx, mcs)
            dec = lzw_decode(enc, mcs)
            assert dec == idx, f"LZW round-trip failed {w}x{h} f={f}"
    print("LZW self-check: all frame streams round-trip")

# =========================== main ===========================

def main():
    os.makedirs(OUT, exist_ok=True)
    build_audio()
    build_video()
    selfcheck_gifs()
    for name, data, _ in AUDIO_FIXTURES:
        with open(os.path.join(OUT, name), "wb") as fh:
            fh.write(data)
        print(f"wrote {name}: {len(data)} bytes")
    for name, data, _ in VIDEO_FIXTURES:
        with open(os.path.join(OUT, name), "wb") as fh:
            fh.write(data)
        print(f"wrote {name}: {len(data)} bytes")

    print("\n--- q_media_audio expected (doc_id = -(100+pos+1)) ---")
    for pos, (name, _, st) in enumerate(AUDIO_FIXTURES):
        did = -(101 + pos)
        print(f"  ({did}, {st['sample_rate']}, {st['channels']}, {st['bits']}, "
              f"{st['n_frames']}, {st['duration_ms']!r}, {st['rms']!r}, "
              f"{st['peak']!r}, {st['zero_cross']}),  -- {name}")

    print("\n--- q_media_video expected (doc_id = -(200+pos+1), n=3 sampled) ---")
    for pos, (name, _, stats) in enumerate(VIDEO_FIXTURES):
        did = -(201 + pos)
        sel = sample_positions(len(stats), 3)
        for ord_i, fi in enumerate(sel):
            st = stats[fi]
            print(f"  ({did}, {ord_i}, {st['width']}, {st['height']}, "
                  f"{st['luma_mean']!r}),  -- {name} file-frame {fi}")

    print("\n--- frame profile (framesAll n=4 real path) ---")
    for pos, (name, _, stats) in enumerate(VIDEO_FIXTURES):
        did = -(201 + pos)
        sel = sample_positions(len(stats), 4)
        st0 = stats[sel[0]]
        print(f"  ({did}, {len(sel)}, {st0['width'] * st0['height'] * 3}),"
              f"  -- {name}")

if __name__ == "__main__":
    main()
