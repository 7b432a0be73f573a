#!/usr/bin/env python3
"""Baseline-JPEG fixtures + expected decode statistics.

Encoder: pure-stdlib baseline sequential JPEG writer (float FDCT, Annex-K
quantization tables, canonical Huffman tables built from the symbols each
scan actually emits — two-pass). Decoder TWIN: an INDEPENDENT Python
implementation of the engine's decode contract — the same hardcoded
fixed-point IDCT basis, descale shift, replication upsample and integer
YCbCr->RGB constants as Multimodal.decodeJpeg — which decodes the encoded
BYTES. The expected statistics therefore pin the engine's full
marker-walk / Huffman / dequant / IDCT / upsample path, and an encoder bug
cannot cancel out (the twin shares no state with the encoder beyond the
file bytes; a round-trip self-check on dimensions and plausibility of the
reconstruction error guards the committed fixtures).

Coverage:
  - jpeg_grey.jpg : 8x8 greyscale, single component;
  - jpeg_444.jpg  : 16x8 YCbCr 4:4:4 (two MCUs);
  - jpeg_420.jpg  : 18x10 YCbCr 4:2:0 (MCU padding + chroma replication
                    upsample + right/bottom edge clipping);
  - jpeg_rst.jpg  : 24x8 YCbCr 4:4:4 with DRI=1 (a restart marker between
                    every MCU, cycling RST0..).

Run from the repo root:  python3 tools/make_jpeg_fixtures.py
Writes src/main/resources/graft/fixtures/ and prints the expected-value
rows for SparkEntry.oracleSql / MultimodalSpec.
"""
import math, os

OUT = "src/main/resources/graft/fixtures"

# ---- fixed-point IDCT basis: MUST equal Multimodal.JpegCos ----
JCOS = [
    [1448, 2009, 1892, 1703, 1448, 1138, 784, 400],
    [1448, 1703, 784, -400, -1448, -2009, -1892, -1138],
    [1448, 1138, -784, -2009, -1448, 400, 1892, 1703],
    [1448, 400, -1892, -1138, 1448, 1703, -784, -2009],
    [1448, -400, -1892, 1138, 1448, -1703, -784, 2009],
    [1448, -1138, -784, 2009, -1448, -400, 1892, -1703],
    [1448, -1703, 784, 400, -1448, 2009, -1892, 1138],
    [1448, -2009, 1892, -1703, 1448, -1138, 784, -400]]

ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# Annex K quantization tables (natural row-major order)
QY = [16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99]
QC = [17, 18, 24, 47, 99, 99, 99, 99,
      18, 21, 26, 66, 99, 99, 99, 99,
      24, 26, 56, 99, 99, 99, 99, 99,
      47, 66, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99]

# ---------------- deterministic source patterns ----------------

def pat_grey(x, y):
    return (int(127 + 100 * math.sin(x * 0.7) * math.cos(y * 0.5)) % 256,)

def pat_rgb(x, y):
    return ((x * 37 + y * 101) % 256, (x * 59 + y * 13) % 256,
            (x * 83 + y * 29) % 256)

# ---------------- encoder ----------------

def fdct_quant(block, q):
    """block: 64 samples (level-shifted later); returns 64 quantized coefs
    in NATURAL order."""
    out = [0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (block[y * 8 + x] - 128) * \
                        math.cos((2 * x + 1) * u * math.pi / 16) * \
                        math.cos((2 * y + 1) * v * math.pi / 16)
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            f = s * cu * cv / 4.0
            qq = q[v * 8 + u]
            out[v * 8 + u] = int(math.floor(f / qq + 0.5)) if f >= 0 \
                else -int(math.floor(-f / qq + 0.5))
    return out

def mag_cat(v):
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t

def block_symbols(coefs, pred):
    """(dc_symbol, dc_bits), [(ac_symbol, ac_bits)...], new_pred — coefs in
    natural order."""
    dc = coefs[0]
    diff = dc - pred
    t = mag_cat(diff)
    dcb = (diff if diff >= 0 else diff + (1 << t) - 1, t)
    acs = []
    run = 0
    zzc = [coefs[ZZ[i]] for i in range(64)]
    last = 63
    while last > 0 and zzc[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = zzc[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        s = mag_cat(v)
        acs.append(((run << 4) | s, (v if v >= 0 else v + (1 << s) - 1, s)))
        run = 0
    if last < 63:
        acs.append((0x00, (0, 0)))  # EOB
    return (t, dcb), acs, dc

def build_huff(symbols):
    """Canonical table holding every symbol at code length 8 (valid as long
    as <= 255 symbols; the all-ones code stays unused because counts<=254
    here). Returns (bits[16], vals, {sym: (code, len)})."""
    vals = sorted(set(symbols))
    assert len(vals) <= 254, "too many symbols for the flat-8 table"
    bits = [0] * 16
    bits[7] = len(vals)  # all codes at length 8
    enc = {s: (i, 8) for i, s in enumerate(vals)}
    return bits, vals, enc

class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1s

def seg(marker, payload):
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

def subsample(plane, w, h):
    """2x2 box average (floor), edge-replicated for odd dims."""
    cw, ch = (w + 1) // 2, (h + 1) // 2
    out = []
    for y in range(ch):
        for x in range(cw):
            acc = 0
            for dy in range(2):
                for dx in range(2):
                    sx = min(2 * x + dx, w - 1)
                    sy = min(2 * y + dy, h - 1)
                    acc += plane[sy * w + sx]
            out.append(acc // 4)
    return out, cw, ch

def plane_blocks(plane, w, h, bw, bh):
    """Split into 8x8 blocks over a (bw*8, bh*8) edge-padded canvas."""
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = []
            for y in range(8):
                for x in range(8):
                    sx = min(bx * 8 + x, w - 1)
                    sy = min(by * 8 + y, h - 1)
                    blk.append(plane[sy * w + sx])
            blocks.append(blk)
    return blocks

def _jpeg_plan(w, h, pat, color, sub420=False):
    """Shared front half of both encoders: component planes, geometry and
    quantized coefficient blocks (interleaved-grid order)."""
    if color:
        yp, cbp, crp = [], [], []
        for y in range(h):
            for x in range(w):
                r, g, b = pat(x, y)
                yv = (299 * r + 587 * g + 114 * b) // 1000
                yp.append(min(255, max(0, yv)))
                cbp.append(min(255, max(0, 128 + (b - yv) * 564 // 1000)))
                crp.append(min(255, max(0, 128 + (r - yv) * 713 // 1000)))
        if sub420:
            comps = [(1, (2, 2), 0, yp, w, h)]
            for cp in (cbp, crp):
                sp, cw, ch = subsample(cp, w, h)
                comps.append((len(comps) + 1, (1, 1), 1, sp, cw, ch))
        else:
            comps = [(1, (1, 1), 0, yp, w, h),
                     (2, (1, 1), 1, cbp, w, h), (3, (1, 1), 1, crp, w, h)]
    else:
        comps = [(1, (1, 1), 0, [pat(x, y)[0] for y in range(h)
                                 for x in range(w)], w, h)]
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    qts = {0: QY, 1: QC} if color else {0: QY}
    comp_blocks = []
    for cid, (ch_, cv), tq, plane, pw, ph in comps:
        bw, bh = mcus_x * ch_, mcus_y * cv
        raw = plane_blocks(plane, pw, ph, bw, bh)
        comp_blocks.append([fdct_quant(b, qts[tq]) for b in raw])
    return comps, comp_blocks, mcus_x, mcus_y, qts


def encode_jpeg(w, h, pat, color, sub420=False, dri=0):
    """Returns the encoded bytes."""
    comps, comp_blocks, mcus_x, mcus_y, qts = \
        _jpeg_plan(w, h, pat, color, sub420)

    def mcu_stream():
        """Yields (comp_ix, block) in interleaved scan order, with restart
        boundaries flagged."""
        for mcu in range(mcus_x * mcus_y):
            mx, my = mcu % mcus_x, mcu // mcus_x
            for ci, (cid, (ch_, cv), tq, _, _, _) in enumerate(comps):
                bw = mcus_x * ch_
                for by in range(cv):
                    for bx in range(ch_):
                        ix = (my * cv + by) * bw + mx * ch_ + bx
                        yield mcu, ci, comp_blocks[ci][ix]

    # pass 1: symbol collection (restart-aware DC prediction)
    dc_syms = [[] for _ in comps]
    ac_syms = [[] for _ in comps]
    preds = [0] * len(comps)
    last_mcu = -1
    for mcu, ci, blk in mcu_stream():
        if dri and mcu != last_mcu and mcu > 0 and mcu % dri == 0 \
                and ci == 0:
            preds = [0] * len(comps)
        last_mcu = mcu
        (t, _), acs, dc = block_symbols(blk, preds[ci])
        preds[ci] = dc
        dc_syms[ci].append(t)
        ac_syms[ci].extend(s for s, _ in acs)
    # luma tables = component 0; chroma tables shared by components 1,2
    def tbl_for(ci):
        return 0 if ci == 0 else 1
    dc_tbl, ac_tbl = {}, {}
    for tid in {tbl_for(ci) for ci in range(len(comps))}:
        dsy = [s for ci in range(len(comps)) if tbl_for(ci) == tid
               for s in dc_syms[ci]]
        asy = [s for ci in range(len(comps)) if tbl_for(ci) == tid
               for s in ac_syms[ci]]
        dc_tbl[tid] = build_huff(dsy)
        ac_tbl[tid] = build_huff(asy)

    out = bytearray([0xFF, 0xD8])  # SOI
    for tq, q in qts.items():
        zzq = bytes([q[ZZ[i]] for i in range(64)])
        out += seg(0xDB, bytes([tq]) + zzq)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + \
        bytes([len(comps)])
    for cid, (ch_, cv), tq, _, _, _ in comps:
        sof += bytes([cid, (ch_ << 4) | cv, tq])
    out += seg(0xC0, sof)
    for tid, (bits, vals, _) in dc_tbl.items():
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    for tid, (bits, vals, _) in ac_tbl.items():
        out += seg(0xC4, bytes([0x10 | tid]) + bytes(bits) + bytes(vals))
    if dri:
        out += seg(0xDD, dri.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for ci, (cid, _, _, _, _, _) in enumerate(comps):
        tid = tbl_for(ci)
        sos += bytes([cid, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    # pass 2: entropy-coded data
    bw_ = BitWriter()
    preds = [0] * len(comps)
    rst = 0
    last_mcu = 0
    for mcu, ci, blk in mcu_stream():
        if dri and mcu > 0 and mcu % dri == 0 and mcu != last_mcu:
            bw_.flush()
            bw_.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = [0] * len(comps)
        last_mcu = mcu
        tid = tbl_for(ci)
        (t, (dbits, dlen)), acs, dc = block_symbols(blk, preds[ci])
        preds[ci] = dc
        code, ln = dc_tbl[tid][2][t]
        bw_.put(code, ln)
        if dlen:
            bw_.put(dbits, dlen)
        for sym, (abits, alen) in acs:
            code, ln = ac_tbl[tid][2][sym]
            bw_.put(code, ln)
            if alen:
                bw_.put(abits, alen)
    bw_.flush()
    out += bw_.out
    out += bytes([0xFF, 0xD9])  # EOI
    return bytes(out)

# ---------------- progressive encoder (round 9b) ----------------
#
# Emits a spec-complete progressive stream (ITU-T T.81 Annex G, Huffman):
# interleaved DC first scan with successive-approximation point transform,
# raw-bit DC refinement, per-component spectral-selection AC first scans
# with EOB-run coding, and AC refinement scans (correction bits buffered
# across EOB runs, libjpeg jcphuff-style). Each scan two-passes: collect
# symbol events, build its flat-8 canonical table, then serialize.

def _prog_events_dc_first(comps, comp_blocks, mcus_x, mcus_y, scomps, al):
    evs = []
    preds = [0] * len(comps)
    for mcu in range(mcus_x * mcus_y):
        mx, my = mcu % mcus_x, mcu // mcus_x
        for ci in scomps:
            cid, (ch_, cv), tq, _, _, _ = comps[ci]
            bw = mcus_x * ch_
            for by in range(cv):
                for bx in range(ch_):
                    ix = (my * cv + by) * bw + mx * ch_ + bx
                    val = comp_blocks[ci][ix][0] >> al  # arithmetic shift
                    diff = val - preds[ci]
                    preds[ci] = val
                    t = mag_cat(diff)
                    evs.append(("sym", ci, t))
                    if t:
                        evs.append(("bits",
                                    diff if diff >= 0 else diff + (1 << t) - 1,
                                    t))
    return evs

def _prog_events_dc_refine(comps, comp_blocks, mcus_x, mcus_y, scomps, al):
    evs = []
    for mcu in range(mcus_x * mcus_y):
        mx, my = mcu % mcus_x, mcu // mcus_x
        for ci in scomps:
            cid, (ch_, cv), tq, _, _, _ = comps[ci]
            bw = mcus_x * ch_
            for by in range(cv):
                for bx in range(ch_):
                    ix = (my * cv + by) * bw + mx * ch_ + bx
                    evs.append(("bits", (comp_blocks[ci][ix][0] >> al) & 1, 1))
    return evs

def _ni_grid(comps, mcus_x, mcus_y, ci):
    """Non-interleaved block grid: ceil(compDim/8), NOT the MCU-padded
    interleaved grid — the classic progressive-geometry trap."""
    _, (ch_, cv), _, _, pw, ph = comps[ci]
    return (pw + 7) // 8, (ph + 7) // 8, mcus_x * ch_

def _prog_events_ac_first(comps, comp_blocks, mcus_x, mcus_y, ci, ss, se, al):
    evs = []
    state = {"eobrun": 0}

    def flush_eobrun():
        n = state["eobrun"]
        if n:
            r = n.bit_length() - 1
            evs.append(("sym", ci, r << 4))
            if r:
                evs.append(("bits", n - (1 << r), r))
            state["eobrun"] = 0

    bw_ni, bh_ni, bw_full = _ni_grid(comps, mcus_x, mcus_y, ci)
    for by in range(bh_ni):
        for bx in range(bw_ni):
            zzc = [comp_blocks[ci][by * bw_full + bx][ZZ[k]] for k in range(64)]
            run = 0
            any_val = False
            for k in range(ss, se + 1):
                v = zzc[k]
                vv = (abs(v) >> al) * (1 if v >= 0 else -1)
                if vv == 0:
                    run += 1
                    continue
                flush_eobrun()
                while run > 15:
                    evs.append(("sym", ci, 0xF0))
                    run -= 16
                s = mag_cat(vv)
                evs.append(("sym", ci, (run << 4) | s))
                evs.append(("bits", vv if vv >= 0 else vv + (1 << s) - 1, s))
                run = 0
                any_val = True
            if run > 0 or not any_val:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    flush_eobrun()
    flush_eobrun()
    return evs

def _prog_events_ac_refine(comps, comp_blocks, mcus_x, mcus_y, ci, ss, se, al):
    evs = []
    state = {"eobrun": 0, "pending": []}

    def flush_eobrun():
        n = state["eobrun"]
        if n:
            r = n.bit_length() - 1
            evs.append(("sym", ci, r << 4))
            if r:
                evs.append(("bits", n - (1 << r), r))
        if n or state["pending"]:
            for b in state["pending"]:
                evs.append(("bits", b, 1))
            state["pending"] = []
        state["eobrun"] = 0

    bw_ni, bh_ni, bw_full = _ni_grid(comps, mcus_x, mcus_y, ci)
    for by in range(bh_ni):
        for bx in range(bw_ni):
            zzc = [comp_blocks[ci][by * bw_full + bx][ZZ[k]] for k in range(64)]
            absv = [abs(zzc[k]) >> al for k in range(ss, se + 1)]
            run = 0
            br = []
            for i, k in enumerate(range(ss, se + 1)):
                t = absv[i]
                if t == 0:
                    run += 1
                    continue
                # ANY nonzero (history or new) first drains overlong runs —
                # libjpeg jcphuff order; the decoder's ZRL advance consumes
                # the buffered correction bits positionally
                while run > 15:
                    flush_eobrun()
                    evs.append(("sym", ci, 0xF0))
                    for b in br:
                        evs.append(("bits", b, 1))
                    br = []
                    run -= 16
                if t > 1:  # history-nonzero: correction bit, transparent to runs
                    br.append((abs(zzc[k]) >> al) & 1)
                    continue
                # newly nonzero at this bit position
                flush_eobrun()
                evs.append(("sym", ci, (run << 4) | 1))
                evs.append(("bits", 1 if zzc[k] >= 0 else 0, 1))
                for b in br:
                    evs.append(("bits", b, 1))
                br = []
                run = 0
            if run > 0 or br:
                state["eobrun"] += 1
                state["pending"].extend(br)
                if state["eobrun"] == 0x7FFF:
                    flush_eobrun()
    flush_eobrun()
    return evs

def encode_jpeg_progressive(w, h, pat, color, sub420=False, scans=None):
    comps, comp_blocks, mcus_x, mcus_y, qts = \
        _jpeg_plan(w, h, pat, color, sub420)
    if scans is None:
        if len(comps) == 1:
            scans = [([0], 0, 0, 0, 1), ([0], 1, 63, 0, 1),
                     ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
        else:
            scans = [([0, 1, 2], 0, 0, 0, 1),
                     ([0], 1, 5, 0, 1), ([2], 1, 63, 0, 1),
                     ([1], 1, 63, 0, 1), ([0], 6, 63, 0, 1),
                     ([0, 1, 2], 0, 0, 1, 0),
                     ([0], 1, 63, 1, 0), ([1], 1, 63, 1, 0),
                     ([2], 1, 63, 1, 0)]
    out = bytearray([0xFF, 0xD8])
    for tq, q in qts.items():
        zzq = bytes([q[ZZ[i]] for i in range(64)])
        out += seg(0xDB, bytes([tq]) + zzq)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + \
        bytes([len(comps)])
    for cid, (ch_, cv), tq, _, _, _ in comps:
        sof += bytes([cid, (ch_ << 4) | cv, tq])
    out += seg(0xC2, sof)  # SOF2: progressive DCT, Huffman
    for scomps, ss, se, ah, al in scans:
        dc_scan = ss == 0
        refine = ah != 0
        if dc_scan:
            if refine:
                evs = _prog_events_dc_refine(comps, comp_blocks, mcus_x,
                                             mcus_y, scomps, al)
            else:
                evs = _prog_events_dc_first(comps, comp_blocks, mcus_x,
                                            mcus_y, scomps, al)
        else:
            assert len(scomps) == 1
            if refine:
                evs = _prog_events_ac_refine(comps, comp_blocks, mcus_x,
                                             mcus_y, scomps[0], ss, se, al)
            else:
                evs = _prog_events_ac_first(comps, comp_blocks, mcus_x,
                                            mcus_y, scomps[0], ss, se, al)
        # per-scan tables: Y -> id 0, chroma -> id 1 (DHT before each scan,
        # re-definition between scans is spec'd and exercises the decoder)
        tids = sorted({0 if ci == 0 else 1 for ci in scomps})
        tbls = {}
        if not (dc_scan and refine):  # DC refinement is raw bits only
            for tid in tids:
                syms = [e[2] for e in evs if e[0] == "sym" and
                        (0 if e[1] == 0 else 1) == tid]
                tbls[tid] = build_huff(syms) if syms else build_huff([0])
                bits, vals, _ = tbls[tid]
                cls = 0x00 if dc_scan else 0x10
                out += seg(0xC4, bytes([cls | tid]) + bytes(bits) + bytes(vals))
        sos = bytes([len(scomps)])
        for ci in scomps:
            cid = comps[ci][0]
            tid = 0 if ci == 0 else 1
            # DC scans bind Td (upper nibble), AC scans Ta (lower)
            sos += bytes([cid, (tid << 4) if dc_scan else tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        bw_ = BitWriter()
        for e in evs:
            if e[0] == "sym":
                _, ci, s = e
                tid = 0 if ci == 0 else 1
                code, ln = tbls[tid][2][s]
                bw_.put(code, ln)
            else:
                _, v, n = e
                if n:
                    bw_.put(v, n)
        bw_.flush()
        out += bw_.out
    out += bytes([0xFF, 0xD9])
    return bytes(out)

# ---------------- decoder twin (mirrors Multimodal.decodeJpeg) ----------------

class Bits:
    def __init__(self, p, pos):
        self.p = p
        self.pos = pos
        self.cur = 0
        self.n = 0

    def bit(self):
        if self.n == 0:
            b = self.p[self.pos]
            self.pos += 1
            if b == 0xFF:
                m = self.p[self.pos]
                if m == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("marker in entropy data")
            self.cur = b
            self.n = 8
        self.n -= 1
        return (self.cur >> self.n) & 1

    def receive(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self, n):
        self.n = 0
        assert self.p[self.pos] == 0xFF and self.p[self.pos + 1] == 0xD0 + n
        self.pos += 2

class Huff:
    def __init__(self, counts, vals):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for l in range(1, 17):
            self.valptr[l] = k
            self.mincode[l] = code
            code += counts[l - 1]
            k += counts[l - 1]
            self.maxcode[l] = code - 1 if counts[l - 1] > 0 else -1
            code <<= 1

    def decode(self, br):
        code = 0
        for l in range(1, 17):
            code = (code << 1) | br.bit()
            if self.maxcode[l] >= 0 and code <= self.maxcode[l]:
                return self.vals[self.valptr[l] + code - self.mincode[l]]
        raise ValueError("bad huffman code")

def extend(v, t):
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v

def _scan_units(comps, scomps, mcus_x, mcus_y, interleaved):
    """Yield (unit_ix, comp_ix, block_ix) in scan order. Interleaved scans
    walk MCUs over the padded grid; non-interleaved scans walk the
    component's OWN ceil(dim/8) grid (no MCU padding) in raster order —
    the classic progressive-geometry trap. block_ix indexes the padded
    interleaved grid either way."""
    if interleaved:
        for mcu in range(mcus_x * mcus_y):
            mx, my = mcu % mcus_x, mcu // mcus_x
            for ci in scomps:
                c = comps[ci]
                bw = mcus_x * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        yield mcu, ci, (my * c["v"] + by) * bw + mx * c["h"] + bx
    else:
        ci = scomps[0]
        c = comps[ci]
        bw = mcus_x * c["h"]
        bw_ni = (c["pw"] + 7) // 8
        bh_ni = (c["ph"] + 7) // 8
        i = 0
        for by in range(bh_ni):
            for bx in range(bw_ni):
                yield i, ci, by * bw + bx
                i += 1

def _decode_scan(p, at, comps, scomps, ss, se, ah, al, dri, dch, ach, coef,
                 mcus_x, mcus_y, prog):
    """Decode one entropy-coded scan into the per-component RAW coefficient
    stores; returns the byte position of the next marker."""
    br = Bits(p, at)
    preds = {ci: 0 for ci in scomps}
    eobrun = 0
    rst = 0
    last_unit = 0
    interleaved = len(scomps) > 1 or not prog
    for unit, ci, ix in _scan_units(comps, scomps, mcus_x, mcus_y, interleaved):
        if dri and unit > 0 and unit != last_unit and unit % dri == 0:
            br.restart(rst)
            rst = (rst + 1) & 7
            preds = {k: 0 for k in preds}
            eobrun = 0
        last_unit = unit
        blk = coef[ci][ix]
        c = comps[ci]
        if not prog:
            t = dch[c["dc"]].decode(br)
            preds[ci] += extend(br.receive(t), t)
            blk[0] = preds[ci]
            k = 1
            while k < 64:
                rs = ach[c["ac"]].decode(br)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break
                k += r
                blk[ZZ[k]] = extend(br.receive(s), s)
                k += 1
        elif ss == 0:
            if ah == 0:  # DC first: point transform is an arithmetic shift
                t = dch[c["dc"]].decode(br)
                preds[ci] += extend(br.receive(t), t)
                blk[0] = preds[ci] << al
            else:        # DC refinement: one raw bit per block
                if br.bit():
                    blk[0] |= 1 << al
        elif ah == 0:    # AC first scan (band ss..se) with EOB-run coding
            if eobrun > 0:
                eobrun -= 1
            else:
                k = ss
                while k <= se:
                    rs = ach[c["ac"]].decode(br)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.receive(r)
                        break
                    k += r
                    blk[ZZ[k]] = extend(br.receive(s), s) << al
                    k += 1
        else:            # AC refinement (jdphuff shape)
            p1, m1 = 1 << al, -(1 << al)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = ach[c["ac"]].decode(br)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s:
                        newval = p1 if br.bit() else m1
                    else:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.receive(r)
                            break
                    # advance over r zero-history coefs, reading correction
                    # bits at every nonzero-history coef passed over
                    while k <= se:
                        z = ZZ[k]
                        if blk[z] != 0:
                            if br.bit() and (blk[z] & p1) == 0:
                                blk[z] += p1 if blk[z] >= 0 else m1
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if newval:
                        blk[ZZ[k]] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:  # correction bits through the band remainder
                    z = ZZ[k]
                    if blk[z] != 0:
                        if br.bit() and (blk[z] & p1) == 0:
                            blk[z] += p1 if blk[z] >= 0 else m1
                    k += 1
                eobrun -= 1
    pos = br.pos
    while pos + 1 < len(p) and not (p[pos] == 0xFF and p[pos + 1] != 0x00):
        pos += 1
    return pos

def decode_jpeg(p):
    """Multi-scan twin: baseline (SOF0/1) and progressive (SOF2) decode
    through one RAW-coefficient store, dequantized at IDCT time."""
    assert p[0] == 0xFF and p[1] == 0xD8
    qt = [None] * 4
    dch = [None] * 4
    ach = [None] * 4
    comps = None
    width = height = 0
    dri = 0
    prog = False
    coef = None
    mcus_x = mcus_y = 0
    pos = 2
    while True:
        assert p[pos] == 0xFF, hex(p[pos])
        m = p[pos + 1]
        if m == 0xD8 or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xD9:
            break
        ln = (p[pos + 2] << 8) | p[pos + 3]
        body = pos + 4
        if m == 0xDB:
            o = body
            while o < body + ln - 2:
                pq, tq = p[o] >> 4, p[o] & 0x0F
                t = [0] * 64
                for i in range(64):
                    t[ZZ[i]] = p[o + 1 + i] if pq == 0 else \
                        (p[o + 1 + 2 * i] << 8) | p[o + 2 + 2 * i]
                qt[tq] = t
                o += 1 + (64 if pq == 0 else 128)
        elif m == 0xC4:
            o = body
            while o < body + ln - 2:
                tc, th = p[o] >> 4, p[o] & 0x0F
                counts = [p[o + 1 + i] for i in range(16)]
                n = sum(counts)
                vals = [p[o + 17 + i] for i in range(n)]
                h_ = Huff(counts, vals)
                if tc == 0:
                    dch[th] = h_
                else:
                    ach[th] = h_
                o += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):
            prog = m == 0xC2
            assert p[body] == 8
            height = (p[body + 1] << 8) | p[body + 2]
            width = (p[body + 3] << 8) | p[body + 4]
            nc = p[body + 5]
            comps = []
            for i in range(nc):
                o = body + 6 + 3 * i
                comps.append({"id": p[o], "h": p[o + 1] >> 4,
                              "v": p[o + 1] & 0x0F, "tq": p[o + 2],
                              "dc": 0, "ac": 0})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["pw"] = (width * c["h"] + hmax - 1) // hmax
                c["ph"] = (height * c["v"] + vmax - 1) // vmax
            coef = [[[0] * 64 for _ in range(mcus_x * c["h"] *
                                            mcus_y * c["v"])]
                    for c in comps]
        elif m == 0xDD:
            dri = (p[body] << 8) | p[body + 1]
        elif m == 0xDA:
            ns = p[body]
            scomps = []
            for i in range(ns):
                cid = p[body + 1 + 2 * i]
                tt = p[body + 2 + 2 * i]
                ci = next(j for j, c in enumerate(comps) if c["id"] == cid)
                comps[ci]["dc"] = tt >> 4
                comps[ci]["ac"] = tt & 0x0F
                scomps.append(ci)
            ss = p[body + 1 + 2 * ns]
            se = p[body + 2 + 2 * ns]
            ah = p[body + 3 + 2 * ns] >> 4
            al = p[body + 3 + 2 * ns] & 0x0F
            pos = _decode_scan(p, body + 4 + 2 * ns, comps, scomps, ss, se,
                               ah, al, dri, dch, ach, coef, mcus_x, mcus_y,
                               prog)
            continue
        pos = body + ln - 2
    # dequantize + fixed-point IDCT + assemble (identical arithmetic to the
    # single-scan twin this replaces, and to Multimodal.decodeJpeg)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    pw = [mcus_x * c["h"] * 8 for c in comps]
    ph = [mcus_y * c["v"] * 8 for c in comps]
    planes = [[0] * (pw[i] * ph[i]) for i in range(len(comps))]
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        bw = mcus_x * c["h"]
        for bix, blk in enumerate(coef[ci]):
            bx, by = bix % bw, bix // bw
            dq = [blk[v] * q[v] for v in range(64)]
            px0, py0 = bx * 8, by * 8
            for yy in range(8):
                for xx in range(8):
                    acc = 0
                    for v in range(64):
                        f = dq[v]
                        if f:
                            acc += f * JCOS[xx][v & 7] * JCOS[yy][v >> 3]
                    s_ = ((acc + (1 << 23)) >> 24) + 128
                    planes[ci][(py0 + yy) * pw[ci] + px0 + xx] = \
                        min(255, max(0, s_))
    if len(comps) == 1:
        px = [planes[0][y * pw[0] + x]
              for y in range(height) for x in range(width)]
        return width, height, 1, px
    out = []
    for y in range(height):
        for x in range(width):
            def sample(ci):
                c = comps[ci]
                return planes[ci][(y * c["v"] // vmax) * pw[ci] +
                                  (x * c["h"] // hmax)]
            yv = sample(0)
            cb = sample(1) - 128
            cr = sample(2) - 128
            out.append(min(255, max(0, yv + ((91881 * cr + 32768) >> 16))))
            out.append(min(255, max(0,
                yv - ((22554 * cb + 46802 * cr + 32768) >> 16))))
            out.append(min(255, max(0, yv + ((116130 * cb + 32768) >> 16))))
    return width, height, 3, out


# ---------------- statistics (same arithmetic as the engine) ----------------

def luma_of(px, ch, i):
    if ch <= 2:
        return px[i * ch]
    o = i * ch
    return (299 * px[o] + 587 * px[o + 1] + 114 * px[o + 2]) // 1000

def stats(w, h, ch, px):
    n = w * h
    lumas = [luma_of(px, ch, i) for i in range(n)]
    hist = [0] * 8
    for l in lumas:
        hist[l >> 5] += 1
    feat = [c / n for c in hist]
    return sum(lumas) / n, sum(f * f for f in feat) ** 0.5

def resize_stats(w, h, ch, px, tw, th):
    lumas = []
    for y in range(th):
        for x in range(tw):
            sx, sy = x * w // tw, y * h // th
            lumas.append(luma_of(px, ch, sy * w + sx))
    return sum(lumas) / len(lumas)

FIXTURES = [
    ("jpeg_grey.jpg", lambda: encode_jpeg(8, 8, pat_grey, color=False)),
    ("jpeg_444.jpg", lambda: encode_jpeg(16, 8, pat_rgb, color=True)),
    ("jpeg_420.jpg",
     lambda: encode_jpeg(18, 10, pat_rgb, color=True, sub420=True)),
    ("jpeg_rst.jpg",
     lambda: encode_jpeg(24, 8, pat_rgb, color=True, dri=1)),
]

BASE_ID = 13  # continues the make_fixtures.py catalog (-1..-13)

# Progressive fixtures (round 9b): doc_ids continue after make_fixtures.py's
# FIXTURES2 block (-18..-24), so base 24 -> -25..-27. The grey script is the
# minimal 4-scan DC/AC first+refine; the color scripts add spectral-band
# splits, per-component AC scans and (420) the non-interleaved geometry trap.
BASE_ID_PROG = 24
FIXTURES_PROG = [
    ("jpeg_prog_grey.jpg",
     lambda: encode_jpeg_progressive(8, 8, pat_grey, color=False)),
    ("jpeg_prog444.jpg",
     lambda: encode_jpeg_progressive(16, 8, pat_rgb, color=True)),
    ("jpeg_prog420.jpg",
     lambda: encode_jpeg_progressive(18, 10, pat_rgb, color=True,
                                     sub420=True)),
]

# progressive transmission is a pure reordering of the same coefficients:
# each progressive fixture must decode (via the twin) pixel-identical to a
# baseline encode of the same pattern — an encoder bug cannot hide
PROG_TWINS = [
    (0, lambda: encode_jpeg(8, 8, pat_grey, color=False)),
    (1, lambda: encode_jpeg(16, 8, pat_rgb, color=True)),
    (2, lambda: encode_jpeg(18, 10, pat_rgb, color=True, sub420=True)),
]

def main():
    os.makedirs(OUT, exist_ok=True)
    for ix, benc in PROG_TWINS:
        name, penc = FIXTURES_PROG[ix]
        assert decode_jpeg(penc()) == decode_jpeg(benc()), \
            f"{name} != its baseline twin"
    print("-- JPEG fixture expected values (decoder-twin replay) --")
    rows = []
    ids = [-(BASE_ID + i + 1) for i in range(len(FIXTURES))] + \
          [-(BASE_ID_PROG + i + 1) for i in range(len(FIXTURES_PROG))]
    for did, (name, enc) in zip(ids, FIXTURES + FIXTURES_PROG):
        data = enc()
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        w, h, ch, px = decode_jpeg(data)
        luma, norm = stats(w, h, ch, px)
        rl = resize_stats(w, h, ch, px, 3, 2)
        rows.append((name, did, w, h, ch, luma, norm, rl, len(data)))
        print(f"{name}: doc_id={did} bytes={len(data)} w={w} h={h} ch={ch} "
              f"luma_mean={luma!r} feature_norm={norm!r} resize_luma={rl!r}")
    print("-- q_media_pixels VALUES rows --")
    for name, did, w, h, ch, luma, norm, rl, _ in rows:
        print(f"           ({did}, {w}, {h}, {ch}, {luma!r}, {norm!r}),")
    print("-- q_media_features VALUES rows --")
    for name, did, w, h, ch, luma, norm, rl, _ in rows:
        print(f"           ({did}, {norm!r}),")
    print("-- q_media_resize VALUES rows --")
    for name, did, w, h, ch, luma, norm, rl, _ in rows:
        print(f"           ({did}, {ch}, {rl!r}),")

if __name__ == "__main__":
    main()
