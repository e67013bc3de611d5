"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT).

Closes the raster-decode breadth gap vs the reference server, which
accepts arbitrary uploaded rasters
(/root/reference/crates/server/src/generation.rs:276-305): JPEG is the
dominant real-world photo format, and this container ships no PIL, so
the decoder is implemented from the public standard.

Decoder scope: baseline + extended-sequential Huffman (SOF0/SOF1) AND
progressive Huffman (SOF2: spectral selection, successive approximation,
multi-scan with interleaved DC / non-interleaved AC scans, EOB runs),
8-bit samples plus 12-bit extended-sequential/progressive (scaled to
the 8-bit RGB output contract), 1- or 3-component (grayscale / JFIF
YCbCr), any integer sampling factors up to 4 (4:4:4, 4:2:2, 4:2:0,
...), restart intervals (DRI/RSTn), 8- or 16-bit-precision DQT,
multiple DHT/DQT segments. Arithmetic coding, lossless, and
hierarchical modes raise ValueError — loud, never a wrong image (same
policy as imagecodec.py).

Encoder scope (fixture generator for tests, not a production encoder):
grayscale or YCbCr with 4:4:4 or 4:2:0 subsampling, Annex-K quantization
tables with a libjpeg-style linear quality scale, optional restart
intervals, and deliberately simple FIXED-length Huffman tables (all 12
DC categories at 4 bits, all 162 AC symbols at 8 bits — a valid prefix
code any conformant decoder accepts; compression ratio is not a goal).
``encode_jpeg_progressive`` emits a 4-phase SOF2 progression (DC first /
DC refine / AC first / AC refine) that transmits every coefficient bit,
so its decode is bit-identical to the baseline encoding's.

Entropy (de)coding walks bits in Python — fine for the small payloads
the multimodal fixtures carry; the DCT/IDCT, color transform, padding
and upsampling are vectorized numpy over all blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# Zigzag scan: index k in scan order -> flat index row*8+col.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (natural row-major order).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Orthonormal 8x8 DCT-II matrix: F = C @ f @ C.T, f = C.T @ F @ C.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = 0.5 * (
            (1.0 / np.sqrt(2.0)) if _k == 0 else 1.0
        ) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial samples."""
    return np.einsum("km,nkl,lj->nmj", _C, coef.astype(np.float64), _C)


def _fdct_blocks(px: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) DCT coefficients."""
    return np.einsum("mk,nkl,jl->nmj", _C, px.astype(np.float64), _C)


# ---------------------------------------------------------------------------
# Huffman machinery (canonical code construction, T.81 Annex C)
# ---------------------------------------------------------------------------

def _build_codes(bits, vals):
    """(bits[1..16] counts, symbol list) -> {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_lut(bits, vals):
    """(counts, symbols) -> (sym, len) flat 16-bit-peek LUTs.

    Decoding peeks 16 bits and indexes two 65536-entry arrays — one
    lookup per Huffman symbol instead of one dict probe per BIT (the
    classic flat-LUT decoder; ~50x over a bitwise walk in Python)."""
    lut_sym = np.full(1 << 16, -1, dtype=np.int16)
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            lut_sym[base : base + span] = vals[k]
            lut_len[base : base + span] = length
            code += 1
            k += 1
        code <<= 1
    return lut_sym, lut_len


# Encoder's fixed-length tables: valid prefix codes covering every
# symbol (no all-ones codes: 12 < 2^4 and 162 < 2^8).
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_ENC_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
# 12-bit variants: DC categories reach 16 (5-bit codes, 16 < 2^5 - 1),
# AC sizes reach 14 (226 symbols at 8 bits, 226 < 2^8 - 1).
_ENC_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_ENC_DC12_VALS = list(range(16))
_ENC_AC12_BITS = [0] * 7 + [226] + [0] * 8
_ENC_AC12_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 15)
]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s per T.81


def _split_scan(data: bytes, pos: int):
    """Entropy-coded data -> (list of UNSTUFFED restart-segment byte
    strings, index of the marker that ended the scan). 0xFF00 -> 0xFF;
    RSTn markers delimit segments; any other marker ends the scan —
    progressive files continue with further DHT/SOS segments there."""
    segs = []
    cur = bytearray()
    n = len(data)
    i = pos
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next segment header
            break
    segs.append(bytes(cur))
    return segs, i


def _bit_windows(seg: bytes) -> np.ndarray:
    """Unstuffed segment bytes -> uint32 array where win[i] is the
    16-bit big-endian window starting at BIT i (3 zero pad bytes give
    the final real bits a full window; valid streams never decode into
    the pad)."""
    bits = np.unpackbits(
        np.frombuffer(seg + b"\x00\x00\x00", dtype=np.uint8)
    ).astype(np.uint32)
    win = np.zeros(bits.size, dtype=np.uint32)
    for k in range(16):
        win[: bits.size - k] |= bits[k:] << (15 - k)
    return win


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB (gray promotes).

    Contract: EVERY failure — unsupported mode, corrupt stream, or a
    truncated segment that would otherwise surface as struct.error /
    IndexError deep in the parser — raises ValueError, so callers
    (DecodeImageMeta) can map it to decode_ok=False instead of crashing
    the Ray task (ADVICE r4 medium)."""
    try:
        return _decode_jpeg_impl(data)
    except ValueError:
        raise
    except Exception as e:  # malformed input, not a refusal
        raise ValueError(
            f"malformed JPEG ({type(e).__name__}: {e})"
        ) from e


def _init_block_grids(frame) -> None:
    """Per-component coefficient grids, MCU geometry, and the
    NON-interleaved block dims (ceil over the component's own sample
    dimensions — single-component scans traverse these in raster order,
    T.81 A.2.2, while interleaved scans traverse the MCU-padded grid)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]  # block columns (MCU-padded grid)
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["pred"] = 0
        cw = -(-w * c["h"] // hmax)  # component sample width
        chh = -(-h * c["v"] // vmax)
        c["bw_ni"] = -(-cw // 8)
        c["bh_ni"] = -(-chh // 8)


def _check_segs(segs, n_units, ri) -> None:
    expected = -(-n_units // ri) if ri else 1
    if len(segs) != expected:
        raise ValueError(
            f"restart-segment count {len(segs)} != expected {expected}"
        )


def _seg_bounds(si, n_units, ri):
    first = si * ri if ri else 0
    last = min(first + ri, n_units) if ri else n_units
    return first, last


def _decode_sequential_scan(
    frame, scan_comps, segs, dc_tables, ac_tables, restart_interval
) -> None:
    """Baseline/extended-sequential scan: interleaved MCUs, DC+AC per
    data unit (the original single-scan decoder, unchanged semantics)."""
    comps = frame["comps"]
    if len(scan_comps) != len(comps):
        raise ValueError(
            "partial-component sequential scan not supported (baseline "
            "decodes one interleaved scan)"
        )
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scan_comps]
    if len(comps) == 1 and (comps[0]["h"], comps[0]["v"]) != (1, 1):
        # legal per T.81, but its single-component scan is NON-interleaved
        # (MCU = one data unit in raster order); decoding it as h*v-block
        # MCUs would silently scramble pixels — refuse instead (ADVICE r4)
        raise ValueError(
            "single-component JPEG with sampling factors >1 uses a "
            "non-interleaved scan (not decoded)"
        )
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    n_mcu = mcux * mcuy
    _check_segs(segs, n_mcu, restart_interval)
    plan = []
    for s, c in zip(scan_comps, order):
        dc_t = dc_tables.get(s["td"])
        ac_t = ac_tables.get(s["ta"])
        if dc_t is None or ac_t is None:
            raise ValueError("missing Huffman table for scan")
        plan.append((c, dc_t, ac_t))

    for si, seg in enumerate(segs):
        win = _bit_windows(seg)
        nbits = len(seg) * 8
        pos = 0
        for c in comps:
            c["pred"] = 0
        first, last = _seg_bounds(si, n_mcu, restart_interval)
        for m in range(first, last):
            my, mx = divmod(m, mcux)
            for c, (dc_sym, dc_len), (ac_sym, ac_len) in plan:
                ch, cv, bw = c["h"], c["v"], c["bw"]
                coef = c["coef"]
                pred = c["pred"]
                for v in range(cv):
                    for hh in range(ch):
                        if pos > nbits:
                            raise ValueError("entropy stream truncated")
                        w16 = int(win[pos])
                        size = int(dc_sym[w16])
                        if size < 0:
                            raise ValueError("invalid DC Huffman code")
                        pos += int(dc_len[w16])
                        if size:
                            mag = int(win[pos]) >> (16 - size)
                            pos += size
                            if mag < (1 << (size - 1)):  # EXTEND
                                mag += 1 - (1 << size)
                            pred += mag
                        blk = coef[(my * cv + v) * bw + (mx * ch + hh)]
                        blk[0] = pred
                        k = 1
                        while k < 64:
                            w16 = int(win[pos])
                            rs = int(ac_sym[w16])
                            if rs < 0:
                                raise ValueError("invalid AC Huffman code")
                            pos += int(ac_len[w16])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63:
                                raise ValueError("AC run past block end")
                            mag = int(win[pos]) >> (16 - size)
                            pos += size
                            if mag < (1 << (size - 1)):
                                mag += 1 - (1 << size)
                            blk[k] = mag
                            k += 1
                c["pred"] = pred
        if pos > nbits + 7:
            raise ValueError("entropy stream overran restart segment")


def _ac_first(blk, win, pos, ss, se, al, sym, ln, eobrun):
    """Progressive AC first scan (Ah=0), one data unit — T.81 G.1.2.2:
    EOBn codes carry a run of all-further-zero blocks."""
    if eobrun > 0:
        return pos, eobrun - 1
    k = ss
    while k <= se:
        w16 = int(win[pos])
        rs = int(sym[w16])
        if rs < 0:
            raise ValueError("invalid AC Huffman code")
        pos += int(ln[w16])
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past spectral end")
            mag = int(win[pos]) >> (16 - s)
            pos += s
            if mag < (1 << (s - 1)):  # EXTEND
                mag += 1 - (1 << s)
            blk[k] = mag << al
            k += 1
        else:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += int(win[pos]) >> (16 - r)
                pos += r
            eobrun -= 1  # this block is part of the run
            break
    return pos, eobrun


def _ac_refine(blk, win, pos, ss, se, al, sym, ln, eobrun):
    """Progressive AC refinement scan (Ah=Al+1), one data unit — T.81
    G.1.2.3 figure G.7: already-nonzero coefficients take correction
    bits; (r, 1) symbols place newly-nonzero +-1<<Al after r zero-history
    coefficients; EOBn corrects the rest of the block."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            w16 = int(win[pos])
            rs = int(sym[w16])
            if rs < 0:
                raise ValueError("invalid AC Huffman code")
            pos += int(ln[w16])
            r, s = rs >> 4, rs & 0xF
            sval = 0
            if s == 0:
                if r != 15:  # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += int(win[pos]) >> (16 - r)
                        pos += r
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid AC refinement symbol")
                sval = p1 if int(win[pos]) >> 15 else m1
                pos += 1
            while k <= se:
                coef = int(blk[k])
                if coef:
                    bit = int(win[pos]) >> 15
                    pos += 1
                    if bit and not (coef & p1):
                        blk[k] = coef + (p1 if coef > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sval and k <= se:
                blk[k] = sval
            k += 1
    if eobrun > 0:
        while k <= se:
            coef = int(blk[k])
            if coef:
                bit = int(win[pos]) >> 15
                pos += 1
                if bit and not (coef & p1):
                    blk[k] = coef + (p1 if coef > 0 else m1)
            k += 1
        eobrun -= 1
    return pos, eobrun


def _decode_progressive_scan(
    frame, scan_comps, ss, se, ah, al, segs, dc_tables, ac_tables,
    restart_interval,
) -> None:
    """One progressive (SOF2) scan into the per-component coefficient
    grids. DC scans (Ss=0) may be interleaved; AC scans are
    single-component and traverse the component's NON-interleaved block
    raster (T.81 G.1/A.2.2). Restart intervals count MCUs (interleaved)
    or data units (non-interleaved), resetting DC predictors + EOB run."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    try:
        order = [by_id[s["id"]] for s in scan_comps]
    except KeyError:
        raise ValueError("scan references unknown component id")
    if ss == 0:
        if se != 0:
            raise ValueError(
                "progressive DC scan must have Se=0 (a baseline stream "
                "mislabeled SOF2?)"
            )
        interleaved = len(order) > 1
        tabs = {}
        if ah == 0:
            for s, c in zip(scan_comps, order):
                t = dc_tables.get(s["td"])
                if t is None:
                    raise ValueError("missing DC Huffman table for scan")
                tabs[c["id"]] = t
        if interleaved:
            mcux = frame["mcux"]
            n_units = mcux * frame["mcuy"]
        else:
            c0 = order[0]
            n_units = c0["bw_ni"] * c0["bh_ni"]
        _check_segs(segs, n_units, restart_interval)
        for si, seg in enumerate(segs):
            win = _bit_windows(seg)
            nbits = len(seg) * 8
            pos = 0
            for c in order:
                c["pred"] = 0
            first, last = _seg_bounds(si, n_units, restart_interval)
            for m in range(first, last):
                if pos > nbits:
                    raise ValueError("entropy stream truncated")
                if interleaved:
                    my, mx = divmod(m, mcux)
                    for c in order:
                        cv, chh, bw = c["v"], c["h"], c["bw"]
                        for v in range(cv):
                            for hh in range(chh):
                                blk = c["coef"][
                                    (my * cv + v) * bw + (mx * chh + hh)
                                ]
                                pos = _dc_unit(
                                    blk, c, win, pos, ah, al,
                                    tabs.get(c["id"]),
                                )
                else:
                    c = order[0]
                    by, bx = divmod(m, c["bw_ni"])
                    blk = c["coef"][by * c["bw"] + bx]
                    pos = _dc_unit(blk, c, win, pos, ah, al,
                                   tabs.get(c["id"]))
            if pos > nbits + 7:
                raise ValueError("entropy stream overran restart segment")
        return
    # AC scan
    if len(order) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not 1 <= ss <= se <= 63:
        raise ValueError("invalid spectral selection")
    c = order[0]
    ac_t = ac_tables.get(scan_comps[0]["ta"])
    if ac_t is None:
        raise ValueError("missing AC Huffman table for scan")
    ac_sym, ac_len = ac_t
    n_units = c["bw_ni"] * c["bh_ni"]
    _check_segs(segs, n_units, restart_interval)
    bw, bw_ni = c["bw"], c["bw_ni"]
    coef = c["coef"]
    for si, seg in enumerate(segs):
        win = _bit_windows(seg)
        nbits = len(seg) * 8
        pos = 0
        eobrun = 0
        first, last = _seg_bounds(si, n_units, restart_interval)
        for m in range(first, last):
            if pos > nbits:
                raise ValueError("entropy stream truncated")
            by, bx = divmod(m, bw_ni)
            blk = coef[by * bw + bx]
            if ah == 0:
                pos, eobrun = _ac_first(
                    blk, win, pos, ss, se, al, ac_sym, ac_len, eobrun
                )
            else:
                pos, eobrun = _ac_refine(
                    blk, win, pos, ss, se, al, ac_sym, ac_len, eobrun
                )
        if pos > nbits + 7:
            raise ValueError("entropy stream overran restart segment")


def _dc_unit(blk, c, win, pos, ah, al, tab):
    """DC coefficient of one data unit: first scan (Ah=0) Huffman-codes
    the diff at Al precision; refinement appends one raw bit at Al."""
    if ah == 0:
        dc_sym, dc_len = tab
        w16 = int(win[pos])
        size = int(dc_sym[w16])
        if size < 0:
            raise ValueError("invalid DC Huffman code")
        pos += int(dc_len[w16])
        if size:
            mag = int(win[pos]) >> (16 - size)
            pos += size
            if mag < (1 << (size - 1)):  # EXTEND
                mag += 1 - (1 << size)
            c["pred"] += mag
        blk[0] = c["pred"] << al
    else:
        if int(win[pos]) >> 15:
            blk[0] = int(blk[0]) | (1 << al)
        pos += 1
    return pos


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if data[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG (missing ffd8ff magic)")
    qt = {}
    dc_tables = {}
    ac_tables = {}
    frame = None
    restart_interval = 0
    pos = 2
    nscans = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision not in (8, 12):
                raise ValueError(f"unsupported JPEG precision {precision}")
            if precision == 12 and marker == 0xC0:
                # T.81: baseline DCT is 8-bit only; 12-bit requires
                # extended sequential (SOF1) or progressive (SOF2)
                raise ValueError("baseline JPEG (SOF0) must be 8-bit")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {
                "w": w, "h": h, "comps": comps,
                "precision": precision,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF marker ff{marker:02x}; "
                "only baseline/extended-sequential/progressive Huffman "
                "is decoded)"
            )
        elif marker == 0xC4:  # DHT (may hold several tables)
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                table = _build_decode_lut(bits, vals)
                if tc_th >> 4 == 0:
                    dc_tables[tc_th & 0xF] = table
                else:
                    ac_tables[tc_th & 0xF] = table
                off += 17 + n
        elif marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq_tq = body[off]
                tq = pq_tq & 0xF
                if pq_tq >> 4:  # 16-bit entries
                    vals = np.frombuffer(
                        body[off + 1 : off + 129], dtype=">u2"
                    ).astype(np.int64)
                    off += 129
                else:
                    vals = np.frombuffer(
                        body[off + 1 : off + 65], dtype=np.uint8
                    ).astype(np.int64)
                    off += 65
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = vals  # DQT stores zigzag order
                qt[tq] = nat
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if nscans == 0:
                _init_block_grids(frame)
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, td_ta = struct.unpack_from(">BB", body, 1 + 2 * c)
                scan_comps.append(
                    {"id": cs, "td": td_ta >> 4, "ta": td_ta & 0xF}
                )
            ss, se, ah_al = struct.unpack_from(">BBB", body, 1 + 2 * ns)
            segs, end = _split_scan(data, pos + 2 + seglen)
            if frame["progressive"]:
                _decode_progressive_scan(
                    frame, scan_comps, ss, se, ah_al >> 4, ah_al & 0xF,
                    segs, dc_tables, ac_tables, restart_interval,
                )
            else:
                if nscans:
                    raise ValueError(
                        "multi-scan sequential JPEG not supported"
                    )
                _decode_sequential_scan(
                    frame, scan_comps, segs, dc_tables, ac_tables,
                    restart_interval,
                )
            nscans += 1
            pos = end
            continue
        # APPn / COM / others: skip
        pos += 2 + seglen
    if frame is None or nscans == 0:
        raise ValueError("JPEG missing SOF/SOS")
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax, vmax = frame["hmax"], frame["vmax"]

    precision = frame.get("precision", 8)
    shift = 1 << (precision - 1)
    maxval = (1 << precision) - 1
    planes = []
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError(f"missing quantization table {c['tq']}")
        deq = np.zeros((len(c["coef"]), 64), dtype=np.int64)
        deq[:, ZIGZAG] = c["coef"] * q[ZIGZAG]  # zigzag -> natural
        px = _idct_blocks(deq.reshape(-1, 8, 8)) + float(shift)
        px = np.clip(np.round(px), 0, maxval)
        if precision == 12:
            # output contract is 8-bit RGB: scale 0..4095 -> 0..255 so
            # the shared color path (128-centered chroma) applies
            px = px / 16.0
        # block grid -> plane
        plane = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # crop to the component's sample dimensions, then upsample
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        ys = (np.arange(h) * c["v"]) // vmax
        xs = (np.arange(w) * c["h"]) // hmax
        planes.append(plane[ys][:, xs].astype(np.float64))

    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (test-fixture generator)
# ---------------------------------------------------------------------------

def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style linear quality scaling of an Annex-K table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality in [1, 100]")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


def _encode_block(
    writer: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    diff = int(zz[0]) - pred
    size = int(diff != 0 and int(abs(diff)).bit_length())
    code, length = dc_codes[size]
    writer.put(code, length)
    if size:
        writer.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            writer.put(c, ln)
            run -= 16
        size = int(abs(v)).bit_length()
        c, ln = ac_codes[(run << 4) | size]
        writer.put(c, ln)
        writer.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        writer.put(c, ln)
    return int(zz[0])


def _component_blocks(
    plane: np.ndarray, q: np.ndarray, precision: int = 8
) -> np.ndarray:
    """Padded plane -> (nblocks, 64) quantized zigzag coefficients."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - float(1 << (precision - 1))
    )
    coef = _fdct_blocks(blocks).reshape(-1, 64)
    qz = np.round(coef / q[None, :]).astype(np.int64)
    # AC categories stop at size 10 (8-bit) / 14 (12-bit); at quality
    # 100 (q=1) an extreme block can quantize one past the category
    # range — clamp (DC's one-larger diff range covers its span)
    ac_max = 1023 if precision == 8 else 16383
    qz[:, 1:] = np.clip(qz[:, 1:], -ac_max, ac_max)
    return qz[:, ZIGZAG]  # natural -> zigzag scan order


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // mh) * mh
    pw = -(-w // mw) * mw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: int = 1,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 -> baseline JPEG bytes.

    ``subsample=1`` is 4:4:4; ``subsample=2`` is 4:2:0 (chroma averaged
    2x2). Fixed-length Huffman tables (see module docstring).

    ``precision=12`` (fixture generator for the extended-sequential
    decode path) takes a GRAYSCALE (h, w) uint16 image with samples in
    [0, 4095] and emits an SOF1 12-bit stream with size-14 AC tables."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if precision == 12:
        if img.ndim != 2 or img.dtype != np.uint16:
            raise ValueError(
                "12-bit encode wants a grayscale (h, w) uint16 image"
            )
        if int(img.max(initial=0)) > 4095:
            raise ValueError("12-bit samples must be in [0, 4095]")
    elif img.dtype != np.uint8:
        raise ValueError("encode_jpeg wants uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg wants (h, w) or (h, w, 3)")
    if subsample not in (1, 2):
        raise ValueError("subsample must be 1 (4:4:4) or 2 (4:2:0)")
    h, w = img.shape[:2]
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
        qtables = [ql]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        if subsample == 2:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
        qtables = [ql, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    maxval = (1 << precision) - 1
    comp_zz = []
    for plane, (sh, sv), qid in zip(planes, samp, qids):
        padded = _pad_to(
            np.clip(np.round(plane), 0, maxval),
            mcuy * sv * 8, mcux * sh * 8,
        )
        comp_zz.append(
            (_component_blocks(padded, qtables[qid], precision), sh, sv)
        )

    if precision == 12:
        dc_tab = (_ENC_DC12_BITS, _ENC_DC12_VALS)
        ac_tab = (_ENC_AC12_BITS, _ENC_AC12_VALS)
    else:
        dc_tab = (_ENC_DC_BITS, _ENC_DC_VALS)
        ac_tab = (_ENC_AC_BITS, _ENC_AC_VALS)
    dc_codes = _build_codes(*dc_tab)
    ac_codes = _build_codes(*ac_tab)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(  # APP0 JFIF 1.1, no thumbnail
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )
    for tq, q in enumerate(qtables):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) \
            + bytes(int(v) for v in q[ZIGZAG])
    ncomp = len(planes)
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, precision, h, w, ncomp)
    for i, (sh, sv) in enumerate(samp):
        sof += struct.pack(">BBB", i + 1, (sh << 4) | sv, qids[i])
    # 12-bit is extended sequential (SOF1); 8-bit stays baseline (SOF0)
    out += (b"\xff\xc1" if precision == 12 else b"\xff\xc0") + sof
    for tc, (bits, vals) in ((0, dc_tab), (1, ac_tab)):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        sos += struct.pack(">BB", i + 1, 0x00)  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos

    writer = _BitWriter()
    preds = [0] * ncomp
    n_mcu = mcux * mcuy
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            out += writer.out
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci, (zz, sh, sv) in enumerate(comp_zz):
            bw = mcux * sh
            for v in range(sv):
                for hh in range(sh):
                    row = my * sv + v
                    col = mx * sh + hh
                    preds[ci] = _encode_block(
                        writer, zz[row * bw + col], preds[ci],
                        dc_codes, ac_codes,
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixture generator for the SOF2 decode path)
# ---------------------------------------------------------------------------

def _emit_size_val(writer: _BitWriter, codes, sym: int, v: int, size: int):
    code, length = codes[sym]
    writer.put(code, length)
    if size:
        writer.put(v if v >= 0 else v + (1 << size) - 1, size)


def _encode_ac_first_block(writer, zz, ss, se, al, ac_codes) -> None:
    """AC first scan (Ah=0) for one block: baseline-style RLE over the
    coefficients at reduced precision sign*(|v|>>Al); per-block EOB
    (EOBn run length 1 — decoders must accept any split)."""
    vals = [
        (1 if int(zz[k]) >= 0 else -1) * (abs(int(zz[k])) >> al)
        for k in range(ss, se + 1)
    ]
    last_nz = -1
    for i, v in enumerate(vals):
        if v:
            last_nz = i
    run = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            _emit_size_val(writer, ac_codes, 0xF0, 0, 0)
            run -= 16
        size = abs(v).bit_length()
        _emit_size_val(writer, ac_codes, (run << 4) | size, v, size)
        run = 0
    if last_nz < se - ss:
        _emit_size_val(writer, ac_codes, 0x00, 0, 0)  # EOB (run of 1)


def _encode_ac_refine_block(writer, zz, ss, se, al, ac_codes) -> None:
    """AC refinement scan (Ah=Al+1) for one block — the encoder dual of
    _ac_refine, per-block EOB flush (T.81 G.1.2.3 / figure G.7):
    correction bits for already-nonzero coefficients ride behind the
    next (r,1)/ZRL/EOB symbol."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    signs = [1 if int(zz[k]) >= 0 else 0 for k in range(ss, se + 1)]
    r = 0
    br: list = []
    for i, temp in enumerate(absv):
        if temp == 0:
            r += 1
            continue
        while r > 15:
            _emit_size_val(writer, ac_codes, 0xF0, 0, 0)
            r -= 16
            for b in br:
                writer.put(b, 1)
            br = []
        if temp > 1:  # nonzero history: correction bit only
            br.append(temp & 1)
            continue
        _emit_size_val(writer, ac_codes, (r << 4) | 1, 0, 0)
        writer.put(signs[i], 1)
        for b in br:
            writer.put(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        _emit_size_val(writer, ac_codes, 0x00, 0, 0)  # EOB
        for b in br:
            writer.put(b, 1)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsample: int = 1,
    precision: int = 8, restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 -> PROGRESSIVE (SOF2) JPEG.

    Four-phase progression exercising every progressive decode path:
      1. DC first, all components interleaved, Al=1
      2. DC refinement to Al=0 (raw bits)
      3. per component: AC first Ss=1..63 at Al=1 (EOB-run coding)
      4. per component: AC refinement to Al=0 (correction bits)
    Transmits every coefficient bit, so decoded pixels are BIT-IDENTICAL
    to the baseline encoding of the same image at the same quality.

    ``precision=12`` (like encode_jpeg's) takes grayscale (h, w) uint16
    in [0, 4095] — the 12-bit progressive fixture."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if precision == 12:
        if img.ndim != 2 or img.dtype != np.uint16:
            raise ValueError(
                "12-bit encode wants a grayscale (h, w) uint16 image"
            )
        if int(img.max(initial=0)) > 4095:
            raise ValueError("12-bit samples must be in [0, 4095]")
    elif img.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive wants uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg_progressive wants (h, w) or (h, w, 3)")
    if subsample not in (1, 2):
        raise ValueError("subsample must be 1 (4:4:4) or 2 (4:2:0)")
    h, w = img.shape[:2]
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
        qtables = [ql]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        if subsample == 2:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
        qtables = [ql, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_zz = []
    for plane, (sh, sv), qid in zip(planes, samp, qids):
        padded = _pad_to(
            np.clip(np.round(plane), 0, (1 << precision) - 1),
            mcuy * sv * 8, mcux * sh * 8,
        )
        comp_zz.append(
            (_component_blocks(padded, qtables[qid], precision), sh, sv)
        )

    if precision == 12:
        dc_tab = (_ENC_DC12_BITS, _ENC_DC12_VALS)
        ac_tab = (_ENC_AC12_BITS, _ENC_AC12_VALS)
    else:
        dc_tab = (_ENC_DC_BITS, _ENC_DC_VALS)
        ac_tab = (_ENC_AC_BITS, _ENC_AC_VALS)
    dc_codes = _build_codes(*dc_tab)
    ac_codes = _build_codes(*ac_tab)
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )
    for tq, q in enumerate(qtables):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) \
            + bytes(int(v) for v in q[ZIGZAG])
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, precision, h, w, ncomp)
    for i, (sh, sv) in enumerate(samp):
        sof += struct.pack(">BBB", i + 1, (sh << 4) | sv, qids[i])
    out += b"\xff\xc2" + sof  # SOF2: progressive DCT, Huffman
    for tc, (bits, vals) in ((0, dc_tab), (1, ac_tab)):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        sos = struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid in comp_ids:
            sos += struct.pack(">BB", cid, 0x00)
        sos += struct.pack(">BBB", ss, se, (ah << 4) | al)
        return b"\xff\xda" + sos

    def dc_units(fn, reset=None) -> bytes:
        """Run fn(ci, zz_block) over every data unit in interleaved MCU
        order (== non-interleaved raster when ncomp==1 and 1x1). With
        ``restart_interval``, emits RSTn every N MCUs and calls
        ``reset`` (DC predictor reset)."""
        writer = _BitWriter()
        chunks = bytearray()
        rst = 0
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                writer.flush()
                chunks += writer.out
                chunks += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                writer = _BitWriter()
                if reset is not None:
                    reset()
            my, mx = divmod(m, mcux)
            for ci, (zz, sh, sv) in enumerate(comp_zz):
                bw = mcux * sh
                for v in range(sv):
                    for hh in range(sh):
                        fn(writer, ci, zz[(my * sv + v) * bw + (mx * sh + hh)])
        writer.flush()
        return bytes(chunks + writer.out)

    # scan 1: DC first, Al=1
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 0, 1)
    preds = [0] * ncomp

    def dc_first(writer, ci, blk):
        dc = int(blk[0]) >> 1  # Al=1, arithmetic shift
        diff = dc - preds[ci]
        preds[ci] = dc
        size = int(diff != 0 and abs(diff).bit_length())
        _emit_size_val(writer, dc_codes, size, diff, size)

    def _reset_preds():
        preds[:] = [0] * ncomp

    out += dc_units(dc_first, reset=_reset_preds)

    # scan 2: DC refinement to Al=0 (one raw bit per unit)
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    out += dc_units(
        lambda writer, ci, blk: writer.put(int(blk[0]) & 1, 1)
    )

    def ac_scan(ci, encode_block, ss, se, ah, al) -> bytes:
        zz, sh, sv = comp_zz[ci]
        bw = mcux * sh
        cw = -(-w * sh // hmax)
        chh = -(-h * sv // vmax)
        bw_ni, bh_ni = -(-cw // 8), -(-chh // 8)
        writer = _BitWriter()
        chunks = bytearray()
        rst = 0
        for m in range(bw_ni * bh_ni):
            if restart_interval and m and m % restart_interval == 0:
                writer.flush()
                chunks += writer.out
                chunks += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                writer = _BitWriter()
            by, bx = divmod(m, bw_ni)
            encode_block(writer, zz[by * bw + bx], ss, se, al, ac_codes)
        writer.flush()
        return bytes(chunks + writer.out)

    # scans 3..: AC first at Al=1, then AC refinement to Al=0, per comp
    for ci in range(ncomp):
        out += sos_header([ci + 1], 1, 63, 0, 1)
        out += ac_scan(ci, _encode_ac_first_block, 1, 63, 0, 1)
    for ci in range(ncomp):
        out += sos_header([ci + 1], 1, 63, 1, 0)
        out += ac_scan(ci, _encode_ac_refine_block, 1, 63, 1, 0)

    out += b"\xff\xd9"  # EOI
    return bytes(out)
