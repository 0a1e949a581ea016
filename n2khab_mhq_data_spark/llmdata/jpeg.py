"""Baseline JPEG codec — pure stdlib + numpy (no PIL/libjpeg).

Scope: 8-bit GRAYSCALE baseline sequential JFIF (SOF0, one component,
no subsampling, no restart intervals) — the decodable-without-an-
external-library tier of the multimodal decode surface, next to the
PNG/WAV codecs in ``llmdata/multimodal.py``. Color, progressive, and
chroma-subsampled streams raise (they are the remaining env-gated
tier, with video).

Spec fidelity notes (ITU-T T.81, public):

- DCT: S(u,v) = 1/4 C(u) C(v) ΣΣ (f(x,y) - 128) cos[(2x+1)uπ/16]
  cos[(2y+1)vπ/16], implemented as the separable basis-matrix product
  ``A @ f @ A.T`` with A[u,x] = 0.5 C(u) cos((2x+1)uπ/16); the IDCT is
  the transpose product. A is orthogonal (A @ A.T = I, asserted in
  tests), so encode->decode is exact up to coefficient quantization.
- Entropy coding: canonical Huffman exactly as Annex C assigns codes
  (increasing length, within a length in listed-value order). The
  ENCODER builds its own uniform-length canonical tables over the
  symbols it actually emits and declares them in DHT — legal baseline
  JPEG any conforming decoder reads — rather than hard-coding the
  Annex K example tables. The DECODER implements the general Annex C
  algorithm, so it reads both our streams and standard-table streams.
- DC is coded as category + amplitude bits of the PREDICTION DIFF
  (one's-complement form for negatives); AC as (run, size) with EOB
  and ZRL; 0xFF bytes in the entropy stream are stuffed with 0x00.
- Quantization tables are free per the spec; ``encode_jpeg`` defaults
  to the all-ones table, under which an image whose every 8x8 block is
  CONSTANT round-trips bit-exactly (only the integral DC = 8*(v-128)
  survives, and the IDCT of a DC-only block is exact in float) — the
  property the oracle-checked query exploits.
"""

from __future__ import annotations

import struct

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _basis():
    import math

    import numpy as np

    A = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    return A


_A = None


def _dct_matrix():
    global _A
    if _A is None:
        _A = _basis()
    return _A


def _category(v: int) -> int:
    """Annex F amplitude category: bits needed for |v| (0 for v=0)."""
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((bits >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # 1-pad
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _uniform_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """Canonical Huffman table with every symbol at one code length
    (values sorted ascending): BITS (counts per length 1..16) and the
    value list. Length L satisfies n <= 2^L - 1 so the all-ones code
    stays unused (Annex C reserves it from the longest length)."""
    vals = sorted(symbols) or [0]
    n = len(vals)
    length = 1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals


def _codes_from_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code assignment: increasing length, listed-value order."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def encode_jpeg(img, quant=None) -> bytes:
    """Encode an 8-bit grayscale image as baseline sequential JPEG.
    ``quant``: 64 ints in natural (row-major) order; default all-ones
    (block-constant images then round-trip exactly)."""
    import numpy as np

    a = np.asarray(img, dtype=np.int64)
    h, w = a.shape
    if quant is None:
        quant = [1] * 64
    Q = np.asarray(quant, dtype=np.int64).reshape(8, 8)
    # pad to multiples of 8 by edge replication (decoder crops to h, w)
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(a, ((0, H - h), (0, W - w)), mode="edge")
    A = _dct_matrix()

    # pass 1: quantized coefficients per block + the symbol sets
    blocks = []
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    prev_dc = 0
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            f = pad[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            S = A @ f @ A.T
            q = np.round(S / Q).astype(np.int64)
            zz = [int(q.flat[_ZIGZAG[i]]) for i in range(64)]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            dc_syms.add(_category(diff))
            run = 0
            acs = []
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    acs.append((0xF0, 0, 0))
                    ac_syms.add(0xF0)
                    run -= 16
                t = _category(v)
                acs.append(((run << 4) | t, v, t))
                ac_syms.add((run << 4) | t)
                run = 0
            if run:
                acs.append((0x00, 0, 0))
                ac_syms.add(0x00)
            blocks.append((diff, acs))
    if not any(acs and acs[-1][0] == 0x00 for _, acs in blocks):
        ac_syms.add(0x00)  # table must still define EOB

    dc_bits, dc_vals = _uniform_table(dc_syms)
    ac_bits, ac_vals = _uniform_table(ac_syms)
    dc_codes = _codes_from_table(dc_bits, dc_vals)
    ac_codes = _codes_from_table(ac_bits, ac_vals)

    bw = _BitWriter()

    def amplitude(v: int, t: int) -> int:
        return v if v >= 0 else v + (1 << t) - 1

    for diff, acs in blocks:
        t = _category(diff)
        c, ln = dc_codes[t]
        bw.put(c, ln)
        if t:
            bw.put(amplitude(diff, t), t)
        for sym, v, t2 in acs:
            c, ln = ac_codes[sym]
            bw.put(c, ln)
            if t2:
                bw.put(amplitude(v, t2), t2)
    data = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_quant = bytes(int(Q.flat[_ZIGZAG[i]]) for i in range(64))
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFDB, b"\x00" + zz_quant)  # DQT: Pq=0 Tq=0
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(
        0xFFC4,
        b"\x00" + bytes(dc_bits) + bytes(dc_vals)
        + b"\x11" + bytes(ac_bits) + bytes(ac_vals),
    )
    out += seg(0xFFDA, b"\x01\x01\x01\x00\x3f\x00")  # Td=0 Ta=1
    out += data
    out += b"\xff\xd9"  # EOI
    return out


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.buf):
                raise ValueError("JPEG entropy stream truncated")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.buf) or self.buf[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1  # skip stuffed 0x00
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _huff_decoder(bits: list[int], vals: list[int]):
    codes = _codes_from_table(bits, vals)
    by_len: dict[int, dict[int, int]] = {}
    for sym, (code, ln) in codes.items():
        by_len.setdefault(ln, {})[code] = sym

    def read(br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            table = by_len.get(ln)
            if table is not None and code in table:
                return table[code]
        raise ValueError("invalid Huffman code in JPEG stream")

    return read


def _extend(v: int, t: int) -> int:
    """Annex F.2.2.1 EXTEND: map t amplitude bits to a signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(raw: bytes):
    """Decode a baseline grayscale JPEG to an (h, w) uint8 array."""
    import numpy as np

    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quants: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    h = w = None
    comp = None
    data_start = None
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI before SOS?
            break
        (ln,) = struct.unpack_from(">H", raw, pos + 2)
        body = raw[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization unsupported")
                zz = body[off + 1 : off + 65]
                q = np.zeros(64, dtype=np.int64)
                for i in range(64):
                    q[_ZIGZAG[i]] = zz[i]
                quants[tq] = q.reshape(8, 8)
                off += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 1:
                raise ValueError(
                    "only 8-bit grayscale baseline JPEG supported"
                    " (color/subsampled streams need an imaging library)"
                )
            cid, samp, tq = body[6], body[7], body[8]
            if samp != 0x11:
                raise ValueError("subsampling unsupported")
            comp = (cid, tq)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/etc.)")
        elif marker == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                huff[(tc, th)] = (bits, vals)
                off += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise ValueError("multi-component scan unsupported")
            td, ta = body[2] >> 4, body[2] & 0xF
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if h is None or comp is None or data_start is None:
        raise ValueError("JPEG missing SOF/SOS")
    # entropy data runs to the EOI marker (0xFF 0xD9), 0xFF00 unstuffed
    end = len(raw) - 2 if raw[-2:] == b"\xff\xd9" else len(raw)
    br = _BitReader(raw[data_start:end])
    read_dc = _huff_decoder(*huff[(0, td)])
    read_ac = _huff_decoder(*huff[(1, ta)])
    Q = quants[comp[1]]
    A = _dct_matrix()
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    out = np.zeros((H, W), dtype=np.float64)
    prev_dc = 0
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            zz = [0] * 64
            t = read_dc(br)
            diff = _extend(br.bits(t), t) if t else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = read_ac(br)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, t = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC coefficient index overflow")
                zz[k] = _extend(br.bits(t), t)
                k += 1
            q = np.zeros(64, dtype=np.int64)
            for i in range(64):
                q[_ZIGZAG[i]] = zz[i]
            S = q.reshape(8, 8) * Q
            out[by : by + 8, bx : bx + 8] = A.T @ S @ A + 128.0
    return np.clip(np.round(out), 0, 255).astype(np.uint8)[:h, :w]


# --- MJPEG-in-AVI: the minimal REAL video container path -------------
#
# AVI is RIFF (the same chunk grammar as WAV); an MJPEG stream is one
# JPEG per frame — so with the baseline-JPEG codec above, video frame
# extraction can be REAL with pure stdlib: walk the 'movi' LIST, pull
# '00dc' chunks, decode each frame. Codecs that need external
# libraries (H.264/H.265/VP9...) stay env-gated.


def encode_avi_mjpeg(frames: list[bytes], fps: int = 10,
                     width: int = 0, height: int = 0) -> bytes:
    """Mux JPEG frame payloads into a spec-valid minimal AVI (RIFF
    'AVI ', hdrl with avih/strh/strf, movi with word-aligned '00dc'
    chunks)."""
    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    n = len(frames)
    usec = 1_000_000 // max(fps, 1)
    maxb = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I", usec, maxb * fps, 0, 0x10, n, 0, 1, maxb,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        # fccHandler uppercase b"MJPG" to match strf biCompression —
        # third-party demuxers conventionally match on the uppercase form
        b"vidsMJPG"
        + struct.pack("<IHH8I", 0, 0, 0, 0, 1, fps, 0, n, maxb, 0, 0)
        + struct.pack("<4H", 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(raw: bytes) -> tuple[int, list[bytes]]:
    """Demux a minimal MJPEG AVI: returns (fps, [jpeg frame bytes]).
    Walks the RIFF chunk tree; '00dc'/'00db' chunks under 'movi' are
    the frames; fps comes from the avih main header."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    fps = 0
    frames: list[bytes] = []

    def walk(buf: bytes, off: int, end: int) -> None:
        nonlocal fps
        while off + 8 <= end:
            fourcc = buf[off : off + 4]
            (ln,) = struct.unpack_from("<I", buf, off + 4)
            body_off = off + 8
            if fourcc == b"LIST":
                walk(buf, body_off + 4, body_off + ln)
            elif fourcc == b"avih":
                (usec,) = struct.unpack_from("<I", buf, body_off)
                fps = round(1_000_000 / usec) if usec else 0
            elif fourcc in (b"00dc", b"00db"):
                frames.append(buf[body_off : body_off + ln])
            off = body_off + ln + (ln & 1)  # word alignment

    walk(raw, 12, len(raw))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return fps, frames
