"""Baseline JPEG codec — pure stdlib + numpy (no PIL/libjpeg).

Scope: 8-bit JFIF — baseline sequential (SOF0, grayscale and
three-component YCbCr 4:2:0/4:4:4 with interleaved MCU scans) and
PROGRESSIVE (SOF2, full spectral selection + successive approximation:
DC first/refinement scans, split AC bands with EOBRUN, one-bit AC
refinement with buffered correction bits, T.81 G.1/G.2) — the
decodable-without-an-external-library tier of the multimodal decode
surface, next to the PNG/WAV codecs in ``llmdata/multimodal.py``.
Restart intervals (DRI/RSTm resync with per-interval predictor
resets) are supported in both baseline paths. Arithmetic coding,
extended/lossless processes, and the progressive+DRI combination
raise (the remaining env-gated tier, with H.264-class video).

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


def _encode_block(pix, Q, A, prev_dc, dc_syms, ac_syms):
    """Quantize + symbol-ize one 8x8 pixel block (level shift, DCT,
    zigzag, DC diff vs ``prev_dc``, AC run-lengths). Returns
    ((diff, acs), new_dc); records the emitted symbols in the sets."""
    import numpy as np

    f = pix.astype(np.float64) - 128.0
    S = A @ f @ A.T
    q = np.round(S / Q).astype(np.int64)
    zz = [int(q.flat[_ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - prev_dc
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
    return (diff, acs), zz[0]


def _entropy_encode(segments, dc_syms, ac_syms):
    """Canonical tables over the emitted symbols + the entropy-coded
    bytes. ``segments`` is a list of restart intervals, each a list of
    scan-ordered (diff, acs) blocks: every interval is 1-padded to a
    byte boundary and separated by a cyclic RSTm marker (T.81 F.1.2.3;
    one segment = no restart markers)."""
    ac_syms = set(ac_syms)
    ac_syms.add(0x00)  # table must always define EOB
    dc_bits, dc_vals = _uniform_table(dc_syms)
    ac_bits, ac_vals = _uniform_table(ac_syms)
    dc_codes = _codes_from_table(dc_bits, dc_vals)
    ac_codes = _codes_from_table(ac_bits, ac_vals)

    def amplitude(v: int, t: int) -> int:
        return v if v >= 0 else v + (1 << t) - 1

    parts = []
    for i, blocks in enumerate(segments):
        if i:
            parts.append(bytes([0xFF, 0xD0 + (i - 1) % 8]))
        bw = _BitWriter()
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
        parts.append(bw.flush())
    return (dc_bits, dc_vals), (ac_bits, ac_vals), b"".join(parts)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _dqt_dht(Q, dc_table, ac_table) -> bytes:
    zz_quant = bytes(int(Q.flat[_ZIGZAG[i]]) for i in range(64))
    dc_bits, dc_vals = dc_table
    ac_bits, ac_vals = ac_table
    return _seg(0xFFDB, b"\x00" + zz_quant) + _seg(
        0xFFC4,
        b"\x00" + bytes(dc_bits) + bytes(dc_vals)
        + b"\x11" + bytes(ac_bits) + bytes(ac_vals),
    )


def encode_jpeg(img, quant=None, restart_interval: int = 0) -> bytes:
    """Encode an 8-bit grayscale image as baseline sequential JPEG.
    ``quant``: 64 ints in natural (row-major) order; default all-ones
    (block-constant images then round-trip exactly).
    ``restart_interval``: emit a DRI segment and a cyclic RSTm marker
    every N MCUs (here 1 MCU = 1 block), resetting the DC predictor —
    the resync machinery real camera baselines use."""
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

    segments = [[]]
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    prev_dc = 0
    n_mcu = 0
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                segments.append([])
                prev_dc = 0
            blk, prev_dc = _encode_block(
                pad[by : by + 8, bx : bx + 8], Q, A, prev_dc,
                dc_syms, ac_syms,
            )
            segments[-1].append(blk)
            n_mcu += 1
    dc_table, ac_table, data = _entropy_encode(segments, dc_syms, ac_syms)

    out = b"\xff\xd8"  # SOI
    out += _dqt_dht(Q, dc_table, ac_table)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += _seg(0xFFDA, b"\x01\x01\x01\x00\x3f\x00")  # Td=0 Ta=1
    out += data
    out += b"\xff\xd9"  # EOI
    return out


def encode_jpeg_color(y, cb, cr, quant=None,
                      restart_interval: int = 0) -> bytes:
    """Encode 8-bit YCbCr planes as baseline sequential COLOR JPEG with
    4:2:0 subsampling and an interleaved MCU scan (T.81 A.2.3): Y at
    (h, w), Cb/Cr at (ceil(h/2), ceil(w/2)) — the caller subsamples
    chroma (the codec does not guess a filter). One shared quant table
    (default all-ones) and one shared DC/AC table pair serve all three
    components — legal baseline, and it keeps the canonical-table
    machinery identical to the grayscale path. Per-component DC
    predictors per F.1.1.5.1; MCU block order Y00 Y01 Y10 Y11 Cb Cr."""
    import numpy as np

    ya = np.asarray(y, dtype=np.int64)
    cba = np.asarray(cb, dtype=np.int64)
    cra = np.asarray(cr, dtype=np.int64)
    h, w = ya.shape
    ch, cw = (h + 1) // 2, (w + 1) // 2
    if cba.shape != (ch, cw) or cra.shape != (ch, cw):
        raise ValueError(
            f"chroma planes must be ({ch}, {cw}) for a ({h}, {w}) luma"
        )
    if quant is None:
        quant = [1] * 64
    Q = np.asarray(quant, dtype=np.int64).reshape(8, 8)
    # pad luma to 16-multiples (MCU grid), chroma to 8-multiples
    H, W = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    ypad = np.pad(ya, ((0, H - h), (0, W - w)), mode="edge")
    cbp = np.pad(
        cba, ((0, H // 2 - ch), (0, W // 2 - cw)), mode="edge"
    )
    crp = np.pad(
        cra, ((0, H // 2 - ch), (0, W // 2 - cw)), mode="edge"
    )
    A = _dct_matrix()

    segments = [[]]
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    dc = {"y": 0, "cb": 0, "cr": 0}
    n_mcu = 0
    for my in range(H // 16):
        for mx in range(W // 16):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                segments.append([])
                dc = {"y": 0, "cb": 0, "cr": 0}  # all predictors reset
            for v in range(2):  # 4 luma blocks, raster order in the MCU
                for u in range(2):
                    by, bx = (2 * my + v) * 8, (2 * mx + u) * 8
                    blk, dc["y"] = _encode_block(
                        ypad[by : by + 8, bx : bx + 8], Q, A, dc["y"],
                        dc_syms, ac_syms,
                    )
                    segments[-1].append(blk)
            for name, plane in (("cb", cbp), ("cr", crp)):
                by, bx = my * 8, mx * 8
                blk, dc[name] = _encode_block(
                    plane[by : by + 8, bx : bx + 8], Q, A, dc[name],
                    dc_syms, ac_syms,
                )
                segments[-1].append(blk)
            n_mcu += 1
    dc_table, ac_table, data = _entropy_encode(segments, dc_syms, ac_syms)

    out = b"\xff\xd8"  # SOI
    out += _dqt_dht(Q, dc_table, ac_table)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    # SOF0: Y id1 samp 2x2, Cb id2 1x1, Cr id3 1x1, all quant table 0
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01\x22\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    # SOS: 3 components, each Td=0 Ta=1 (the shared table pair)
    out += _seg(0xFFDA, b"\x03\x01\x01\x02\x01\x03\x01\x00\x3f\x00")
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

    def restart(self, expect_m: int) -> None:
        """Byte-align (discarding pad bits), consume the expected cyclic
        RSTm marker (T.81 F.2.1.3.1)."""
        self.n = 0  # drop the 1-padding of the finished interval
        if (
            self.pos + 1 >= len(self.buf)
            or self.buf[self.pos] != 0xFF
            or self.buf[self.pos + 1] != 0xD0 + expect_m
        ):
            raise ValueError(
                f"expected RST{expect_m} marker at restart boundary"
            )
        self.pos += 2


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


def _decode_block(br, read_dc, read_ac, prev_dc, Q, A):
    """One 8x8 block: Huffman decode, dezigzag, dequantize, IDCT.
    Returns (pixel block float64 + 128 level shift, new_dc)."""
    import numpy as np

    zz = [0] * 64
    t = read_dc(br)
    diff = _extend(br.bits(t), t) if t else 0
    dc = prev_dc + diff
    zz[0] = dc
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
    return A.T @ S @ A + 128.0, dc


def _coef_grid(plane, Q, A, pad_to):
    """Quantized zigzag coefficient grid for one component plane:
    (ny, nx, 64) int64, plane edge-padded to ``pad_to`` blocks."""
    import numpy as np

    ph, pw = pad_to[0] * 8, pad_to[1] * 8
    h, w = plane.shape
    pad = np.pad(
        np.asarray(plane, dtype=np.int64),
        ((0, ph - h), (0, pw - w)),
        mode="edge",
    )
    ny, nx = pad_to
    f = (
        pad.reshape(ny, 8, nx, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    # per-block 2D matmul, exactly _encode_block's product: a vectorized
    # einsum DCT sums in a different float order and can quantize a
    # coefficient sitting on a .5 boundary differently — the progressive
    # and baseline encoders must agree on the coefficients so the two
    # decodes are bit-identical (pinned by the agreement tests)
    S = np.zeros((ny, nx, 8, 8))
    for byi in range(ny):
        for bxi in range(nx):
            S[byi, bxi] = A @ f[byi, bxi] @ A.T
    q = np.round(S / Q).astype(np.int64).reshape(ny, nx, 64)
    return q[:, :, _ZIGZAG]


def encode_jpeg_progressive(y, cb=None, cr=None, quant=None) -> bytes:
    """Encode PROGRESSIVE (SOF2) JPEG — grayscale, or YCbCr 4:2:0 when
    ``cb``/``cr`` (half-resolution planes) are given — using a
    libjpeg-style script with BOTH progressive modes: spectral
    selection (DC scan, split AC bands) and successive approximation
    (first scans at Al > 0, then one-bit refinement scans with EOBRUN
    and buffered correction bits). Scan-local canonical Huffman tables
    are declared in a DHT right before each SOS."""
    import numpy as np

    if quant is None:
        quant = [1] * 64
    Q = np.asarray(quant, dtype=np.int64).reshape(8, 8)
    A = _dct_matrix()
    ya = np.asarray(y, dtype=np.int64)
    h, w = ya.shape
    color = cb is not None
    if color:
        hmax = vmax = 2
        mcus_x = (w + 15) // 16
        mcus_y = (h + 15) // 16
        planes = {
            1: (ya, 2, 2),
            2: (np.asarray(cb, dtype=np.int64), 1, 1),
            3: (np.asarray(cr, dtype=np.int64), 1, 1),
        }
    else:
        hmax = vmax = 1
        mcus_x = (w + 7) // 8
        mcus_y = (h + 7) // 8
        planes = {1: (ya, 1, 1)}
    grids: dict[int, "np.ndarray"] = {}
    du: dict[int, tuple[int, int]] = {}
    geom: dict[int, tuple[int, int]] = {}
    for cid, (plane, hs, vs) in planes.items():
        pad_to = (mcus_y * vs, mcus_x * hs)
        grids[cid] = _coef_grid(plane, Q, A, pad_to)
        cw = (w * hs + hmax - 1) // hmax
        chh = (h * vs + vmax - 1) // vmax
        du[cid] = ((chh + 7) // 8, (cw + 7) // 8)
        geom[cid] = (hs, vs)

    # libjpeg-flavoured script: (comp_ids, Ss, Se, Ah, Al)
    if color:
        script = [
            ([1, 2, 3], 0, 0, 0, 1),
            ([1], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([3], 1, 63, 0, 1),
            ([1], 6, 63, 0, 2),
            ([1], 1, 63, 2, 1),
            ([1, 2, 3], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([3], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([1], 0, 0, 0, 1),
            ([1], 1, 5, 0, 2),
            ([1], 6, 63, 0, 2),
            ([1], 1, 63, 2, 1),
            ([1], 1, 63, 1, 0),
            ([1], 0, 0, 1, 0),
        ]

    def run_scan(cids, Ss, Se, Ah, Al, writer, dc_codes, ac_codes):
        if Ss == 0:  # DC scan
            preds = {cid: 0 for cid in cids}
            if len(cids) > 1:
                blocks = [
                    (cid, my * geom[cid][1] + v, mx * geom[cid][0] + u)
                    for my in range(mcus_y)
                    for mx in range(mcus_x)
                    for cid in cids
                    for v in range(geom[cid][1])
                    for u in range(geom[cid][0])
                ]
            else:
                cid0 = cids[0]
                blocks = [
                    (cid0, byi, bxi)
                    for byi in range(du[cid0][0])
                    for bxi in range(du[cid0][1])
                ]
            for cid, byi, bxi in blocks:
                dc = int(grids[cid][byi, bxi, 0])
                if Ah == 0:
                    val = dc >> Al  # arithmetic shift per G.1.2.1
                    diff = val - preds[cid]
                    preds[cid] = val
                    t = _category(diff)
                    writer.sym_dc(t, dc_codes)
                    if t:
                        writer.bits(_amplitude(diff, t), t)
                else:  # refinement: bit Al, raw
                    writer.bits((dc >> Al) & 1, 1)
            return
        cid0 = cids[0]
        enc_cls = _AcFirstEncoder if Ah == 0 else _AcRefineEncoder
        enc = enc_cls(writer, Ss, Se, Al, ac_codes)
        for byi in range(du[cid0][0]):
            for bxi in range(du[cid0][1]):
                enc.block(grids[cid0][byi, bxi])
        enc.finish()

    out = b"\xff\xd8"
    zz_quant = bytes(int(Q.flat[_ZIGZAG[i]]) for i in range(64))
    out += _seg(0xFFDB, b"\x00" + zz_quant)
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for cid, (_, hs, vs) in planes.items():
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(0xFFC2, sof)  # SOF2: progressive DCT, Huffman
    for cids, Ss, Se, Ah, Al in script:
        # pass 1: symbols only
        w1 = _ScanWriter()
        run_scan(cids, Ss, Se, Ah, Al, w1, {}, {})
        dc_bits, dc_vals = _uniform_table(w1.dc_syms or {0})
        ac_bits, ac_vals = _uniform_table(w1.ac_syms or {0})
        dc_codes = _codes_from_table(dc_bits, dc_vals)
        ac_codes = _codes_from_table(ac_bits, ac_vals)
        # pass 2: real bits
        w2 = _ScanWriter()
        w2.bw = _BitWriter()
        run_scan(cids, Ss, Se, Ah, Al, w2, dc_codes, ac_codes)
        data = w2.bw.flush()
        dht = b""
        if Ss == 0 and Ah == 0:
            dht += b"\x00" + bytes(dc_bits) + bytes(dc_vals)
        if Ss != 0:
            dht += b"\x11" + bytes(ac_bits) + bytes(ac_vals)
        if dht:
            out += _seg(0xFFC4, dht)
        sos = bytes([len(cids)])
        for cid in cids:
            sos += bytes([cid, 0x01 if Ss != 0 else 0x00])
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        out += _seg(0xFFDA, sos)
        out += data
    out += b"\xff\xd9"
    return out


# --- progressive scan coding (T.81 G.1/G.2) ---------------------------
#
# Progressive JPEG splits the coefficients across SCANS two ways:
# spectral selection (a zigzag band [Ss, Se] per scan; DC always alone)
# and successive approximation (first scan codes value >> Al, later
# scans refine one bit at a time, Ah = previous Al). AC first scans add
# EOBRUN (an end-of-band RUN across blocks); AC refinement scans weave
# CORRECTION BITS for already-nonzero coefficients between the newly-
# nonzero symbols — the encoder buffers them (libjpeg's BE buffer) so
# decode order matches. Coefficients live in zigzag index space until
# the final dequantize+IDCT.


def _dc_first_decode(br, read_dc, coefs, pred, Al):
    t = read_dc(br)
    diff = _extend(br.bits(t), t) if t else 0
    pred += diff
    coefs[0] = pred << Al
    return pred


def _ac_first_decode(br, read_ac, coefs, Ss, Se, Al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        sym = read_ac(br)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > Se:
            raise ValueError("AC band overflow in progressive scan")
        coefs[k] = _extend(br.bits(s), s) << Al
        k += 1
    return eobrun


def _ac_refine_decode(br, read_ac, coefs, Ss, Se, Al, eobrun):
    """libjpeg decode_mcu_AC_refine: newly-nonzero coefficients arrive
    as (run, 1) symbols whose run counts ZERO-HISTORY positions only;
    every nonzero-history coefficient passed over consumes one
    correction bit (Python's & on negative ints is two's complement,
    matching the C code)."""
    p1 = 1 << Al
    m1 = -p1
    k = Ss
    if eobrun == 0:
        while k <= Se:
            sym = read_ac(br)
            r, s = sym >> 4, sym & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad size in AC refinement scan")
                val = p1 if br.bit() else m1
            while k <= Se:
                if coefs[k] != 0:
                    if br.bit() and (coefs[k] & p1) == 0:
                        coefs[k] += p1 if coefs[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= Se:
                coefs[k] = val
            k += 1
    if eobrun > 0:
        while k <= Se:
            if coefs[k] != 0:
                if br.bit() and (coefs[k] & p1) == 0:
                    coefs[k] += p1 if coefs[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


class _ScanWriter:
    """Two-pass scan emission: pass 1 records symbols (to build the
    scan's canonical tables), pass 2 writes real bits."""

    def __init__(self):
        self.dc_syms: set[int] = set()
        self.ac_syms: set[int] = set()
        self.bw = None  # pass 1: None; pass 2: _BitWriter

    def sym_dc(self, sym, codes):
        self.dc_syms.add(sym)
        if self.bw is not None:
            c, ln = codes[sym]
            self.bw.put(c, ln)

    def sym_ac(self, sym, codes):
        self.ac_syms.add(sym)
        if self.bw is not None:
            c, ln = codes[sym]
            self.bw.put(c, ln)

    def bits(self, v, n):
        if self.bw is not None and n:
            self.bw.put(v, n)


def _amplitude(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


class _AcFirstEncoder:
    def __init__(self, w: _ScanWriter, Ss, Se, Al, ac_codes):
        self.w, self.Ss, self.Se, self.Al = w, Ss, Se, Al
        self.codes = ac_codes
        self.eobrun = 0

    def _flush_eob(self):
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            self.w.sym_ac(nbits << 4, self.codes)
            self.w.bits(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0

    def block(self, coefs):
        Al = self.Al
        r = 0
        wrote = False
        for k in range(self.Ss, self.Se + 1):
            v = coefs[k]
            t = (abs(v) >> Al)
            if t == 0:
                r += 1
                continue
            self._flush_eob()
            while r > 15:
                self.w.sym_ac(0xF0, self.codes)
                r -= 16
            if v < 0:
                t = -t
            s = _category(t)
            self.w.sym_ac((r << 4) | s, self.codes)
            self.w.bits(_amplitude(t, s), s)
            r = 0
            wrote = True
        if r > 0 or not wrote:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self._flush_eob()

    def finish(self):
        self._flush_eob()


class _AcRefineEncoder:
    """libjpeg encode_mcu_AC_refine: correction bits buffer behind the
    symbol that jumps over them (BE buffer), EOBRUN carries pending
    correction bits across blocks."""

    def __init__(self, w: _ScanWriter, Ss, Se, Al, ac_codes):
        self.w, self.Ss, self.Se, self.Al = w, Ss, Se, Al
        self.codes = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits behind the EOBRUN

    def _flush_eob(self):
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            self.w.sym_ac(nbits << 4, self.codes)
            self.w.bits(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.pending:
            self.w.bits(b, 1)
        self.pending = []

    def block(self, coefs):
        Al = self.Al
        absv = [abs(coefs[k]) >> Al for k in range(self.Ss, self.Se + 1)]
        eob = 0  # index AFTER the last newly-nonzero coefficient
        for i, t in enumerate(absv):
            if t == 1:
                eob = i + 1
        r = 0
        br_bits: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i < eob:
                self._flush_eob()
                self.w.sym_ac(0xF0, self.codes)
                r -= 16
                for b in br_bits:
                    self.w.bits(b, 1)
                br_bits = []
            if t > 1:  # history coefficient: buffer its correction bit
                br_bits.append(t & 1)
                continue
            # newly nonzero (t == 1)
            self._flush_eob()
            self.w.sym_ac((r << 4) | 1, self.codes)
            self.w.bits(1 if coefs[self.Ss + i] > 0 else 0, 1)
            for b in br_bits:
                self.w.bits(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            self.eobrun += 1
            self.pending.extend(br_bits)
            if self.eobrun == 0x7FFF:
                self._flush_eob()

    def finish(self):
        self._flush_eob()


def decode_jpeg(raw: bytes):
    """Decode a baseline (SOF0) or PROGRESSIVE (SOF2) JPEG. Grayscale
    (one component) returns an (h, w) uint8 array — unchanged contract;
    COLOR (three components, 4:2:0/4:2:2/4:4:4) returns a (y, cb, cr)
    tuple of (h, w) uint8 planes, chroma upsampled by pixel replication
    (convert with :func:`ycbcr_to_rgb`). Interleaved MCU scans per
    T.81 A.2.3 with per-component DC predictors; progressive streams
    support full spectral selection + successive approximation
    (EOBRUN, AC refinement correction bits)."""
    import numpy as np

    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")

    def entropy_end(start: int) -> int:
        i = start
        n = len(raw)
        while i + 1 < n:
            if raw[i] != 0xFF:
                i += 1
            elif raw[i + 1] == 0x00 or 0xD0 <= raw[i + 1] <= 0xD7:
                i += 2
            else:
                return i
        return n

    pos = 2
    quants: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, hs, vs, tq)
    scan: list[tuple[int, int, int]] = []  # (cid, td, ta)
    data_start = None
    progressive = False
    ri = 0  # DRI restart interval, in MCUs (0 = none)
    coefs: dict[int, "np.ndarray"] | None = None  # cid -> (by, bx, 64) zigzag
    du: dict[int, tuple[int, int]] = {}  # cid -> non-interleaved block grid
    geom: dict[int, tuple[int, int]] = {}
    preds_hist: dict[int, int] = {}
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3):
                raise ValueError(
                    "only 8-bit 1- or 3-component JPEG supported"
                )
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            if nc == 1 and (comps[0][1], comps[0][2]) != (1, 1):
                raise ValueError("subsampled single-component scan")
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG coding process (extended/lossless/"
                "arithmetic)"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                huff[(tc, th)] = (bits, vals)
                off += 17 + n
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scomp = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0xF)
                for c in range(ns)
            ]
            if not progressive:
                if ns != len(comps):
                    raise ValueError("partial-component scan unsupported")
                scan = scomp
                data_start = pos + 2 + ln
                break
            # ---- progressive: apply this scan immediately ----
            if ri:
                raise ValueError(
                    "restart intervals in progressive streams unsupported"
                )
            Ss, Se = body[1 + 2 * ns], body[2 + 2 * ns]
            Ah, Al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            if coefs is None:
                hmax = max(hs for _, hs, _, _ in comps)
                vmax = max(vs for _, _, vs, _ in comps)
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                for cid, hs, vs, _ in comps:
                    coefs = coefs or {}
                    coefs[cid] = np.zeros(
                        (mcus_y * vs, mcus_x * hs, 64), dtype=np.int64
                    )
                    cw = (w * hs + hmax - 1) // hmax
                    chh = (h * vs + vmax - 1) // vmax
                    du[cid] = ((chh + 7) // 8, (cw + 7) // 8)
                    geom[cid] = (hs, vs)
                preds_hist = {cid: 0 for cid, *_ in comps}
            dend = entropy_end(pos + 2 + ln)
            br = _BitReader(raw[pos + 2 + ln : dend])
            if Ss == 0:  # DC scan (interleaved or single-component)
                if Se != 0:
                    raise ValueError("DC scan must have Se = 0")
                if Ah == 0:
                    rd = {
                        cid: _huff_decoder(*huff[(0, td)])
                        for cid, td, _ in scomp
                    }
                    preds = {cid: 0 for cid, _, _ in scomp}
                if len(scomp) > 1:
                    blocks_iter = (
                        (cid, my * vs + v, mx * hs + u)
                        for my in range(mcus_y)
                        for mx in range(mcus_x)
                        for cid, _, _ in scomp
                        for v in range(geom[cid][1])
                        for u in range(geom[cid][0])
                        for hs, vs in (geom[cid],)
                    )
                else:
                    cid0 = scomp[0][0]
                    blocks_iter = (
                        (cid0, byi, bxi)
                        for byi in range(du[cid0][0])
                        for bxi in range(du[cid0][1])
                    )
                for cid, byi, bxi in blocks_iter:
                    cf = coefs[cid][byi, bxi]
                    if Ah == 0:
                        preds[cid] = _dc_first_decode(
                            br, rd[cid], cf, preds[cid], Al
                        )
                    else:  # DC refinement: one raw bit per block
                        if br.bit():
                            cf[0] |= 1 << Al
            else:  # AC scan — always single-component (T.81 B.2.3)
                if len(scomp) != 1:
                    raise ValueError("interleaved AC progressive scan")
                cid0, _, ta = scomp[0]
                ra = _huff_decoder(*huff[(1, ta)])
                eobrun = 0
                for byi in range(du[cid0][0]):
                    for bxi in range(du[cid0][1]):
                        cf = coefs[cid0][byi, bxi]
                        if Ah == 0:
                            eobrun = _ac_first_decode(
                                br, ra, cf, Ss, Se, Al, eobrun
                            )
                        else:
                            eobrun = _ac_refine_decode(
                                br, ra, cf, Ss, Se, Al, eobrun
                            )
            pos = dend
            continue
        pos += 2 + ln

    if progressive:
        if coefs is None:
            raise ValueError("progressive JPEG with no scans")
        inv = np.empty(64, dtype=np.int64)
        inv[_ZIGZAG] = np.arange(64)
        A = _dct_matrix()
        hmax = max(hs for _, hs, _, _ in comps)
        vmax = max(vs for _, _, vs, _ in comps)
        outs = []
        for cid, hs, vs, tq in comps:
            Q = quants[tq].astype(np.float64)
            arr = coefs[cid]
            ny, nx, _ = arr.shape
            nat = arr[:, :, inv].reshape(ny, nx, 8, 8).astype(np.float64)
            S = nat * Q  # dequantize
            # per-block 2D matmul, NOT einsum/batched matmul: their
            # float summation order differs from the baseline path's
            # 8x8 dgemm, and a coefficient landing on a .5 pixel
            # boundary then rounds differently — the progressive and
            # baseline decodes of the same coefficients must be
            # bit-identical (pinned by the randomized agreement test)
            plane = np.zeros((ny * 8, nx * 8), dtype=np.float64)
            for byi in range(ny):
                for bxi in range(nx):
                    plane[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8] = (
                        A.T @ S[byi, bxi] @ A + 128.0
                    )
            p = np.clip(np.round(plane), 0, 255).astype(np.uint8)
            if hs < hmax or vs < vmax:
                p = np.repeat(
                    np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1
                )
            outs.append(p[:h, :w])
        return outs[0] if len(outs) == 1 else tuple(outs)

    if h is None or not comps or data_start is None:
        raise ValueError("JPEG missing SOF/SOS")
    # entropy data runs to the EOI marker (0xFF 0xD9), 0xFF00 unstuffed
    end = len(raw) - 2 if raw[-2:] == b"\xff\xd9" else len(raw)
    br = _BitReader(raw[data_start:end])
    A = _dct_matrix()
    by_cid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    readers = {
        cid: (
            _huff_decoder(*huff[(0, td)]),
            _huff_decoder(*huff[(1, ta)]),
        )
        for cid, td, ta in scan
    }

    if len(comps) == 1:
        cid, _, _, tq = comps[0]
        Q = quants[tq]
        rd, ra = readers[cid]
        H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        out = np.zeros((H, W), dtype=np.float64)
        prev_dc = 0
        n_mcu = 0
        for by in range(0, H, 8):
            for bx in range(0, W, 8):
                if ri and n_mcu and n_mcu % ri == 0:
                    br.restart((n_mcu // ri - 1) % 8)
                    prev_dc = 0
                blk, prev_dc = _decode_block(br, rd, ra, prev_dc, Q, A)
                out[by : by + 8, bx : bx + 8] = blk
                n_mcu += 1
        return np.clip(np.round(out), 0, 255).astype(np.uint8)[:h, :w]

    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        cid: np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    prev = {cid: 0 for cid, *_ in comps}
    order = [cid for cid, _, _ in scan]
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and n_mcu and n_mcu % ri == 0:
                br.restart((n_mcu // ri - 1) % 8)
                prev = {cid: 0 for cid, *_ in comps}
            n_mcu += 1
            for cid in order:
                hs, vs, tq = by_cid[cid]
                rd, ra = readers[cid]
                Q = quants[tq]
                for v in range(vs):
                    for u in range(hs):
                        blk, prev[cid] = _decode_block(
                            br, rd, ra, prev[cid], Q, A
                        )
                        by = (my * vs + v) * 8
                        bx = (mx * hs + u) * 8
                        planes[cid][by : by + 8, bx : bx + 8] = blk
    out = []
    for cid, hs, vs, _ in comps:
        p = np.clip(np.round(planes[cid]), 0, 255).astype(np.uint8)
        if hs < hmax or vs < vmax:  # replication upsample (JFIF default)
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w])
    return tuple(out)


def ycbcr_to_rgb(y, cb, cr):
    """JFIF YCbCr -> RGB with the floor(x + 0.5) rounding both engines
    reproduce bit-for-bit in IEEE doubles (numpy here, DuckDB in the
    oracle — the e0-suffixed literals parse to identical bits):
    R = Y + 1.402 (Cr-128); G = Y - 0.344136 (Cb-128) - 0.714136
    (Cr-128); B = Y + 1.772 (Cb-128); clip to [0, 255]."""
    import numpy as np

    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = np.floor((yf + 1.402 * crf) + 0.5)
    g = np.floor((yf - 0.344136 * cbf - 0.714136 * crf) + 0.5)
    b = np.floor((yf + 1.772 * cbf) + 0.5)
    return tuple(
        np.clip(p, 0, 255).astype(np.uint8) for p in (r, g, b)
    )


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
