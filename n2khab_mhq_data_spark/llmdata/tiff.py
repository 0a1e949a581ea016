"""TIFF codec — pure stdlib ``struct`` (no PIL).

Scope: baseline TIFF 6.0 grayscale — 8-bit single-sample
(PhotometricInterpretation 1, BlackIsZero), BOTH byte orders
(``II`` little- and ``MM`` big-endian), multi-strip layouts
(RowsPerStrip), and the two baseline compressions every reader must
support: none (tag 259 = 1) and **PackBits** (tag 259 = 32773, the
Apple RLE every fax/scan pipeline still emits). This shrinks the r10
codec waiver the same way the BMP RLE tier did: what stays waived is
TIFF as a multi-codec CONTAINER (LZW, JPEG-in-TIFF, tiles, planar
color), each a large standalone decoder — not the baseline format,
which is a header, an IFD tag walk, and strip concatenation.

Decoded output is the raw 8-bit gray value (single sample — no
luminance transform needed), so a SQL oracle re-derives every pixel
of the arithmetic test patterns exactly.

Cross-decoder proof: OpenJDK's ``javax.imageio`` ships a TIFF plugin
since JDK 9 — ``tests/test_external_fixtures.py`` pins that an
ImageIO-encoded TIFF of the shared gradient decodes EXACTLY here
(tools/fixtures/ImageIOFixture.java generates it).
"""

from __future__ import annotations

import struct

# shared decompression-bomb ceiling — rationale at its definition
from n2khab_mhq_data_spark.llmdata.gif import _MAX_PIXELS

# baseline tag ids
_WIDTH = 256
_LENGTH = 257
_BITS = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SPP = 277
_ROWS_PER_STRIP = 278
_STRIP_COUNTS = 279

_PACKBITS = 32773


def packbits_encode(data: bytes) -> bytes:
    """PackBits (TIFF 6.0 spec / Apple): runs of >= 2 equal bytes become
    (257 - n, byte); literals become (n - 1, bytes). The encoder never
    emits the -128 noop; the decoder must accept it."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i + 1
        while j < n and data[j] == data[i] and j - i < 128:
            j += 1
        if j - i >= 2:
            out += bytes((257 - (j - i), data[i]))
            i = j
            continue
        # literal run: until the next >= 2-byte repeat or 128 bytes
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (j + 1 < n and data[j + 1] == data[j])
        ):
            j += 1
        out += bytes((j - i - 1,))
        out += data[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    """Decode exactly ``expect`` bytes of PackBits stream; anything else
    (truncation, overrun, trailing garbage mid-control) fails loud."""
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expect:
        if i >= n:
            raise ValueError("PackBits stream truncated")
        c = data[i]
        i += 1
        if c == 128:  # noop per spec
            continue
        if c < 128:  # literal of c+1 bytes
            if i + c + 1 > n:
                raise ValueError("PackBits literal truncated")
            out += data[i : i + c + 1]
            i += c + 1
        else:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("PackBits run truncated")
            out += bytes((data[i],)) * (257 - c)
            i += 1
    if len(out) != expect:
        raise ValueError("PackBits output overruns the strip size")
    return bytes(out)


def encode_tiff(
    img,
    byte_order: str = "<",
    rows_per_strip: int | None = None,
    packbits: bool = False,
) -> bytes:
    """Encode an (h, w) uint8 gray array as baseline TIFF 6.0 —
    ``byte_order`` '<' writes ``II`` (little-endian), '>' writes ``MM``;
    ``rows_per_strip`` defaults to the whole image in one strip;
    ``packbits=True`` compresses each strip independently (tag 32773),
    as the spec requires — a run never crosses a strip boundary."""
    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 2 or a.shape[0] == 0 or a.shape[1] == 0:
        raise ValueError("TIFF encoder needs a non-empty 2-D gray array")
    if byte_order not in ("<", ">"):
        raise ValueError("byte_order must be '<' (II) or '>' (MM)")
    h, w = a.shape
    rps = rows_per_strip or h
    if rps <= 0:
        raise ValueError("rows_per_strip must be positive")
    strips = []
    for r0 in range(0, h, rps):
        raw = a[r0 : r0 + rps].tobytes()
        strips.append(packbits_encode(raw) if packbits else raw)

    bo = byte_order
    magic = b"II" if bo == "<" else b"MM"
    # layout: 8-byte header | strip data | IFD
    data_off = 8
    offsets, counts = [], []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        counts.append(len(s))
        pos += len(s)
    ifd_off = pos
    n_strips = len(strips)

    # values that don't fit in the 4-byte tag slot go AFTER the IFD
    entries: list[tuple[int, int, int, bytes | int]] = [
        # LONG (spec allows SHORT or LONG): tall-thin images under the
        # pixel cap can exceed 65535 in one dimension (r11 review)
        (_WIDTH, 4, 1, w),
        (_LENGTH, 4, 1, h),
        (_BITS, 3, 1, 8),
        (_COMPRESSION, 3, 1, _PACKBITS if packbits else 1),
        (_PHOTOMETRIC, 3, 1, 1),  # BlackIsZero
        (_SPP, 3, 1, 1),
        # LONG, not SHORT: rps defaults to h, and a tall-thin image
        # (h > 65535, still under the pixel cap) would silently
        # truncate a SHORT tag the decoder then trusts (r11 review)
        (_ROWS_PER_STRIP, 4, 1, rps),
    ]
    ifd_size = 2 + 12 * (len(entries) + 2) + 4
    extra_off = ifd_off + ifd_size
    extra = bytearray()

    def long_array(vals: list[int]) -> tuple[int, int, int]:
        """(type, count, offset-or-inline) for a LONG array value."""
        nonlocal extra
        if len(vals) == 1:
            return 4, 1, vals[0]
        off = extra_off + len(extra)
        for v in vals:
            extra += struct.pack(f"{bo}I", v)
        return 4, len(vals), off

    so_t, so_n, so_v = long_array(offsets)
    sc_t, sc_n, sc_v = long_array(counts)
    entries.append((_STRIP_OFFSETS, so_t, so_n, so_v))
    entries.append((_STRIP_COUNTS, sc_t, sc_n, sc_v))
    entries.sort(key=lambda e: e[0])  # spec: ascending tag order

    out = bytearray()
    out += magic + struct.pack(f"{bo}HI", 42, ifd_off)
    for s in strips:
        out += s
    out += struct.pack(f"{bo}H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:  # SHORT: value left-justified in the 4-byte slot
            out += struct.pack(f"{bo}HHI", tag, typ, cnt)
            out += struct.pack(f"{bo}HH", val, 0)
        else:  # LONG
            out += struct.pack(f"{bo}HHII", tag, typ, cnt, val)
    out += struct.pack(f"{bo}I", 0)  # next-IFD pointer: none
    out += extra
    return bytes(out)


def _read_value(raw: bytes, bo: str, typ: int, cnt: int, slot: bytes):
    """Read one IFD entry's value list (SHORT/LONG only — all a baseline
    gray file uses). The 4-byte slot holds the value(s) inline when they
    fit, else an offset."""
    unit = 2 if typ == 3 else 4
    fmt = "H" if typ == 3 else "I"
    total = unit * cnt
    if total <= 4:
        buf = slot
    else:
        (off,) = struct.unpack(f"{bo}I", slot)
        if off + total > len(raw):
            raise ValueError("TIFF value block out of bounds")
        buf = raw[off : off + total]
    return list(struct.unpack(f"{bo}{cnt}{fmt}", buf[:total]))


def decode_tiff(raw: bytes):
    """Decode a baseline grayscale TIFF (see module doc) to an (h, w)
    uint8 array. Malformed or out-of-scope input raises ValueError."""
    import numpy as np

    if len(raw) < 8:
        raise ValueError("not a TIFF payload")
    if raw[:2] == b"II":
        bo = "<"
    elif raw[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    magic, ifd_off = struct.unpack_from(f"{bo}HI", raw, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    if ifd_off + 2 > len(raw):
        raise ValueError("TIFF IFD out of bounds")
    (n_entries,) = struct.unpack_from(f"{bo}H", raw, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(raw):
        raise ValueError("TIFF IFD truncated")
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        e = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(f"{bo}HHI", raw, e)
        if typ not in (3, 4) or cnt == 0:
            # RATIONAL resolutions etc. are irrelevant; a hostile
            # cnt=0 entry must not install an empty value list that
            # IndexErrors later (fail-loud contract, r11 review)
            continue
        tags[tag] = _read_value(raw, bo, typ, cnt, raw[e + 8 : e + 12])

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w, h = one(_WIDTH), one(_LENGTH)
    if w <= 0 or h <= 0:
        raise ValueError("TIFF has non-positive dimensions")
    if w * h > _MAX_PIXELS:
        raise ValueError("TIFF dimensions exceed decompression-bomb guard")
    comp = one(_COMPRESSION, 1)
    if comp not in (1, _PACKBITS):
        raise ValueError(
            f"unsupported TIFF compression {comp} (baseline gray scope:"
            " none + PackBits; LZW/JPEG-in-TIFF stay waived)"
        )
    if one(_BITS, 1) != 8 or one(_SPP, 1) != 1:
        raise ValueError("TIFF scope is 8-bit single-sample gray")
    if one(_PHOTOMETRIC) != 1:
        raise ValueError("TIFF scope is PhotometricInterpretation 1")
    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip tables missing or mismatched")
    rps = one(_ROWS_PER_STRIP, h)
    out = bytearray()
    remaining = h
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(raw):
            raise ValueError("TIFF strip out of bounds")
        rows = min(rps, remaining)
        expect = rows * w
        strip = raw[off : off + cnt]
        if comp == _PACKBITS:
            out += packbits_decode(strip, expect)
        else:
            if cnt != expect:
                raise ValueError("TIFF strip byte count mismatch")
            out += strip
        remaining -= rows
    if remaining != 0 or len(out) != h * w:
        raise ValueError("TIFF strips do not cover the image")
    import numpy as _np

    return _np.frombuffer(bytes(out), dtype=_np.uint8).reshape(h, w)
