"""GIF87a codec — pure stdlib (no PIL).

Scope: 8-bit grayscale (256-entry gray global color table), single
image, no interlace, no extensions — the lossless LZW tier of the
multimodal decode surface next to PNG/WAV/JPEG (`llmdata/multimodal.py`,
`llmdata/jpeg.py`). GIF's LZW variant per the GIF87a specification:

- codes packed LSB-first into 255-byte-max data sub-blocks;
- initial code width = min_code_size + 1 (9 for 8-bit); CLEAR =
  1 << min_code_size, EOI = CLEAR + 1; first dynamic code = EOI + 1;
- code width grows when the next free code reaches 1 << width
  (standard deferred change, NOT the "early change" variant), capped
  at 12 bits; the encoder emits CLEAR and resets when the table fills.

The decoder walks the same rules, so both our streams and conforming
third-party GIF87a grayscale streams decode; a hand-packed bitstream
test pins the LSB-first packing and code-width schedule independently
of the encoder.
"""

from __future__ import annotations

import struct

_MIN_CODE = 8
_CLEAR = 1 << _MIN_CODE  # 256
_EOI = _CLEAR + 1  # 257


def encode_gif(img) -> bytes:
    """Encode an 8-bit grayscale image as single-frame GIF87a
    (lossless)."""
    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    h, w = a.shape
    pixels = a.reshape(-1).tolist()

    # --- LZW compress (GIF variant): first produce the CODE SEQUENCE
    # with the encoder's string table, resetting via CLEAR before the
    # table can overflow 12-bit codes ---
    codes: list[int] = [_CLEAR]
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(256)}
    next_code = _EOI + 1
    cur: tuple[int, ...] = ()
    for p in pixels:
        cand = cur + (p,)
        if cand in table:
            cur = cand
            continue
        codes.append(table[cur])
        if next_code <= (1 << 12) - 1:
            # room left: assign the next 12-bit code (4095 inclusive —
            # common encoders use the full table before clearing)
            table[cand] = next_code
            next_code += 1
        else:
            # table full (4096 entries): emit CLEAR on the next miss so
            # every assigned code, including 4095, had a chance to match
            codes.append(_CLEAR)
            table = {(i,): i for i in range(256)}
            next_code = _EOI + 1
        cur = (p,)
    if cur:
        codes.append(table[cur])
    codes.append(_EOI)

    # --- pack LSB-first, with widths following the DECODER's schedule:
    # the decoder adds its table entry one code later than the encoder
    # did, so widths must be chosen by simulating its (next_free,
    # width) state — the classic GIF LZW off-by-one ---
    data = bytearray()
    acc = 0
    nbits = 0
    width = _MIN_CODE + 1
    next_free = _EOI + 1
    fresh = True  # no decoder-side add on the first code after CLEAR
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == _CLEAR:
            width = _MIN_CODE + 1
            next_free = _EOI + 1
            fresh = True
        elif code != _EOI:
            if fresh:
                fresh = False
            else:
                next_free += 1
                if next_free == (1 << width) and width < 12:
                    width += 1
    if nbits:
        data.append(acc & 0xFF)

    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # screen descriptor
    for i in range(256):  # gray global color table
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(_MIN_CODE)
    for i in range(0, len(data), 255):  # data sub-blocks
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(raw: bytes):
    """Decode a single-frame grayscale GIF87a/89a to an (h, w) uint8
    array. The color table maps through to luminance via its red
    channel (our encoder writes gray i,i,i); extensions are skipped;
    interlace and local color tables raise."""
    import numpy as np

    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        palette = [raw[pos + 3 * i] for i in range(size)]  # red channel
        pos += 3 * size
    while pos < len(raw):
        b = raw[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while raw[pos] != 0:
                pos += 1 + raw[pos]
            pos += 1
        elif b == 0x2C:
            break
        elif b == 0x3B:
            raise ValueError("GIF contains no image")
        else:
            raise ValueError(f"unexpected GIF block {b:#x}")
    _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", raw, pos + 1)
    pos += 10
    if ipacked & 0x40:
        raise ValueError("interlaced GIF unsupported")
    if ipacked & 0x80:
        raise ValueError("local color tables unsupported")
    if palette is None:
        raise ValueError("GIF missing global color table")
    min_code = raw[pos]
    pos += 1
    data = bytearray()
    while raw[pos] != 0:
        ln = raw[pos]
        data += raw[pos + 1 : pos + 1 + ln]
        pos += 1 + ln

    clear = 1 << min_code
    eoi = clear + 1
    # --- LZW decompress ---
    acc = 0
    nbits = 0
    di = 0

    def read_code(cw: int) -> int:
        nonlocal acc, nbits, di
        while nbits < cw:
            if di >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[di] << nbits
            di += 1
            nbits += 8
        code = acc & ((1 << cw) - 1)
        acc >>= cw
        nbits -= cw
        return code

    width = min_code + 1
    table: list[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    out = bytearray()
    while True:
        code = read_code(width)
        if code == clear:
            table = [bytes((i,)) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("invalid GIF LZW code")
        out += entry
        # freeze the table at 4096 entries (spec: 12-bit max code):
        # encoders may legally DEFER the clear and keep emitting codes
        # from the full table — appending past 4095 would grow one
        # phantom entry per code, unbounded memory on large conforming
        # streams (real decoders stop growing and keep decoding)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) - 1 == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    if len(out) != w * h:
        raise ValueError("GIF pixel count mismatch")
    lum = np.array(palette, dtype=np.uint8)
    idx = np.frombuffer(bytes(out), dtype=np.uint8)
    return lum[idx].reshape(h, w)
