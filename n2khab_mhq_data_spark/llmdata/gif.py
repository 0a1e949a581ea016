"""GIF codec — pure stdlib (no PIL).

Scope: 8-bit grayscale (256-entry gray global color table), GIF87a
single image plus GIF89a ANIMATION (multi-frame with Graphic Control
Extensions: per-frame delays, transparency, disposal leave/restore-to-
background, sub-rect compositing); no interlace, no local color
tables, disposal 3 raises — the lossless LZW tier of the
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


def _lzw_encode(pixels: list[int]) -> bytearray:
    """GIF-variant LZW compress of an 8-bit pixel sequence to packed
    bytes (shared by the 87a single-frame and 89a animation encoders).

    First produce the CODE SEQUENCE with the encoder's string table,
    resetting via CLEAR before the table can overflow 12-bit codes."""
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
    return data


def _sub_blocks(data: bytes) -> bytearray:
    out = bytearray()
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00"  # block terminator
    return out


def encode_gif(img) -> bytes:
    """Encode an 8-bit grayscale image as single-frame GIF87a
    (lossless)."""
    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    h, w = a.shape
    data = _lzw_encode(a.reshape(-1).tolist())

    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # screen descriptor
    for i in range(256):  # gray global color table
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(_MIN_CODE)
    out += _sub_blocks(data)
    out += b"\x3b"  # trailer
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int) -> bytearray:
    """GIF-variant LZW decompress of packed sub-block payload bytes
    (shared by the single-frame and animation decoders)."""
    clear = 1 << min_code
    eoi = clear + 1
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
    return out


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

    out = _lzw_decode(data, min_code)
    if len(out) != w * h:
        raise ValueError("GIF pixel count mismatch")
    lum = np.array(palette, dtype=np.uint8)
    idx = np.frombuffer(bytes(out), dtype=np.uint8)
    return lum[idx].reshape(h, w)


def encode_gif_frames(
    frames: list,
    delays_cs: list[int],
    canvas: tuple[int, int] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    transparent: int | None = None,
    loop: bool = True,
) -> bytes:
    """Encode an ANIMATED grayscale GIF89a: one Graphic Control
    Extension (delay in centiseconds, disposal 1 = leave-in-place,
    optional transparent index) per frame, frames may be SUB-RECTS of
    the canvas positioned by ``offsets`` (top, left) — the real
    compositing structure animated GIFs use. ``loop`` adds the NETSCAPE
    2.0 looping application extension. Pixel values equal to
    ``transparent`` are left showing whatever the previous frames
    composited there."""
    import numpy as np

    fr = [np.asarray(f, dtype=np.uint8) for f in frames]
    offsets = offsets or [(0, 0)] * len(fr)
    if canvas is None:
        ch = max(t + f.shape[0] for f, (t, _) in zip(fr, offsets))
        cw = max(le + f.shape[1] for f, (_, le) in zip(fr, offsets))
    else:
        ch, cw = canvas
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", cw, ch, 0xF7, 0, 0)
    for i in range(256):  # gray global color table
        out += bytes((i, i, i))
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f, delay, (top, left) in zip(fr, delays_cs, offsets):
        h, w = f.shape
        flags = 0x04 | (0x01 if transparent is not None else 0x00)
        out += b"\x21\xf9\x04" + bytes(
            [flags, delay & 0xFF, (delay >> 8) & 0xFF,
             transparent if transparent is not None else 0]
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        out.append(_MIN_CODE)
        out += _sub_blocks(_lzw_encode(f.reshape(-1).tolist()))
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(raw: bytes):
    """Decode an animated grayscale GIF89a (or a single-frame 87a) to
    ``(delays_cs, frames)`` — one FULL-CANVAS composited snapshot per
    image block. GCE semantics honored: per-frame delay, transparency
    (transparent pixels keep the prior composite), disposal 1/0 = leave
    in place, disposal 2 = restore to the background color before the
    NEXT frame; disposal 3 (restore-to-previous) raises. Interlace and
    local color tables raise, as in :func:`decode_gif`."""
    import numpy as np

    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        palette = [raw[pos + 3 * i] for i in range(size)]  # red channel
        pos += 3 * size
    if palette is None:
        raise ValueError("GIF missing global color table")
    canvas = np.full((sh, sw), bg, dtype=np.uint16)  # color INDICES
    frames: list["np.ndarray"] = []
    delays: list[int] = []
    lum = np.array(palette, dtype=np.uint8)
    # pending GCE state for the next image block
    delay = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(raw):
        b = raw[pos]
        if b == 0x21:  # extension
            label = raw[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                blen = raw[pos]
                flags = raw[pos + 1]
                delay = raw[pos + 2] | (raw[pos + 3] << 8)
                transparent = raw[pos + 4] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
                if disposal == 3:
                    raise ValueError(
                        "GIF disposal 3 (restore-to-previous) unsupported"
                    )
                pos += 1 + blen
            while raw[pos] != 0:  # skip (remaining) sub-blocks
                pos += 1 + raw[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from(
                "<HHHHB", raw, pos + 1
            )
            pos += 10
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if ipacked & 0x80:
                raise ValueError("local color tables unsupported")
            min_code = raw[pos]
            pos += 1
            data = bytearray()
            while raw[pos] != 0:
                ln = raw[pos]
                data += raw[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            out = _lzw_decode(data, min_code)
            if len(out) != w * h:
                raise ValueError("GIF pixel count mismatch")
            idx = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w)
            region = canvas[top : top + h, left : left + w]
            if transparent is not None:
                region[idx != transparent] = idx[idx != transparent]
            else:
                region[:, :] = idx
            frames.append(lum[canvas.astype(np.intp)].copy())
            delays.append(delay)
            if disposal == 2:  # restore to background before next frame
                canvas[top : top + h, left : left + w] = bg
            delay, transparent, disposal = 0, None, 0
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block {b:#x}")
    if not frames:
        raise ValueError("GIF contains no image")
    return delays, frames
