"""GIF codec — pure stdlib (no PIL).

Scope: 8-bit indexed (256-entry color tables, luminance taken from the
red channel), GIF87a single image plus GIF89a ANIMATION (multi-frame
with Graphic Control Extensions: per-frame delays, transparency,
disposal 0/1 leave-in-place, 2 restore-to-background, 3
restore-to-previous, sub-rect compositing), INTERLACED row order
(four-pass 8/8/4/2 scatter), and LOCAL color tables overriding the
global one per image — the lossless LZW tier of the multimodal decode
surface next to PNG/WAV/JPEG (`llmdata/multimodal.py`,
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

# Decompression-bomb guard shared by the media decoders: dims are
# attacker-controlled 16/32-bit header fields, and both GIF canvases
# and RLE BMPs allocate the full (h, w) array BEFORE any pixel data is
# validated (sparse streams are legal, so stream length cannot bound
# the canvas). 2^26 px = 64 MiB uint8 — far above any real corpus
# image, far below the 4 GiB a hostile 65535 x 65535 header claims.
_MAX_PIXELS = 1 << 26
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


def interlace_order(h: int) -> list[int]:
    """Destination row index per TRANSMITTED row of an interlaced image:
    the GIF87a four-pass schedule (every 8th row from 0, every 8th from
    4, every 4th from 2, every 2nd from 1). Shared by the encoder (which
    writes rows in this order) and the decoders (which scatter them
    back)."""
    order: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def encode_gif(
    img,
    interlace: bool = False,
    local_palette: list[int] | None = None,
) -> bytes:
    """Encode a single-frame GIF87a (lossless). Without
    ``local_palette``, ``img`` holds 8-bit GRAY VALUES stored through
    the identity gray global color table. With ``local_palette`` (256
    luminance entries), ``img`` holds COLOR-TABLE INDICES, the screen
    descriptor carries NO global table, and the image block emits the
    palette as a LOCAL color table (entry i = (p[i], p[i], p[i])) — the
    decoded luminance is ``local_palette[img]``. ``interlace=True``
    transmits rows in the four-pass interlaced order and sets the
    interlace flag."""
    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    h, w = a.shape
    rows = a[interlace_order(h)] if interlace else a
    data = _lzw_encode(rows.reshape(-1).tolist())

    out = bytearray(b"GIF87a")
    if local_palette is None:
        out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table
        for i in range(256):  # gray global color table
            out += bytes((i, i, i))
    else:
        if len(local_palette) != 256:
            raise ValueError("local_palette must have 256 entries")
        out += struct.pack("<HHBBB", w, h, 0x07, 0, 0)  # no global table
    ipacked = (0x40 if interlace else 0) | (
        0x87 if local_palette is not None else 0
    )
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_palette is not None:
        for p in local_palette:
            out += bytes((p, p, p))
    out.append(_MIN_CODE)
    out += _sub_blocks(data)
    out += b"\x3b"  # trailer
    return bytes(out)


def _lzw_decode(
    data: bytes, min_code: int, max_out: int | None = None
) -> bytearray:
    """GIF-variant LZW decompress of packed sub-block payload bytes
    (shared by the single-frame and animation decoders). ``max_out``
    fails loud the moment output exceeds the caller's expected pixel
    count: LZW expansion is ~quadratic in input bytes (each code can
    emit a dictionary string that grew one byte per prior code), so a
    64 KB hostile stream could otherwise inflate to GiB before the
    caller's pixel-count check ever ran (r11 adversarial review)."""
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
        if max_out is not None and len(out) > max_out:
            raise ValueError("GIF LZW output exceeds declared pixel count")
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


def _u8(raw: bytes, pos: int) -> int:
    """Bounds-checked byte read: a truncated stream is the codec's
    ValueError contract, not a bare IndexError (ADVICE r9)."""
    if pos >= len(raw):
        raise ValueError("GIF stream truncated")
    return raw[pos]


def _skip_sub_blocks(raw: bytes, pos: int) -> int:
    """Skip a sub-block chain, returning the position after its
    terminator. Bounds-checked."""
    while _u8(raw, pos) != 0:
        pos += 1 + raw[pos]
    return pos + 1


def _read_sub_blocks(raw: bytes, pos: int) -> tuple[bytearray, int]:
    """Concatenate a sub-block chain's payload bytes; bounds-checked so
    truncation raises ValueError rather than IndexError."""
    data = bytearray()
    while _u8(raw, pos) != 0:
        ln = raw[pos]
        if pos + 1 + ln > len(raw):
            raise ValueError("GIF stream truncated")
        data += raw[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    return data, pos + 1


def _read_image_block(raw: bytes, pos: int, global_palette):
    """Parse one image block starting at its 0x2C introducer: descriptor,
    optional LOCAL color table (overrides the global one for this image),
    LZW pixel data, interlace scatter. Returns
    ``(left, top, idx, palette, pos_after)`` where ``idx`` is the (h, w)
    uint8 index array and ``palette`` the luminance table (red channel)
    in effect for this image."""
    import numpy as np

    if pos + 10 > len(raw):
        raise ValueError("GIF stream truncated")
    left, top, w, h, ipacked = struct.unpack_from("<HHHHB", raw, pos + 1)
    pos += 10
    palette = global_palette
    if ipacked & 0x80:  # local color table
        size = 2 << (ipacked & 0x07)
        if pos + 3 * size > len(raw):
            raise ValueError("GIF stream truncated")
        palette = [raw[pos + 3 * i] for i in range(size)]  # red channel
        pos += 3 * size
    if palette is None:
        raise ValueError("GIF image has neither global nor local color table")
    min_code = _u8(raw, pos)
    pos += 1
    data, pos = _read_sub_blocks(raw, pos)
    if w * h > _MAX_PIXELS:
        raise ValueError("GIF dimensions exceed decompression-bomb guard")
    out = _lzw_decode(bytes(data), min_code, max_out=w * h)
    if len(out) != w * h:
        raise ValueError("GIF pixel count mismatch")
    idx = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w)
    if ipacked & 0x40:  # interlaced: scatter transmitted rows back
        de = np.empty_like(idx)
        de[interlace_order(h)] = idx
        idx = de
    return left, top, idx, palette, pos


def decode_gif(raw: bytes):
    """Decode a single-frame GIF87a/89a to an (h, w) uint8 luminance
    array. The color table in effect (LOCAL if the image carries one,
    else global) maps through to luminance via its red channel (our
    encoders write gray p,p,p); extensions are skipped; interlaced row
    order is scattered back."""
    import numpy as np

    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(raw) < 13:
        raise ValueError("GIF stream truncated")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if pos + 3 * size > len(raw):
            raise ValueError("GIF stream truncated")
        palette = [raw[pos + 3 * i] for i in range(size)]  # red channel
        pos += 3 * size
    while True:
        b = _u8(raw, pos)
        if b == 0x21:  # extension: label + sub-blocks
            pos = _skip_sub_blocks(raw, pos + 2)
        elif b == 0x2C:
            break
        elif b == 0x3B:
            raise ValueError("GIF contains no image")
        else:
            raise ValueError(f"unexpected GIF block {b:#x}")
    _l, _t, idx, palette, _pos = _read_image_block(raw, pos, palette)
    lum = np.array(palette, dtype=np.uint8)
    if int(idx.max(initial=0)) >= len(lum):
        raise ValueError("GIF pixel index outside color table")
    return lum[idx]


def encode_gif_frames(
    frames: list,
    delays_cs: list[int],
    canvas: tuple[int, int] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    transparent: int | None = None,
    loop: bool = True,
    disposals: list[int] | None = None,
) -> bytes:
    """Encode an ANIMATED grayscale GIF89a: one Graphic Control
    Extension (delay in centiseconds, per-frame ``disposals`` — default
    1 = leave-in-place; 2 = restore-to-background, 3 = restore-to-
    previous — and an optional transparent index) per frame, frames may
    be SUB-RECTS of the canvas positioned by ``offsets`` (top, left) —
    the real compositing structure animated GIFs use. ``loop`` adds the
    NETSCAPE 2.0 looping application extension. Pixel values equal to
    ``transparent`` are left showing whatever the previous frames
    composited there."""
    import numpy as np

    fr = [np.asarray(f, dtype=np.uint8) for f in frames]
    offsets = offsets or [(0, 0)] * len(fr)
    disposals = disposals if disposals is not None else [1] * len(fr)
    if (
        len(delays_cs) != len(fr)
        or len(offsets) != len(fr)
        or len(disposals) != len(fr)
    ):
        # zip() would silently DROP frames on a mismatched call
        raise ValueError(
            f"encode_gif_frames: {len(fr)} frames but "
            f"{len(delays_cs)} delays / {len(offsets)} offsets /"
            f" {len(disposals)} disposals"
        )
    if any(d not in (0, 1, 2, 3) for d in disposals):
        raise ValueError("GIF disposal methods are 0..3")
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
    for f, delay, (top, left), disp in zip(
        fr, delays_cs, offsets, disposals
    ):
        h, w = f.shape
        flags = (disp << 2) | (0x01 if transparent is not None else 0x00)
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
    """Decode an animated GIF89a (or a single-frame 87a) to
    ``(delays_cs, frames)`` — one FULL-CANVAS composited LUMINANCE
    snapshot per image block. GCE semantics honored: per-frame delay,
    transparency (transparent pixels keep the prior composite),
    disposal 1/0 = leave in place, disposal 2 = restore the sub-rect to
    the background color before the NEXT frame, disposal 3 = restore
    the whole canvas to its pre-frame state. Interlaced images are
    scattered back and LOCAL color tables override the global one, as
    in :func:`decode_gif`. The canvas composites in LUMINANCE space
    (each image's indices map through ITS palette at draw time), so
    frames with different local palettes composite correctly."""
    import numpy as np

    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(raw) < 13:
        raise ValueError("GIF stream truncated")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    palette = None
    bg_lum = 0
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if pos + 3 * size > len(raw):
            raise ValueError("GIF stream truncated")
        palette = [raw[pos + 3 * i] for i in range(size)]  # red channel
        pos += 3 * size
        # tolerate an out-of-range background index (GIMP and other
        # encoders write junk bg bytes when no frame exposes the
        # background): real decoders render such files fine, so treat
        # the background as black instead of rejecting the whole file —
        # the r9 ADVICE's actual hazard (a numpy IndexError on
        # lum[bg]) stays fixed either way
        bg_lum = palette[bg] if bg < size else 0
    if sw * sh > _MAX_PIXELS:
        raise ValueError("GIF canvas exceeds decompression-bomb guard")
    canvas = np.full((sh, sw), bg_lum, dtype=np.uint8)  # LUMINANCE
    frames: list["np.ndarray"] = []
    delays: list[int] = []
    # pending GCE state for the next image block
    delay = 0
    transparent: int | None = None
    disposal = 0
    while True:
        b = _u8(raw, pos)
        if b == 0x21:  # extension
            label = _u8(raw, pos + 1)
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                if pos + 5 > len(raw):
                    raise ValueError("GIF stream truncated")
                blen = raw[pos]
                flags = raw[pos + 1]
                delay = raw[pos + 2] | (raw[pos + 3] << 8)
                transparent = raw[pos + 4] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
                pos += 1 + blen
            pos = _skip_sub_blocks(raw, pos)
        elif b == 0x2C:  # image descriptor
            left, top, idx, pal, pos = _read_image_block(raw, pos, palette)
            h, w = idx.shape
            if top + h > sh or left + w > sw:
                raise ValueError("GIF image rect outside logical screen")
            lum = np.array(pal, dtype=np.uint8)
            if int(idx.max(initial=0)) >= len(lum):
                raise ValueError("GIF pixel index outside color table")
            saved = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + h, left : left + w]
            vals = lum[idx]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = vals[mask]
            else:
                region[:, :] = vals
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:  # restore sub-rect to background
                canvas[top : top + h, left : left + w] = bg_lum
            elif disposal == 3:  # restore whole canvas to pre-frame state
                canvas = saved
            delay, transparent, disposal = 0, None, 0
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block {b:#x}")
    if not frames:
        raise ValueError("GIF contains no image")
    return delays, frames
