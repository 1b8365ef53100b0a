"""Pure-python GIF89a codec (grayscale, 256-entry palette) — the
fourth real image codec next to BMP/PNG/JPEG (:mod:`jpeg_codec`),
covering the reference camera path's remaining common wire format.

The ENCODER runs real LZW compression: string-table build, variable
code widths 9→12 bits LSB-first, CLEAR emission at table overflow,
sub-block framing. The DECODER is a full GIF-variant LZW reader —
rebuilds the string table from the stream (including the KwKwK
self-referential case), tracks width growth in lockstep with its own
table, honors CLEAR/EOI, walks sub-blocks, and skips 89a extension
blocks. Tables come from the bitstream, never shared with the
encoder's internals, so a decode bug cannot be masked by symmetric
state (the jpeg_codec discipline).

Scope (honest): single non-interlaced image, global 256-color table,
8-bit min code size. Interlaced or local-palette streams return None
(the cv2 seam), pytest-pinned.
"""

from __future__ import annotations

import struct

GIF_MAX_CODE = 4096


def encode_gif_gray(arr) -> bytes:
    """2-D uint8 array → GIF89a bytes (grayscale global palette,
    real LZW)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += b"\x08"  # LZW min code size

    clear, eoi = 256, 257
    bitbuf = 0
    nbits = 0
    codes = bytearray()

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            codes.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    pixels = a.reshape(-1).tolist()
    table: dict[bytes, int] = {}
    next_code = eoi + 1
    width = 9
    emit(clear, width)
    prefix = bytes((pixels[0],)) if pixels else b""
    for p in pixels[1:]:
        cand = prefix + bytes((p,))
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix] if len(prefix) > 1 else prefix[0], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= GIF_MAX_CODE:
            emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = 9
        prefix = bytes((p,))
    if prefix:
        emit(table[prefix] if len(prefix) > 1 else prefix[0], width)
    emit(eoi, width)
    if nbits:
        codes.append(bitbuf & 0xFF)
    for i in range(0, len(codes), 255):
        block = bytes(codes[i:i + 255])
        out += bytes((len(block),)) + block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif_gray(buf: bytes):
    """GIF bytes → 2-D uint8 gray array (palette red channel), or None
    for non-GIF / interlaced / local-palette streams."""
    import numpy as np

    if len(buf) < 13 or buf[:4] != b"GIF8" or buf[4:6] not in (b"7a", b"9a"):
        return None
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if len(buf) < pos + 3 * n:
            return None  # truncated palette
        palette = np.frombuffer(
            buf[pos:pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x3B:  # trailer
            return None
        if b0 == 0x21:  # 89a extension: label + sub-blocks
            pos += 2
            while pos < len(buf) and buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            return None
        if len(buf) < pos + 11:
            return None  # truncated image descriptor
        left, top, w, h, ipacked = struct.unpack("<HHHHB", buf[pos + 1:pos + 10])
        pos += 10
        if ipacked & 0x40:  # interlaced: cv2 seam
            return None
        if ipacked & 0x80:  # local palette: cv2 seam
            return None
        if palette is None:
            return None
        min_code = buf[pos]
        pos += 1
        data = bytearray()
        while pos < len(buf) and buf[pos]:
            n = buf[pos]
            data += buf[pos + 1:pos + 1 + n]
            pos += 1 + n
        pos += 1
        clear = 1 << min_code
        eoi = clear + 1
        # full GIF-LZW: string table rebuilt from the stream, one
        # entry behind the encoder; width grows when the decoder's own
        # next_code reaches 2^width; table caps at 4096 until CLEAR
        table: dict[int, bytes] = {i: bytes((i,)) for i in range(clear)}
        next_code = eoi + 1
        width = min_code + 1
        bitbuf = nbits = 0
        di = 0
        prev: bytes | None = None
        out = bytearray()
        while True:
            while nbits < width:
                if di >= len(data):
                    return None  # truncated stream
                bitbuf |= data[di] << nbits
                di += 1
                nbits += 8
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            nbits -= width
            if code == clear:
                table = {i: bytes((i,)) for i in range(clear)}
                next_code = eoi + 1
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    return None
            else:
                if code in table:
                    entry = table[code]
                elif code == next_code:
                    entry = prev + prev[:1]  # the KwKwK case
                else:
                    return None  # corrupt stream
                if next_code < GIF_MAX_CODE:
                    table[next_code] = prev + entry[:1]
                    next_code += 1
                    if next_code == (1 << width) and width < 12:
                        width += 1
            out += entry
            prev = entry
        if len(out) != w * h:
            return None
        idx = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w)
        return palette[idx, 0].astype(np.uint8)
    return None
