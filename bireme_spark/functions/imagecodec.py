"""Pure-python image codec: BMP (BITMAPINFOHEADER, uncompressed
24/32-bit) and PNG (8-bit gray/RGB/RGBA, all five scanline filters)
— enough to run a REAL decode stage in ``mapInPandas`` without
native codec libs. Formats per the public specs (BMP file format;
PNG RFC 2083). Exotic variants (palette, interlace, 16-bit) raise.

Decoded layout: ``(width, height, channels, pixels)`` with pixels as
row-major top-down bytes, RGB[A] or grayscale order.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed BMP from top-down row-major RGB bytes."""
    assert len(rgb) == width * height * 3
    row_size = (width * 3 + 3) & ~3
    pixel_bytes = row_size * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # BMP stores bottom-up
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        # RGB → BGR
        rows.append(bytes(b for x in range(width) for b in row[x * 3 : x * 3 + 3][::-1]) + pad)
    return header + b"".join(rows)


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    row_size = (width * nch + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        base = pixel_off + src_y * row_size
        for x in range(width):
            px = base + x * nch
            b, g, r = data[px], data[px + 1], data[px + 2]
            o = (y * width + x) * 3
            out[o], out[o + 1], out[o + 2] = r, g, b
    return width, height, 3, bytes(out)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type → samples/pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """8-bit PNG (gray/RGB/RGBA by ``channels``), filter 0 scanlines."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    if data[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(PNG_SIG)
    width = height = channels = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _PNG_CHANNELS or interlace:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={color_type} interlace={interlace}"
                )
            channels = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def decode_image(data: bytes) -> tuple[int, int, int, bytes, str]:
    """Magic-dispatch decode → (width, height, channels, pixels, fmt)."""
    if data[: len(PNG_SIG)] == PNG_SIG:
        return (*decode_png(data), "png")
    if data[:2] == b"BM":
        return (*decode_bmp(data), "bmp")
    raise NotImplementedError("unknown image format (supported: PNG, BMP)")
