"""Pure-python Y4M (YUV4MPEG2) video codec: uncompressed planar
YUV 4:2:0 — enough to run a REAL video-decode stage in
``mapInPandas`` without native codec libs. Format per the public
mjpegtools YUV4MPEG2 spec: an ASCII parameter header line, then
``FRAME\\n``-delimited raw planes (Y w·h, U and V (w/2)·(h/2) for
the C420 family). Compressed containers (mp4/webm) still need
ffmpeg-class libs and raise.

Decoded layout: ``(width, height, (fps_num, fps_den), frames)`` with
``frames`` a list of ``(y, u, v)`` plane byte strings.
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2"


def encode_y4m(
    width: int,
    height: int,
    frames: list[tuple[bytes, bytes, bytes]],
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Y4M C420jpeg stream from raw (y, u, v) plane tuples."""
    if width % 2 or height % 2:
        raise ValueError("C420 requires even dimensions")
    ylen, clen = width * height, (width // 2) * (height // 2)
    out = [
        MAGIC
        + f" W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg".encode()
        + b"\n"
    ]
    for y, u, v in frames:
        if len(y) != ylen or len(u) != clen or len(v) != clen:
            raise ValueError("plane size mismatch")
        out.append(b"FRAME\n")
        out.extend((y, u, v))
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[int, int, tuple[int, int], list[tuple[bytes, bytes, bytes]]]:
    """(width, height, (fps_num, fps_den), [(y, u, v) planes])."""
    if not data.startswith(MAGIC):
        # same convention as imagecodec: unknown magic usually means a
        # compressed container (mp4/webm) — that's the ffmpeg seam
        raise NotImplementedError("not a YUV4MPEG2 stream (compressed video needs ffmpeg)")
    nl = data.index(b"\n")
    width = height = None
    fps = (25, 1)
    colorspace = "C420jpeg"
    for tag in data[len(MAGIC) : nl].decode("ascii").split():
        key, val = tag[0], tag[1:]
        if key == "W":
            width = int(val)
        elif key == "H":
            height = int(val)
        elif key == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif key == "C":
            colorspace = tag
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    if not colorspace.startswith("C420"):
        raise NotImplementedError(f"colorspace {colorspace} (C420 family only)")
    ylen, clen = width * height, (width // 2) * (height // 2)
    frames: list[tuple[bytes, bytes, bytes]] = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = data.index(b"\n", pos) + 1  # frame params (if any) end at newline
        end = pos + ylen + 2 * clen
        if end > len(data):
            raise ValueError("truncated frame")
        frames.append(
            (data[pos : pos + ylen], data[pos + ylen : pos + ylen + clen], data[pos + ylen + clen : end])
        )
        pos = end
    return width, height, fps, frames
