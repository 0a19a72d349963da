"""Pure-python WAV (RIFF/WAVE) codec: 16-bit PCM, any channel
count — enough to run a REAL audio-decode stage in ``mapInPandas``
without native codec libs. Format per the public RIFF/WAVE spec
(Microsoft/IBM Multimedia Programming Interface, 1991). Compressed
formats (ADPCM, float, MP3-in-WAV) raise.

Decoded layout: ``(sample_rate, n_channels, samples)`` with samples
as a flat channel-interleaved list of int16 values.
"""

from __future__ import annotations

import struct


def encode_wav(sample_rate: int, samples: list[int], n_channels: int = 1) -> bytes:
    """16-bit PCM WAV from channel-interleaved int16 samples."""
    assert len(samples) % n_channels == 0
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_channels, interleaved int16 samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = n_channels = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_format, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_format != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format={audio_format} bits={bits} (PCM16 only)"
                )
        elif tag == b"data":
            pcm = body
    if sample_rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm[: len(pcm) & ~1]))
    return sample_rate, n_channels, samples
