"""Native media backends — the production fast path behind the
``decode_media`` seam (``operators/multimodal.py``).

The pure-python codecs (``imagecodec``/``audiocodec``/``videocodec``)
are correct but are the throughput ceiling of the multimodal stages at
100 TB (per-row Python byte loops). On a real deployment the same
mapInPandas stages go 10–100× faster — and compressed containers
(JPEG, MP3/FLAC, MP4/WebM) unlock — by installing the native libs;
these adapters route to them behind the SAME return contracts:

| mode  | native lib        | contract                                   |
| ----- | ----------------- | ------------------------------------------ |
| image | PIL / Pillow      | (width, height, channels, pixels, fmt)     |
| audio | soundfile (libsndfile) | (sample_rate, n_channels, samples)    |
| video | av (ffmpeg)       | (width, height, (fps_num, fps_den), frames)|

This container ships none of them, so the import-try falls back to
the pure codecs — the tested default here. The DISPATCH is what this
module makes real (unit-tested via fake-module injection): a deploy
flips to native by ``pip install pillow soundfile av``, zero code
changes.
"""

from __future__ import annotations

import io


def image_backend() -> str:
    try:
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:
        return "pure"


def audio_backend() -> str:
    try:
        import soundfile  # noqa: F401

        return "soundfile"
    except ImportError:
        return "pure"


def video_backend() -> str:
    try:
        import av  # noqa: F401

        return "av"
    except ImportError:
        return "pure"


def decode_image_any(data: bytes) -> tuple[int, int, int, bytes, str]:
    """(width, height, channels, pixels, fmt) via PIL when installed,
    else the pure-python PNG/BMP codec."""
    if image_backend() == "pil":
        import PIL.Image

        im = PIL.Image.open(io.BytesIO(data))
        im.load()
        return (
            im.size[0],
            im.size[1],
            len(im.getbands()),
            im.tobytes(),
            (im.format or "unknown").lower(),
        )
    from bireme_spark.functions.imagecodec import decode_image

    return decode_image(data)


def decode_audio_any(data: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_channels, interleaved int16 samples) via
    libsndfile when installed, else the pure RIFF/WAVE PCM16 codec."""
    if audio_backend() == "soundfile":
        import soundfile

        samples, rate = soundfile.read(io.BytesIO(data), dtype="int16")
        if samples.ndim == 1:
            return int(rate), 1, [int(s) for s in samples]
        return int(rate), int(samples.shape[1]), [int(s) for s in samples.reshape(-1)]
    from bireme_spark.functions.audiocodec import decode_wav

    return decode_wav(data)


def decode_video_any(
    data: bytes,
) -> tuple[int, int, tuple[int, int], list[tuple[bytes, bytes, bytes]]]:
    """(width, height, (fps_num, fps_den), YUV420 frame planes) via
    ffmpeg/av when installed, else the pure Y4M codec."""
    if video_backend() == "av":
        import av

        frames: list[tuple[bytes, bytes, bytes]] = []
        with av.open(io.BytesIO(data)) as container:
            stream = container.streams.video[0]
            rate = stream.average_rate
            for frame in container.decode(stream):
                yuv = frame.reformat(format="yuv420p")
                p = yuv.planes
                frames.append((bytes(p[0]), bytes(p[1]), bytes(p[2])))
            return (
                stream.codec_context.width,
                stream.codec_context.height,
                (rate.numerator, rate.denominator),
                frames,
            )
    from bireme_spark.functions.videocodec import decode_y4m

    return decode_y4m(data)
