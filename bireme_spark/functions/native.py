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
        # Normalize palette/exotic modes to real color samples so the
        # return contract matches the pure codec (which only ever
        # yields gray/RGB/alpha channel bytes — a mode-P image's
        # tobytes() would be palette INDICES, not colors)
        mode = getattr(im, "mode", "RGB")
        if mode in ("P", "PA"):
            im = im.convert("RGBA" if mode == "PA" or "transparency" in im.info else "RGB")
        elif mode not in ("1", "L", "LA", "RGB", "RGBA", "I;16", "I", "F"):
            im = im.convert("RGB")
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
            if not container.streams.video:
                # match the pure codec's error contract (ValueError,
                # not IndexError) for undecodable input
                raise ValueError("container has no video stream")
            stream = container.streams.video[0]
            # VFR / raw streams can report no average rate — keep the
            # (num, den) contract with an explicit unknown marker
            rate = stream.average_rate
            fps = (rate.numerator, rate.denominator) if rate else (0, 1)
            for frame in container.decode(stream):
                yuv = frame.reformat(format="yuv420p")
                p = yuv.planes
                frames.append((bytes(p[0]), bytes(p[1]), bytes(p[2])))
            return (
                stream.codec_context.width,
                stream.codec_context.height,
                fps,
                frames,
            )
    from bireme_spark.functions.videocodec import decode_y4m

    return decode_y4m(data)
