"""Multimodal plumbing: schemas, batch shapes, and deterministic
stub transforms (decode itself is a marked stub)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bireme_spark.operators.multimodal import (
    FRAME_SIZE,
    attach_binary_payload,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)


@pytest.fixture()
def packed(spark):
    df = spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 600), (3, "")], "doc_id long, text string"
    )
    return attach_binary_payload(df, "doc_id", "text")


def test_decode_stub_raises_for_media_modes():
    assert decode_media(b"xy", "bytes") == b"xy"
    with pytest.raises(NotImplementedError):
        decode_media(b"xy", "image")


def test_extract_features_shapes(packed):
    rows = {r.doc_id: r for r in extract_features(packed).collect()}
    assert rows[1].n_bytes == 100 and rows[1].head_byte == ord("a")
    assert rows[3].n_bytes == 0 and rows[3].head_byte == -1


def test_resize_pads_and_truncates(packed):
    out = {r.doc_id: r for r in resize_media(packed, 16, 16).collect()}
    assert all(len(r.payload) == 256 for r in out.values())
    assert out[1].payload[:100] == b"a" * 100  # content preserved
    assert out[1].payload[100:] == b"\x00" * 156  # zero-padded
    assert out[2].payload == b"b" * 256  # truncated
    assert (out[1].width, out[1].height) == (16, 16)


def test_sample_frames_stride_and_fanout(packed):
    frames = sample_frames(packed, every_n=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: 600 bytes → 3 frames (256,256,88) → sampled idx 0, 2
    assert [r.frame_idx for r in sorted(by_doc[2], key=lambda r: r.frame_idx)] == [0, 2]
    f0, f2 = sorted(by_doc[2], key=lambda r: r.frame_idx)
    assert f0.n_frame_bytes == FRAME_SIZE and f2.n_frame_bytes == 600 - 2 * FRAME_SIZE
    # doc 1: 100 bytes → 1 frame; doc 3: empty → no frames
    assert [r.frame_idx for r in by_doc[1]] == [0]
    assert 3 not in by_doc


def test_frames_stay_distributed(spark, packed):
    # the fan-out happens inside mapInPandas — no exchange added
    plan = sample_frames(packed, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


class TestImageCodec:
    """Pure-python PNG/BMP codec (functions/imagecodec.py) — the real
    decode stage behind decode_media(mode='image')."""

    def test_roundtrip_all_geometries(self):
        import random

        from bireme_spark.functions.imagecodec import (
            decode_bmp,
            decode_image,
            decode_png,
            encode_bmp,
            encode_png,
        )

        rng = random.Random(7)
        for w, h, ch in [(8, 5, 3), (16, 16, 3), (3, 9, 1), (7, 4, 4), (1, 1, 3)]:
            pix = bytes(rng.randrange(256) for _ in range(w * h * ch))
            if ch == 3:
                b = encode_bmp(w, h, pix)
                assert decode_bmp(b) == (w, h, 3, pix)
                assert decode_image(b) == (w, h, 3, pix, "bmp")
            p = encode_png(w, h, pix, ch)
            assert decode_png(p) == (w, h, ch, pix)

    def test_png_unfilter_all_five_filters(self):
        """Decode a PNG whose scanlines cycle through filters 0-4 —
        produced by an independent inline encoder, so this checks the
        unfilter math, not an encode/decode symmetry."""
        import random
        import struct
        import zlib

        from bireme_spark.functions.imagecodec import PNG_SIG, decode_png

        rng = random.Random(11)
        w, h, ch = 6, 5, 3
        stride = w * ch
        pix = bytes(rng.randrange(256) for _ in range(w * h * ch))

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        rows, prev = [], bytes(stride)
        for y in range(h):
            line = pix[y * stride : (y + 1) * stride]
            f = y % 5
            left = lambda i: line[i - ch] if i >= ch else 0  # noqa: E731
            uleft = lambda i: prev[i - ch] if i >= ch else 0  # noqa: E731
            if f == 0:
                enc = line
            elif f == 1:
                enc = bytes((line[i] - left(i)) & 0xFF for i in range(stride))
            elif f == 2:
                enc = bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
            elif f == 3:
                enc = bytes((line[i] - (left(i) + prev[i]) // 2) & 0xFF for i in range(stride))
            else:
                enc = bytes(
                    (line[i] - paeth(left(i), prev[i], uleft(i))) & 0xFF
                    for i in range(stride)
                )
            rows.append(bytes([f]) + enc)
            prev = line

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        png = (
            PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )
        assert decode_png(png) == (w, h, ch, pix)

    def test_unknown_format_still_raises(self):
        import pytest as _pytest

        from bireme_spark.operators.multimodal import decode_media

        with _pytest.raises(NotImplementedError):
            decode_media(b"\x00\x01\x02", "image")
        with _pytest.raises(NotImplementedError):
            decode_media(b"anything", "video")


class TestWavCodec:
    """RIFF/WAVE PCM16 roundtrip (functions/audiocodec.py)."""

    def test_roundtrip_mono(self):
        from bireme_spark.functions.audiocodec import decode_wav, encode_wav

        samples = [((i * 37) % 2048) - 1024 for i in range(129)]  # odd length
        rate, nch, back = decode_wav(encode_wav(16000, samples))
        assert (rate, nch, back) == (16000, 1, samples)

    def test_roundtrip_stereo_and_extremes(self):
        from bireme_spark.functions.audiocodec import decode_wav, encode_wav

        samples = [-32768, 32767, 0, -1, 1, 12345]  # 3 frames x 2ch
        rate, nch, back = decode_wav(encode_wav(44100, samples, n_channels=2))
        assert (rate, nch, back) == (44100, 2, samples)

    def test_skips_extra_chunks(self):
        import struct

        from bireme_spark.functions.audiocodec import decode_wav, encode_wav

        wav = bytearray(encode_wav(8000, [5, -5, 7]))
        # splice a LIST chunk (odd length -> pad byte) before fmt
        extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        spliced = bytes(wav[:12]) + extra + bytes(wav[12:])
        spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        assert decode_wav(spliced) == (8000, 1, [5, -5, 7])

    def test_zero_sample_wav_gets_sentinel_fingerprint(self, spark):
        from bireme_spark.functions.audiocodec import encode_wav
        from bireme_spark.operators.multimodal import audio_fingerprint

        df = spark.createDataFrame(
            [(1, bytearray(encode_wav(8000, []))), (2, bytearray(encode_wav(8000, [5, -5, 7, 9])))],
            "doc_id long, payload binary",
        )
        rows = {r.doc_id: r.afp for r in audio_fingerprint(df).collect()}
        assert rows[1] == "empty"  # no ZeroDivisionError on n=0
        assert rows[2] != "empty" and len(rows[2]) == 2

    def test_non_pcm_raises(self):
        import struct

        import pytest as _pytest

        from bireme_spark.functions.audiocodec import decode_wav, encode_wav

        wav = bytearray(encode_wav(8000, [1, 2]))
        # fmt chunk starts at byte 20; set audio_format=3 (IEEE float)
        wav[20:22] = struct.pack("<H", 3)
        with _pytest.raises(NotImplementedError):
            decode_wav(bytes(wav))
        with _pytest.raises(ValueError):
            decode_wav(b"not a wav")


class TestY4mCodec:
    """Pure-python Y4M/YUV420 codec round-trips."""

    def test_roundtrip_geometries_and_fps(self):
        from bireme_spark.functions.videocodec import decode_y4m, encode_y4m

        for w, h, nf in [(2, 2, 1), (8, 6, 3), (16, 12, 5)]:
            clen = (w // 2) * (h // 2)
            frames = [
                (
                    bytes((f * 7 + i) % 256 for i in range(w * h)),
                    bytes((f + i) % 256 for i in range(clen)),
                    bytes((f * 3 + i) % 256 for i in range(clen)),
                )
                for f in range(nf)
            ]
            data = encode_y4m(w, h, frames, fps=(30000, 1001))
            rw, rh, fps, rframes = decode_y4m(data)
            assert (rw, rh, fps) == (w, h, (30000, 1001))
            assert rframes == frames

    def test_odd_dimensions_rejected(self):
        import pytest

        from bireme_spark.functions.videocodec import encode_y4m

        with pytest.raises(ValueError):
            encode_y4m(3, 2, [])

    def test_non_y4m_and_unsupported_colorspace_raise(self):
        import pytest

        from bireme_spark.functions.videocodec import decode_y4m

        with pytest.raises(NotImplementedError):
            decode_y4m(b"\x00\x01\x02 definitely not y4m")
        with pytest.raises(NotImplementedError):
            decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C444\n")

    def test_truncated_frame_raises(self):
        import pytest

        from bireme_spark.functions.videocodec import decode_y4m, encode_y4m

        frames = [(bytes(4), bytes(1), bytes(1))]
        data = encode_y4m(2, 2, frames)
        with pytest.raises(ValueError):
            decode_y4m(data[:-2])


class TestNativeBackendSeam:
    """The decode_media native seam is executable dispatch, not a
    docstring: with no native libs installed the pure codecs serve
    (this container), and when a native module IS importable the same
    call routes through it with an identical return contract —
    asserted by injecting a fake PIL."""

    def test_pure_fallback_is_active_here(self):
        from bireme_spark.functions import native

        assert native.image_backend() == "pure"
        assert native.audio_backend() == "pure"
        assert native.video_backend() == "pure"

    def test_pure_image_decode_contract(self):
        from bireme_spark.functions.imagecodec import encode_bmp
        from bireme_spark.functions.native import decode_image_any

        bmp = encode_bmp(2, 2, bytes(range(12)))
        w, h, ch, pix, fmt = decode_image_any(bmp)
        assert (w, h, ch, fmt) == (2, 2, 3, "bmp")
        assert len(pix) == 12

    def test_fake_pil_routes_native(self, monkeypatch):
        import sys
        import types

        class _FakeIm:
            size = (640, 480)
            format = "JPEG"
            mode = "RGB"
            info: dict = {}

            def load(self):
                pass

            def getbands(self):
                return ("R", "G", "B")

            def tobytes(self):
                return b"\x00" * (640 * 480 * 3)

        fake_image_mod = types.SimpleNamespace(open=lambda buf: _FakeIm())
        fake_pil = types.ModuleType("PIL")
        fake_pil.Image = fake_image_mod
        monkeypatch.setitem(sys.modules, "PIL", fake_pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

        from bireme_spark.functions import native

        assert native.image_backend() == "pil"
        # a JPEG payload the pure codec CANNOT decode now decodes —
        # exactly what installing Pillow buys on a real deployment
        w, h, ch, pix, fmt = native.decode_image_any(b"\xff\xd8\xff\xe0 fake jpeg")
        assert (w, h, ch, fmt) == (640, 480, 3, "jpeg")
        assert len(pix) == 640 * 480 * 3

    def test_fake_pil_palette_mode_converts_to_color(self, monkeypatch):
        """Mode-P images must come back as color samples, not palette
        indices — the contract normalization the PIL path applies."""
        import sys
        import types

        converted = []

        class _FakeRGB:
            size = (4, 2)
            format = "PNG"
            mode = "RGB"
            info: dict = {}

            def load(self):
                pass

            def getbands(self):
                return ("R", "G", "B")

            def tobytes(self):
                return b"\x01" * (4 * 2 * 3)

        class _FakeP(_FakeRGB):
            mode = "P"

            def convert(self, mode):
                converted.append(mode)
                return _FakeRGB()

        fake_image_mod = types.SimpleNamespace(open=lambda buf: _FakeP())
        fake_pil = types.ModuleType("PIL")
        fake_pil.Image = fake_image_mod
        monkeypatch.setitem(sys.modules, "PIL", fake_pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

        from bireme_spark.functions import native

        w, h, ch, pix, fmt = native.decode_image_any(b"\x89PNG fake palette")
        assert converted == ["RGB"]
        assert (w, h, ch) == (4, 2, 3) and len(pix) == 24


class TestPerceptualHash:
    def _hash_of(self, spark, pixels_fn, w=16, h=16):
        import pandas as pd
        from bireme_spark.functions.imagecodec import encode_png
        from bireme_spark.operators.multimodal import perceptual_hash

        pix = bytes(pixels_fn(x, y, c) % 256 for y in range(h) for x in range(w) for c in range(3))
        df = spark.createDataFrame(
            [(1, bytearray(encode_png(w, h, pix)))], "doc_id long, payload binary"
        )
        return perceptual_hash(df).collect()[0].ahash

    def test_identical_content_same_hash(self, spark):
        f = lambda x, y, c: x * 3 + y * 7 + c
        assert self._hash_of(spark, f) == self._hash_of(spark, f)

    def test_brightness_shift_invariant(self, spark):
        """aHash thresholds against the image's own mean, so a global
        +24 brightness shift (no mod-256 wrap: base kept < 200) must
        not change the fingerprint."""
        base = lambda x, y, c: (x * 5 + y * 9 + 11 * c) % 180
        brighter = lambda x, y, c: base(x, y, c) + 24
        assert self._hash_of(spark, base) == self._hash_of(spark, brighter)

    def test_different_content_different_hash(self, spark):
        a = lambda x, y, c: x * 16
        b = lambda x, y, c: y * 16
        assert self._hash_of(spark, a) != self._hash_of(spark, b)


class TestClassCollapseAccounting:
    """r11: the per-CLASS collapse (payload = f(doc_id % k) by each
    query's own generator) must preserve doc-level accounting — group
    counts sum to the corpus size and canonical ids are real class
    minima. The cross-engine gate pins exact values; this pins the
    collapse INVARIANT at the query level."""

    def _docs(self, spark, sf_dir):
        from bireme_spark.sources.tables import load_table

        d = load_table(spark, sf_dir, "documents").select("doc_id")
        ids = [r.doc_id for r in d.collect()]
        return ids

    def test_phash_dedup_accounting(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_phash_dedup

        ids = self._docs(spark, sf_dir)
        rows = multimodal_phash_dedup(spark, sf_dir).collect()
        assert sum(r.n_images for r in rows) == len(ids)
        # canonical docs are the true minima of their residue classes
        mins = {}
        for i in ids:
            mins[i % 16] = min(mins.get(i % 16, i), i)
        assert {r.canonical_doc for r in rows} <= set(mins.values())

    def test_hist_equalization_accounting(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_hist_equalization

        ids = self._docs(spark, sf_dir)
        rows = multimodal_hist_equalization(spark, sf_dir).collect()
        n_classes = len({i % 16 for i in ids})
        assert len(rows) == n_classes
        assert sum(r.n_images for r in rows) == len(ids)

    def test_scene_cuts_accounting(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_scene_cuts

        ids = self._docs(spark, sf_dir)
        rows = multimodal_scene_cuts(spark, sf_dir).collect()
        assert sum(r.n_videos for r in rows) == len(ids)
        # detector must recover n_cuts == class for every present class
        assert {r.n_cuts for r in rows} == {i % 3 for i in ids}
