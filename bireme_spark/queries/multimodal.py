"""Multimodal plumbing query (SURVEY.md §2.C): binary payload +
metadata → Arrow-batched feature extraction. Oracle-checked because
the stub features are deterministic byte statistics; the codec call
itself is a marked stub (no media libs in this container)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bireme_spark.operators.multimodal import attach_binary_payload, extract_features
from bireme_spark.sources.tables import load_table


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    packed = attach_binary_payload(d, "doc_id", "text")
    feats = extract_features(packed)
    return feats.select(
        "doc_id", "n_bytes", "head_byte", F.round("mean_byte", 6).alias("mean_byte")
    )


MULTIMODAL_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS head_byte,
       ROUND(list_aggregate(list_transform(string_split(text, ''), c -> ascii(c)), 'avg'), 6)
         AS mean_byte
FROM documents
"""


QUERIES = {"multimodal_decode": multimodal_decode}
ORACLE = {"multimodal_decode": MULTIMODAL_SQL}


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over the packed corpus: every 2nd
    256-byte pseudo-frame per document (the fan-out happens inside
    the Arrow batch). Frame geometry is deterministic byte math, so
    it oracle-checks exactly."""
    from bireme_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    packed = attach_binary_payload(d, "doc_id", "text")
    return (
        sample_frames(packed, every_n=2)
        .select("doc_id", "frame_idx", "n_frame_bytes")
        .orderBy("doc_id", "frame_idx")
    )


FRAME_SAMPLE_SQL = """
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       CAST(least(256, octet_length(encode(text)) - i * 256) AS INTEGER) AS n_frame_bytes
FROM documents,
     LATERAL (SELECT unnest(generate_series(0,
                CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) - 1, 2)) AS i) t
WHERE octet_length(encode(text)) > 0
ORDER BY doc_id, frame_idx
"""

QUERIES["multimodal_frame_sample"] = multimodal_frame_sample
ORACLE["multimodal_frame_sample"] = FRAME_SAMPLE_SQL


def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec end-to-end: per doc_id a deterministic synthetic
    image (BMP for even ids, PNG for odd; pixel value at (x, y,
    channel c) = (x + y + doc_id + 37c) mod 256) is ENCODED in one
    mapInPandas stage and DECODED by the pure-python codec in the
    next; the oracle predicts the decoded geometry and mean pixel in
    closed form — if either the encoder or the decoder is wrong, the
    stats won't match.

    Perf: encode and decode run in ONE mapInPandas pass — chaining
    two Python stages pays a second JVM↔Python Arrow hop for every
    payload byte (measured 0.88s → 0.53s at sf0.1, back at the
    BASELINE floor); pixel synthesis is one vectorized numpy
    broadcast, not a per-byte Python loop. The standalone two-stage
    operator (`extract_image_features`) is exercised by
    multimodal_decode and the unit tests."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from bireme_spark.functions.imagecodec import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, chs, means, fmts = [], [], [], [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 8, 8 + doc_id % 5
                ys = np.arange(h)[:, None, None]
                xs = np.arange(w)[None, :, None]
                cs = (37 * np.arange(3))[None, None, :]
                pix = ((ys + xs + cs + doc_id) % 256).astype(np.uint8).tobytes()
                if doc_id % 2 == 0:
                    dw, dh, ch, out = decode_bmp(encode_bmp(w, h, pix))
                    fmt = "bmp"
                else:
                    dw, dh, ch, out = decode_png(encode_png(w, h, pix))
                    fmt = "png"
                ids.append(doc_id)
                ws.append(dw)
                hs.append(dh)
                chs.append(ch)
                means.append(sum(out) / len(out))
                fmts.append(fmt)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(chs, dtype="int32"),
                    "mean_pixel": means,
                    "format": fmts,
                }
            )

    feats = d.mapInPandas(
        roundtrip,
        schema="doc_id long, width int, height int, channels int,"
        " mean_pixel double, format string",
    )
    return feats.select(
        "doc_id",
        "width",
        "height",
        "channels",
        F.round("mean_pixel", 6).alias("mean_pixel"),
        "format",
    ).orderBy("doc_id")


MULTIMODAL_IMAGE_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents
)
SELECT d.doc_id,
       CAST(d.w AS INTEGER) AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       ROUND(AVG(CAST((x.x + y.y + d.doc_id + 37 * c.c) % 256 AS DOUBLE)), 6) AS mean_pixel,
       CASE WHEN d.doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format
FROM dims d
CROSS JOIN LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) x
CROSS JOIN LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) y
CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) c
GROUP BY d.doc_id, d.w, d.h
ORDER BY doc_id
"""

QUERIES["multimodal_image_decode"] = multimodal_image_decode
ORACLE["multimodal_image_decode"] = MULTIMODAL_IMAGE_SQL


def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec end-to-end: per doc_id a deterministic
    synthetic PCM16 clip (rate = 8000·(1 + doc_id%3), n = 64 +
    doc_id%64 samples, sample[i] = (doc_id·31 + i·7) mod 2048 −
    1024) is ENCODED to RIFF/WAVE bytes in one mapInPandas stage and
    DECODED by the pure-python WAV parser in the next; the oracle
    predicts rate/length/amplitude stats in closed form — a bug in
    either the encoder or the decoder breaks the match. All sums are
    exact integers; the single float division + sqrt is the same
    IEEE op on both sides.

    Perf: encode+decode fused in ONE mapInPandas pass (the second
    Python stage costs an extra Arrow hop per payload byte; measured
    0.92s → 0.69s at sf0.1 — see multimodal_image_decode)."""
    import math
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.audiocodec import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "sample_rate", "n_channels", "n_samples",
                "peak", "mean_sample", "rms",
            )}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 64 + doc_id % 64
                samples = [(doc_id * 31 + i * 7) % 2048 - 1024 for i in range(n)]
                rate, ch, back = decode_wav(
                    encode_wav(8000 * (1 + doc_id % 3), samples)
                )
                s = sum(back)
                ss = sum(v * v for v in back)
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(ch)
                rows["n_samples"].append(len(back))
                rows["peak"].append(max(abs(v) for v in back))
                rows["mean_sample"].append(s / len(back))
                rows["rms"].append(math.sqrt(ss / len(back)))
            yield pd.DataFrame(rows)

    feats = d.mapInPandas(
        roundtrip,
        schema="doc_id long, sample_rate int, n_channels int,"
        " n_samples int, peak int, mean_sample double, rms double",
    )
    return feats.select(
        "doc_id",
        "sample_rate",
        "n_channels",
        "n_samples",
        "peak",
        F.round("mean_sample", 6).alias("mean_sample"),
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id")


MULTIMODAL_AUDIO_SQL = """
WITH clips AS (
  SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
), samples AS (
  SELECT c.doc_id, c.n,
         (c.doc_id * 31 + i.i * 7) % 2048 - 1024 AS v
  FROM clips c
  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, c.n - 1)) AS i) i
)
SELECT doc_id,
       CAST(8000 * (1 + doc_id % 3) AS INTEGER) AS sample_rate,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(n AS INTEGER) AS n_samples,
       CAST(MAX(abs(v)) AS INTEGER) AS peak,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mean_sample,
       ROUND(sqrt(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)), 6) AS rms
FROM samples
GROUP BY doc_id, n
ORDER BY doc_id
"""

QUERIES["multimodal_audio_decode"] = multimodal_audio_decode
ORACLE["multimodal_audio_decode"] = MULTIMODAL_AUDIO_SQL


def multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video codec end-to-end: per doc_id a deterministic
    synthetic YUV420 clip (w = 8 + 2·(doc_id%5), h = 6 + 2·(doc_id%4),
    n_frames = 3 + doc_id%4, Y[f][i] = (doc_id·17 + f·11 + i·5) mod
    256, chroma planes mid-gray) is ENCODED to a Y4M stream in one
    mapInPandas stage and DECODED by the pure-python Y4M parser in
    the next; the oracle predicts geometry/fps/luma stats in closed
    form — a bug in either the encoder or the decoder breaks the
    match. Luma sums are exact integers; the single float division
    is the same IEEE op on both sides.

    Perf: encode+decode fused in ONE mapInPandas pass and luma
    planes synthesized with one numpy broadcast per frame (see
    multimodal_image_decode for the Arrow-hop rationale)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from bireme_spark.functions.videocodec import decode_y4m, encode_y4m

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_frames",
                "fps_num", "fps_den", "peak_luma", "mean_luma",
            )}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + 2 * (doc_id % 5), 6 + 2 * (doc_id % 4)
                clen = (w // 2) * (h // 2)
                idx = 5 * np.arange(w * h)
                frames = [
                    (
                        ((doc_id * 17 + f * 11 + idx) % 256)
                        .astype(np.uint8)
                        .tobytes(),
                        bytes([128]) * clen,
                        bytes([128]) * clen,
                    )
                    for f in range(3 + doc_id % 4)
                ]
                dw, dh, (fn, fd), back = decode_y4m(
                    encode_y4m(w, h, frames, fps=(30, 1))
                )
                luma_sum = sum(sum(y) for y, _, _ in back)  # exact int
                n_px = dw * dh * len(back)
                rows["doc_id"].append(doc_id)
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["n_frames"].append(len(back))
                rows["fps_num"].append(fn)
                rows["fps_den"].append(fd)
                rows["peak_luma"].append(max((max(y) for y, _, _ in back), default=0))
                rows["mean_luma"].append(luma_sum / n_px if n_px else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int32"),
                    "fps_num": pd.Series(rows["fps_num"], dtype="int32"),
                    "fps_den": pd.Series(rows["fps_den"], dtype="int32"),
                    "peak_luma": pd.Series(rows["peak_luma"], dtype="int32"),
                    "mean_luma": rows["mean_luma"],
                }
            )

    feats = d.mapInPandas(
        roundtrip,
        schema="doc_id long, width int, height int, n_frames int,"
        " fps_num int, fps_den int, peak_luma int, mean_luma double",
    )
    return feats.select(
        "doc_id",
        "width",
        "height",
        "n_frames",
        "fps_num",
        "fps_den",
        "peak_luma",
        F.round("mean_luma", 6).alias("mean_luma"),
    ).orderBy("doc_id")


MULTIMODAL_VIDEO_SQL = """
WITH clips AS (
  SELECT doc_id,
         8 + 2 * (doc_id % 5) AS w,
         6 + 2 * (doc_id % 4) AS h,
         3 + doc_id % 4 AS nf
  FROM documents
), luma AS (
  SELECT c.doc_id, c.w, c.h, c.nf,
         (c.doc_id * 17 + f.f * 11 + i.i * 5) % 256 AS y
  FROM clips c
  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, c.nf - 1)) AS f) f
  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, c.w * c.h - 1)) AS i) i
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(nf AS INTEGER) AS n_frames,
       CAST(30 AS INTEGER) AS fps_num,
       CAST(1 AS INTEGER) AS fps_den,
       CAST(MAX(y) AS INTEGER) AS peak_luma,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS mean_luma
FROM luma
GROUP BY doc_id, w, h, nf
ORDER BY doc_id
"""

QUERIES["multimodal_video_decode"] = multimodal_video_decode
ORACLE["multimodal_video_decode"] = MULTIMODAL_VIDEO_SQL


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup end-to-end: deterministic synthetic
    images whose CONTENT depends only on ``doc_id % 16`` (16 distinct
    images, each stored under many ids) are encoded (PNG/BMP by
    residue parity), decoded by the pure-python codecs, aHash-64
    fingerprinted, and grouped by hash — the canonical keep-min-id
    dedup report. The oracle never sees a hash: it predicts the GROUP
    STRUCTURE in closed form (groups == residue classes), so a wrong
    encoder, decoder, or hash (any collision/split among the 16
    contents) breaks the match.

    Scale shape (r11): image CONTENT is a pure function of the class
    s = doc_id % 16 — by the query's own generator, at any scale —
    so encode+hash collapse onto the 16-row class table (the r5
    distinct-value-histogram rule): one JVM agg rolls docs up to
    (s, min/max/count), the Python encode→aHash pipeline runs 16
    times total, and a broadcast join maps classes back onto the doc
    stats. Groups (and any hash collisions across classes) are
    IDENTICAL to the per-doc form: every doc's ahash is a function
    of its class.
    """
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import encode_bmp, encode_png
    from bireme_spark.operators.multimodal import perceptual_hash

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    cls = d.groupBy((F.col("doc_id") % 16).alias("s")).agg(
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.count(F.lit(1)).alias("n"),
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for s in pdf["doc_id"]:
                s = int(s)
                w = h = 16
                pix = bytes(
                    (x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
                ids.append(s)
                payloads.append(enc)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    packed = cls.select(F.col("s").alias("doc_id")).mapInPandas(
        gen, schema="doc_id long, payload binary"
    )
    hashed = perceptual_hash(packed).select(F.col("doc_id").alias("s"), "ahash")
    return (
        hashed.join(F.broadcast(cls), "s")
        .groupBy("ahash")
        .agg(
            F.min("min_doc").alias("canonical_doc"),
            F.sum("n").alias("n_images"),
            F.max("max_doc").alias("max_doc"),
        )
        .select("canonical_doc", "n_images", "max_doc")
        .orderBy("canonical_doc")
    )


MULTIMODAL_PHASH_SQL = """
SELECT MIN(doc_id) AS canonical_doc,
       COUNT(*) AS n_images,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY doc_id % 16
ORDER BY canonical_doc
"""

QUERIES["multimodal_phash_dedup"] = multimodal_phash_dedup
ORACLE["multimodal_phash_dedup"] = MULTIMODAL_PHASH_SQL


def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint dedup end-to-end (the WAV twin of
    ``multimodal_phash_dedup``): clips whose CONTENT depends only on
    ``doc_id % 12`` are encoded to RIFF/WAVE, decoded by the
    pure-python parser, band-energy fingerprinted, and grouped — the
    oracle predicts the GROUP STRUCTURE (residue classes) in closed
    form without ever seeing a fingerprint, so a codec bug or a
    fingerprint collision among the 12 signals breaks the match.

    Scale shape (r11): clip CONTENT is a pure function of the class
    s = doc_id % 12 (by the query's own generator), so encode→decode→
    fingerprint collapse onto the 12-row class table (distinct-value-
    histogram rule); one JVM agg keeps the doc stats, a broadcast
    join maps fingerprints back. Groups identical to the per-doc
    form (afp is a function of the class).
    """
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.audiocodec import encode_wav
    from bireme_spark.operators.multimodal import audio_fingerprint

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    cls = d.groupBy((F.col("doc_id") % 12).alias("s")).agg(
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.count(F.lit(1)).alias("n"),
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for s in pdf["doc_id"]:
                s = int(s)
                n = 96
                # band b (12 samples each) is LOUD iff bit b of
                # (s+1) is set — 12 distinct 8-band energy patterns,
                # so the fingerprints must separate exactly 12 ways
                mask = s + 1
                samples = [
                    (800 if (mask >> (i * 8 // n)) & 1 else 50) * (1 if i % 2 == 0 else -1)
                    for i in range(n)
                ]
                ids.append(s)
                payloads.append(encode_wav(8000, samples))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    packed = cls.select(F.col("s").alias("doc_id")).mapInPandas(
        gen, schema="doc_id long, payload binary"
    )
    printed = audio_fingerprint(packed).select(F.col("doc_id").alias("s"), "afp")
    return (
        printed.join(F.broadcast(cls), "s")
        .groupBy("afp")
        .agg(
            F.min("min_doc").alias("canonical_doc"),
            F.sum("n").alias("n_clips"),
            F.max("max_doc").alias("max_doc"),
        )
        .select("canonical_doc", "n_clips", "max_doc")
        .orderBy("canonical_doc")
    )


MULTIMODAL_AFP_SQL = """
SELECT MIN(doc_id) AS canonical_doc,
       COUNT(*) AS n_clips,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY doc_id % 12
ORDER BY canonical_doc
"""

QUERIES["multimodal_audio_fingerprint"] = multimodal_audio_fingerprint
ORACLE["multimodal_audio_fingerprint"] = MULTIMODAL_AFP_SQL


def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection end-to-end: synthetic Y4M clips built
    with EXACTLY doc_id % 3 hard cuts at known frame positions
    (in-scene frames differ by +3 luma — below threshold; cut frames
    jump +96 — above), encoded, decoded by the pure-python parser,
    and scanned for cuts. The oracle predicts the per-clip cut count
    in closed form (n_cuts == doc_id % 3), so an encoder, decoder, or
    differencing bug breaks the match.

    Scale shape (r11): clip CONTENT is a pure function of the class
    s = doc_id % 3 (by the query's own generator), so encode→decode→
    detect collapse onto the 3-row class table (distinct-value-
    histogram rule); one JVM agg keeps the doc stats, a broadcast
    join maps detected cut counts back. Output identical (n_cuts is
    a function of the class).
    """
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.videocodec import encode_y4m
    from bireme_spark.operators.multimodal import detect_scene_cuts

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    cls = d.groupBy((F.col("doc_id") % 3).alias("s")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_doc"),
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for s in pdf["doc_id"]:
                s = int(s)
                w, h = 8, 6
                n_cuts = s % 3
                n_frames = 7
                # cuts after frames 2 and 4 (as many as n_cuts)
                cut_after = {2, 4}
                clen = (w // 2) * (h // 2)
                frames, base = [], 20
                cuts_done = 0
                for f in range(n_frames):
                    if f > 0 and (f - 1) in cut_after and cuts_done < n_cuts:
                        base += 96
                        cuts_done += 1
                    else:
                        base += 3
                    frames.append(
                        (bytes([base % 200] * (w * h)), bytes([128]) * clen, bytes([128]) * clen)
                    )
                ids.append(s)
                payloads.append(encode_y4m(w, h, frames))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    packed = cls.select(F.col("s").alias("doc_id")).mapInPandas(
        gen, schema="doc_id long, payload binary"
    )
    cuts = detect_scene_cuts(packed, threshold=40).select(
        F.col("doc_id").alias("s"), "n_cuts"
    )
    return (
        cuts.join(F.broadcast(cls), "s")
        .groupBy("n_cuts")
        .agg(F.sum("n").alias("n_videos"), F.min("min_doc").alias("min_doc"))
        .orderBy("n_cuts")
    )


MULTIMODAL_SCENE_SQL = """
SELECT CAST(doc_id % 3 AS INTEGER) AS n_cuts,
       COUNT(*) AS n_videos,
       MIN(doc_id) AS min_doc
FROM documents
GROUP BY 1 ORDER BY 1
"""

QUERIES["multimodal_scene_cuts"] = multimodal_scene_cuts
ORACLE["multimodal_scene_cuts"] = MULTIMODAL_SCENE_SQL


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize end-to-end: the same synthetic
    images as ``multimodal_image_decode`` (pixel = (x+y+doc_id+37c)
    mod 256), encoded, decoded, and downsampled to 4×4 with the
    integer NN mapping xs = (x_dst·w_src)//4 — the oracle recomputes
    the sampled-pixel mean in closed form, so encoder, decoder, and
    resampler are all on the hook.

    Scale shape: encode→decode→resize in one partition-parallel
    mapInPandas chain; no exchange at all before the ordered output.
    """
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import encode_bmp, encode_png
    from bireme_spark.operators.multimodal import resize_image_nn

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 8, 8 + doc_id % 5
                pix = bytes(
                    (x + y + doc_id + 37 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                enc = encode_bmp(w, h, pix) if doc_id % 2 == 0 else encode_png(w, h, pix)
                ids.append(doc_id)
                payloads.append(enc)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    packed = d.mapInPandas(gen, schema="doc_id long, payload binary")
    return (
        resize_image_nn(packed, 4, 4)
        .select("doc_id", "width", "height", "mean_pixel")
        .orderBy("doc_id")
    )


MULTIMODAL_RESIZE_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents
)
SELECT d.doc_id,
       CAST(4 AS INTEGER) AS width,
       CAST(4 AS INTEGER) AS height,
       CAST(SUM(((i.i * d.w) // 4 + (j.j * d.h) // 4 + d.doc_id + 37 * c.c) % 256)
            AS DOUBLE) / 48 AS mean_pixel
FROM dims d
CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i
CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) c
GROUP BY d.doc_id
ORDER BY d.doc_id
"""

QUERIES["multimodal_resize"] = multimodal_resize
ORACLE["multimodal_resize"] = MULTIMODAL_RESIZE_SQL


def multimodal_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence trimming — the audio-curation pass that strips leading/
    trailing quiet before transcription or training: per clip, find
    the first and last sample above the amplitude gate and report the
    trimmed bounds and kept length.

    Synthetic clips with PLANTED pads: lead = doc_id%32 zero samples,
    then 48 + doc_id%16 tone samples ((doc_id·13 + i·11) mod 1024 +
    512 — always above the gate), then trail = doc_id%24 zeros; the
    encode → decode → scan pipeline must recover exactly those pad
    lengths, which the oracle predicts in closed form. Same fused
    single-pass mapInPandas shape as the other decode stages (one
    Arrow hop; numpy synthesis)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from bireme_spark.functions.audiocodec import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    gate = 256

    def roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "n_samples", "lead_trimmed", "trail_trimmed", "n_kept"
            )}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                lead, trail = doc_id % 32, doc_id % 24
                # numpy synthesis + gate scan (VERDICT r5: the per-sample
                # Python list scans were the 2x-floor mechanism); the
                # encode→decode round-trip stays the real codec.
                tone = (doc_id * 13 + np.arange(48 + doc_id % 16) * 11) % 1024 + 512
                samples = np.concatenate(
                    [np.zeros(lead, np.int64), tone, np.zeros(trail, np.int64)]
                )
                _, _, back = decode_wav(encode_wav(16000, samples.tolist()))
                loud = np.nonzero(np.abs(np.asarray(back, np.int64)) > gate)[0]
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(len(back))
                if loud.size == 0:
                    rows["lead_trimmed"].append(len(back))
                    rows["trail_trimmed"].append(0)
                    rows["n_kept"].append(0)
                else:
                    first, last = int(loud[0]), int(loud[-1])
                    rows["lead_trimmed"].append(first)
                    rows["trail_trimmed"].append(len(back) - 1 - last)
                    rows["n_kept"].append(last - first + 1)
            yield pd.DataFrame(rows)

    feats = d.mapInPandas(
        roundtrip,
        schema="doc_id long, n_samples int, lead_trimmed int,"
        " trail_trimmed int, n_kept int",
    )
    return feats.orderBy("doc_id")


SILENCE_TRIM_SQL = """
SELECT doc_id,
       CAST(doc_id % 32 + 48 + doc_id % 16 + doc_id % 24 AS INTEGER) AS n_samples,
       CAST(doc_id % 32 AS INTEGER) AS lead_trimmed,
       CAST(doc_id % 24 AS INTEGER) AS trail_trimmed,
       CAST(48 + doc_id % 16 AS INTEGER) AS n_kept
FROM documents
ORDER BY doc_id
"""

QUERIES["multimodal_silence_trim"] = multimodal_silence_trim
ORACLE["multimodal_silence_trim"] = SILENCE_TRIM_SQL


def multimodal_edge_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sobel edge-energy image profiling, exactly value-checked: the
    deterministic synthetic images (content = f(doc_id % 16), PNG/BMP
    by residue parity) are encoded, decoded by the pure-python
    codecs, integer-grayscaled and convolved with the Sobel Gx/Gy
    kernels; per-image energy = Σ interior |Gx|+|Gy| (all integer
    floor math — bit-identical anywhere). The oracle recomputes the
    SAME energies symbolically in SQL from the pixel formula
    (generate_series grid + neighbor join), so encoder, decoder,
    grayscale, and convolution are all hash-checked — a one-pixel
    decode bug splits a residue class immediately.

    Scale shape: generation+encode+decode+convolution FUSED into ONE
    Arrow-batched mapInPandas pass (each extra Python stage pays a
    JVM↔Python hop per payload byte — the round-5 fuse rule); the
    only exchange is the 16-group energy aggregate. Real corpora
    swap the generator for the payload column; the convolution path
    is unchanged (native-codec seam documented in functions/native).
    """
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp, encode_png

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    # r11: energy is a pure function of the class s = doc_id % 16 (by
    # this query's own generator) — collapse the Python pipeline onto
    # the 16-row class table (distinct-value-histogram rule), keep doc
    # stats in one JVM agg, broadcast-join back. Output identical.
    cls = d.groupBy((F.col("doc_id") % 16).alias("s")).agg(
        F.min("doc_id").alias("min_doc"),
        F.count(F.lit(1)).alias("n"),
    )

    def gen_sobel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, energies = [], []
            for s in pdf["doc_id"]:
                s = int(s)
                w = h = 16
                pix = bytes(
                    (x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
                dw, dh, dc, dpix, _fmt = decode_image(enc)
                gray = [
                    [
                        sum(dpix[(y * dw + x) * dc + ch] for ch in range(min(dc, 3)))
                        // min(dc, 3)
                        for x in range(dw)
                    ]
                    for y in range(dh)
                ]
                e = 0
                for y in range(1, dh - 1):
                    for x in range(1, dw - 1):
                        gx = (
                            gray[y - 1][x + 1] + 2 * gray[y][x + 1] + gray[y + 1][x + 1]
                            - gray[y - 1][x - 1] - 2 * gray[y][x - 1] - gray[y + 1][x - 1]
                        )
                        gy = (
                            gray[y + 1][x - 1] + 2 * gray[y + 1][x] + gray[y + 1][x + 1]
                            - gray[y - 1][x - 1] - 2 * gray[y - 1][x] - gray[y - 1][x + 1]
                        )
                        e += abs(gx) + abs(gy)
                ids.append(s)
                energies.append(e)
            yield pd.DataFrame({"doc_id": ids, "edge_energy": energies})

    scored = (
        cls.select(F.col("s").alias("doc_id"))
        .mapInPandas(gen_sobel, schema="doc_id long, edge_energy long")
        .select(F.col("doc_id").alias("s"), "edge_energy")
    )
    return (
        scored.join(F.broadcast(cls), "s")
        .groupBy("edge_energy")
        .agg(
            F.min("min_doc").alias("canonical_doc"),
            F.sum("n").alias("n_images"),
        )
        .orderBy("edge_energy")
    )


MULTIMODAL_EDGE_ENERGY_SQL = """
WITH px AS (
  SELECT s, x, y,
         ((((x*x + 2*y + 5*s + (s*x)//3) % 256)
         + ((x*x + 2*y + 5*s + 37 + (s*x)//3) % 256)
         + ((x*x + 2*y + 5*s + 74 + (s*x)//3) % 256)) // 3) AS g
  FROM generate_series(0, 15) ts(s),
       generate_series(0, 15) tx(x),
       generate_series(0, 15) ty(y)
),
sob AS (
  SELECT c.s, c.x, c.y,
         ABS(SUM(CASE WHEN n.x = c.x - 1 AND n.y = c.y - 1 THEN -1
                      WHEN n.x = c.x - 1 AND n.y = c.y     THEN -2
                      WHEN n.x = c.x - 1 AND n.y = c.y + 1 THEN -1
                      WHEN n.x = c.x + 1 AND n.y = c.y - 1 THEN 1
                      WHEN n.x = c.x + 1 AND n.y = c.y     THEN 2
                      WHEN n.x = c.x + 1 AND n.y = c.y + 1 THEN 1
                      ELSE 0 END * n.g))
       + ABS(SUM(CASE WHEN n.y = c.y - 1 AND n.x = c.x - 1 THEN -1
                      WHEN n.y = c.y - 1 AND n.x = c.x     THEN -2
                      WHEN n.y = c.y - 1 AND n.x = c.x + 1 THEN -1
                      WHEN n.y = c.y + 1 AND n.x = c.x - 1 THEN 1
                      WHEN n.y = c.y + 1 AND n.x = c.x     THEN 2
                      WHEN n.y = c.y + 1 AND n.x = c.x + 1 THEN 1
                      ELSE 0 END * n.g)) AS e
  FROM px c
  JOIN px n ON n.s = c.s AND n.x BETWEEN c.x - 1 AND c.x + 1
                         AND n.y BETWEEN c.y - 1 AND c.y + 1
  WHERE c.x BETWEEN 1 AND 14 AND c.y BETWEEN 1 AND 14
  GROUP BY 1, 2, 3
),
energy AS (SELECT s, CAST(SUM(e) AS BIGINT) AS edge_energy FROM sob GROUP BY 1),
docs AS (SELECT doc_id, doc_id % 16 AS s FROM documents)
SELECT edge_energy, MIN(doc_id) AS canonical_doc, COUNT(*) AS n_images
FROM docs JOIN energy USING (s)
GROUP BY 1 ORDER BY 1
"""

QUERIES["multimodal_edge_energy"] = multimodal_edge_energy
ORACLE["multimodal_edge_energy"] = MULTIMODAL_EDGE_ENERGY_SQL


def multimodal_hist_equalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image luminance histogram equalization, exactly
    value-checked: the deterministic synthetic images (pixel =
    f(doc_id % 16), BMP/PNG by residue parity — the same corpus as
    multimodal_edge_energy) are encoded, decoded by the pure-python
    codecs, grayscaled, and equalized with the classic integer CDF
    remap eq(v) = (cdf(v) − cdf_min)·255 // (N − cdf_min) — the
    contrast-normalization stage a vision-pretraining pipeline runs
    before patching/augmentation. Per residue class: pre/post
    contrast span and total absolute remap shift — a one-pixel
    decode or an off-by-one CDF bug splits a class immediately.

    The oracle recomputes the SAME equalization symbolically in SQL
    from the pixel formula (generate_series grid → histogram → CDF
    window → integer remap join), so encoder, decoder, grayscale,
    histogram, and remap are all hash-checked.

    Scale shape (r11): the image CONTENT is a pure function of the
    residue class s = doc_id % 16 — the query's own generator makes
    that true at ANY scale, not just on this fixture — so the whole
    encode→decode→histogram→equalize pipeline collapses onto the
    16-row class table (the r5 distinct-value-histogram rule: per-doc
    Python work → per-CLASS Python work). One JVM agg rolls the doc
    scan up to (s, n_images, canonical_doc); the fused mapInPandas
    pass (round-5 fuse rule) then runs the codec pipeline 16 times
    total instead of once per document, and the per-class metrics
    ride the same 16 rows out — output rows identical (every doc in a
    class produced the SAME metrics, so the old per-doc MAX equals
    the class value)."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp, encode_png

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    cls = d.groupBy((F.col("doc_id") % 16).alias("s")).agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("doc_id").alias("canonical_doc"),
    )

    def gen_eq(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                k: []
                for k in (
                    "s",
                    "n_images",
                    "canonical_doc",
                    "c_before",
                    "c_after",
                    "abs_shift",
                )
            }
            for s, n_images, canonical_doc in zip(
                pdf["s"], pdf["n_images"], pdf["canonical_doc"]
            ):
                s = int(s)
                w = h = 16
                pix = bytes(
                    (x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
                dw, dh, dc, dpix, _fmt = decode_image(enc)
                nch = min(dc, 3)
                gray = [
                    sum(dpix[(y * dw + x) * dc + ch] for ch in range(nch)) // nch
                    for y in range(dh)
                    for x in range(dw)
                ]
                n = len(gray)
                hist = [0] * 256
                for g in gray:
                    hist[g] += 1
                cdf, run = [0] * 256, 0
                for v in range(256):
                    run += hist[v]
                    cdf[v] = run
                cdf_min = min(cdf[v] for v in range(256) if hist[v] > 0)
                denom = n - cdf_min
                eq = [
                    ((cdf[v] - cdf_min) * 255 // denom) if denom > 0 else 0
                    for v in range(256)
                ]
                occ = [v for v in range(256) if hist[v] > 0]
                out["s"].append(s)
                out["n_images"].append(int(n_images))
                out["canonical_doc"].append(int(canonical_doc))
                out["c_before"].append(max(occ) - min(occ))
                out["c_after"].append(max(eq[v] for v in occ) - min(eq[v] for v in occ))
                out["abs_shift"].append(sum(abs(eq[g] - g) for g in gray))
            yield pd.DataFrame(out)

    scored = cls.mapInPandas(
        gen_eq,
        schema="s long, n_images long, canonical_doc long, "
        "c_before long, c_after long, abs_shift long",
    )
    # one row per residue class (the generator's own key), key dropped:
    # two classes with identical metrics stay separate rows, as the
    # oracle emits one row per class
    return scored.select(
        "c_before", "c_after", "abs_shift", "n_images", "canonical_doc"
    ).orderBy("abs_shift", "c_before")


MULTIMODAL_HIST_EQ_SQL = """
WITH px AS (
  SELECT s, x, y,
         ((((x*x + 2*y + 5*s + (s*x)//3) % 256)
         + ((x*x + 2*y + 5*s + 37 + (s*x)//3) % 256)
         + ((x*x + 2*y + 5*s + 74 + (s*x)//3) % 256)) // 3) AS g
  FROM generate_series(0, 15) ts(s),
       generate_series(0, 15) tx(x),
       generate_series(0, 15) ty(y)
),
hist AS (SELECT s, g, COUNT(*) AS c FROM px GROUP BY 1, 2),
cdf AS (
  SELECT s, g, c,
         SUM(c) OVER (PARTITION BY s ORDER BY g) AS cdf
  FROM hist
),
cm AS (SELECT s, MIN(cdf) AS cdf_min FROM cdf GROUP BY 1),
remap AS (
  SELECT cdf.s, cdf.g,
         CASE WHEN 256 - cm.cdf_min > 0
              THEN (cdf.cdf - cm.cdf_min) * 255 // (256 - cm.cdf_min)
              ELSE 0 END AS eq
  FROM cdf JOIN cm ON cm.s = cdf.s
),
per_s AS (
  SELECT r.s,
         MAX(r.g) - MIN(r.g) AS c_before,
         MAX(r.eq) - MIN(r.eq) AS c_after,
         SUM(h.c * ABS(r.eq - r.g)) AS abs_shift
  FROM remap r JOIN hist h ON h.s = r.s AND h.g = r.g
  GROUP BY 1
),
cls AS (
  SELECT doc_id % 16 AS s, COUNT(*) AS n_images, MIN(doc_id) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT CAST(p.c_before AS BIGINT) AS c_before,
       CAST(p.c_after AS BIGINT) AS c_after,
       CAST(p.abs_shift AS BIGINT) AS abs_shift,
       CAST(c.n_images AS BIGINT) AS n_images,
       CAST(c.canonical_doc AS BIGINT) AS canonical_doc
FROM per_s p JOIN cls c ON c.s = p.s
ORDER BY p.abs_shift, p.c_before
"""

QUERIES["multimodal_hist_equalization"] = multimodal_hist_equalization
ORACLE["multimodal_hist_equalization"] = MULTIMODAL_HIST_EQ_SQL


def multimodal_spectral_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral centroid of synthetic audio clips — the brightness
    feature (Σ k·|Xₖ| / Σ|Xₖ| over DFT magnitude bins) that audio
    curation uses to split speech-like from noise-like clips before
    transcription. Clips are the WAV fixture family keyed by
    s = doc_id % 64: tone sample i = (s·13 + i·11) % 1024 + 512,
    N = 48 + s % 16 samples; every clip round-trips encode_wav →
    decode_wav before analysis, and the oracle recomputes the SAME
    DFT symbolically in SQL from the sample formula — codec and
    spectrum both hash-checked.

    Engine-exact: DFT products x·cos/x·sin follow the periodogram
    trig discipline (6dp-rounded terms into exact Decimal sums —
    absorbs libm ulp differences; Python folds use
    quantize(ROUND_HALF_UP), never round()); bin magnitudes are
    6dp-rounded sqrt's; the centroid is a ratio of exact decimal
    sums, one identical IEEE division.

    Scale shape: one fused mapInPandas pass (decode + DFT per clip)
    with the per-class spectrum memoized inside the worker (64
    distinct clips — the distinct-value-histogram rule applied to
    audio); the only exchange is the 64-class rollup."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.audiocodec import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def centroid(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("1e-6")

        def r6(v: float) -> Decimal:
            return Decimal(repr(v)).quantize(q6, ROUND_HALF_UP)

        cache: dict[int, float] = {}

        def klass_centroid(s: int) -> float:
            if s in cache:
                return cache[s]
            n = 48 + s % 16
            tone = [(s * 13 + i * 11) % 1024 + 512 for i in range(n)]
            _, _, back = decode_wav(encode_wav(16000, tone))
            num, den = Decimal(0), Decimal(0)
            for k in range(1, n // 2 + 1):
                re, im = Decimal(0), Decimal(0)
                for i, x in enumerate(back):
                    a = 2 * 3.141592653589793 * k * i / n
                    re += r6(x * math.cos(a))
                    im += r6(x * math.sin(a))
                m = r6(math.sqrt(float(re) * float(re) + float(im) * float(im)))
                num += k * m
                den += m
            out = float(num) / float(den)
            cache[s] = out
            return out

        for pdf in it:
            rows = {"doc_id": [], "centroid_bin": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rows["doc_id"].append(doc_id)
                rows["centroid_bin"].append(klass_centroid(doc_id % 64))
            yield pd.DataFrame(rows)

    feats = d.mapInPandas(centroid, schema="doc_id long, centroid_bin double")
    return (
        feats.groupBy((F.col("doc_id") % 64).alias("s"))
        .agg(
            F.max("centroid_bin").alias("centroid_bin"),
            F.count(F.lit(1)).alias("n_clips"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .select("centroid_bin", "n_clips", "canonical_doc")
        .orderBy("canonical_doc")
    )


MULTIMODAL_SPECTRAL_CENTROID_SQL = """
WITH cls AS (
  SELECT s, 48 + s % 16 AS n
  FROM generate_series(0, 63) t(s)
),
terms AS (
  SELECT c.s, c.n, k.k, i.i,
         ((c.s * 13 + i.i * 11) % 1024 + 512) AS x
  FROM cls c,
       generate_series(1, 31) k(k),
       generate_series(0, 63) i(i)
  WHERE k.k <= c.n // 2 AND i.i < c.n
),
bins AS (
  SELECT s, n, k,
         SUM(CAST(ROUND(x * COS(2 * 3.141592653589793 * k * i / n), 6)
                  AS DECIMAL(18,6))) AS re,
         SUM(CAST(ROUND(x * SIN(2 * 3.141592653589793 * k * i / n), 6)
                  AS DECIMAL(18,6))) AS im
  FROM terms GROUP BY 1, 2, 3
),
mags AS (
  SELECT s, k,
         CAST(ROUND(SQRT(CAST(re AS DOUBLE) * CAST(re AS DOUBLE)
                         + CAST(im AS DOUBLE) * CAST(im AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS m
  FROM bins
),
per_s AS (
  SELECT s, CAST(SUM(k * m) AS DOUBLE) / CAST(SUM(m) AS DOUBLE) AS centroid_bin
  FROM mags GROUP BY 1
),
docs AS (
  SELECT doc_id % 64 AS s, COUNT(*) AS n_clips, MIN(doc_id) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT p.centroid_bin, CAST(d.n_clips AS BIGINT) AS n_clips,
       CAST(d.canonical_doc AS BIGINT) AS canonical_doc
FROM per_s p JOIN docs d ON d.s = p.s
ORDER BY canonical_doc
"""

QUERIES["multimodal_spectral_centroid"] = multimodal_spectral_centroid
ORACLE["multimodal_spectral_centroid"] = MULTIMODAL_SPECTRAL_CENTROID_SQL


def multimodal_dct_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D DCT-II energy compaction per image class — the JPEG-core
    statistic (share of AC energy landing in the low-frequency 4×4
    corner) that image curation uses to split smooth/natural images
    from noise/dithered ones before training. Each 8×8 grayscale
    block (class s = doc_id % 16, pixel g = (x²+3y+7s+(s·y)//2)%256)
    round-trips encode→decode through the real BMP/PNG codecs first,
    and the oracle recomputes the SAME transform symbolically in SQL
    from the pixel formula — codec, grayscale, and all 64 DCT
    coefficients are hash-checked.

    Engine-exact: cosine product terms follow the periodogram trig
    discipline (6dp-rounded terms into exact Decimal sums; Python
    folds use quantize(ROUND_HALF_UP), never round()); coefficient
    SQUARES are exact 12dp decimals summed exactly; both energy sums
    are rounded to 2dp decimals BEFORE the double cast (the
    DECIMAL→DOUBLE 2^53 rule) and the compaction ratio is one
    identical IEEE division, FLOOR-quantized to ppm.

    Scale shape: one fused mapInPandas pass with the 16-class result
    memoized inside the worker (distinct-value-histogram rule); the
    only exchange is the 16-group rollup."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp, encode_png

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def dct_feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        from decimal import ROUND_HALF_UP, Decimal

        q6, q2 = Decimal("1e-6"), Decimal("1e-2")

        def r6(v: float) -> Decimal:
            return Decimal(repr(v)).quantize(q6, ROUND_HALF_UP)

        cache: dict[int, tuple[int, float]] = {}

        def klass(s: int) -> tuple[int, float]:
            if s in cache:
                return cache[s]
            w = h = 8
            pix = bytes(
                v
                for y in range(h)
                for x in range(w)
                for v in [(x * x + 3 * y + 7 * s + (s * y) // 2) % 256] * 3
            )
            enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
            dw, dh, dc, dpix, _fmt = decode_image(enc)
            gray = [
                [
                    sum(dpix[(y * dw + x) * dc + ch] for ch in range(min(dc, 3)))
                    // min(dc, 3)
                    for x in range(dw)
                ]
                for y in range(dh)
            ]
            pi = 3.141592653589793
            num, den = Decimal(0), Decimal(0)
            for u in range(8):
                for v in range(8):
                    if u == 0 and v == 0:
                        continue
                    c = Decimal(0)
                    for y in range(8):
                        for x in range(8):
                            ca = math.cos(pi * (2 * x + 1) * u / 16)
                            cb = math.cos(pi * (2 * y + 1) * v / 16)
                            c += r6(gray[y][x] * ca * cb)
                    e2 = c * c  # exact 12dp decimal
                    den += e2
                    if u < 4 and v < 4:
                        num += e2
            num_d = float(num.quantize(q2, ROUND_HALF_UP))
            den_d = float(den.quantize(q2, ROUND_HALF_UP))
            out = (
                int(math.floor(num_d / den_d * 1000000)) if den_d > 0 else 1000000,
                den_d,
            )
            cache[s] = out
            return out

        for pdf in it:
            rows = {"doc_id": [], "compaction_ppm": [], "ac_energy": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                ppm, ac = klass(doc_id % 16)
                rows["doc_id"].append(doc_id)
                rows["compaction_ppm"].append(ppm)
                rows["ac_energy"].append(ac)
            yield pd.DataFrame(rows)

    feats = d.mapInPandas(
        dct_feats, schema="doc_id long, compaction_ppm long, ac_energy double"
    )
    return (
        feats.groupBy((F.col("doc_id") % 16).alias("s"))
        .agg(
            F.max("compaction_ppm").alias("compaction_ppm"),
            F.max("ac_energy").alias("ac_energy"),
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .select("compaction_ppm", "ac_energy", "n_images", "canonical_doc")
        .orderBy("canonical_doc")
    )


MULTIMODAL_DCT_SQL = """
WITH px AS (
  SELECT s, x, y,
         (x*x + 3*y + 7*s + (s*y)//2) % 256 AS g
  FROM generate_series(0, 15) ts(s),
       generate_series(0, 7) tx(x),
       generate_series(0, 7) ty(y)
),
coef AS (
  SELECT s, u, v,
         SUM(CAST(ROUND(g * COS(3.141592653589793 * (2*x + 1) * u / 16)
                          * COS(3.141592653589793 * (2*y + 1) * v / 16), 6)
                  AS DECIMAL(18,6))) AS c
  FROM px, generate_series(0, 7) tu(u), generate_series(0, 7) tv(v)
  WHERE NOT (u = 0 AND v = 0)
  GROUP BY 1, 2, 3
),
energy AS (
  SELECT s,
         SUM(CASE WHEN u < 4 AND v < 4 THEN c * c ELSE CAST(0 AS DECIMAL(38,12)) END)
           AS num,
         SUM(c * c) AS den
  FROM coef GROUP BY 1
),
cls AS (
  SELECT s,
         CAST(FLOOR(CAST(ROUND(num, 2) AS DOUBLE)
                    / CAST(ROUND(den, 2) AS DOUBLE) * 1000000) AS BIGINT)
           AS compaction_ppm,
         CAST(ROUND(den, 2) AS DOUBLE) AS ac_energy
  FROM energy
),
docs AS (
  SELECT doc_id % 16 AS s, COUNT(*) AS n_images, MIN(doc_id) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT cls.compaction_ppm, cls.ac_energy,
       CAST(docs.n_images AS BIGINT) AS n_images, docs.canonical_doc
FROM cls JOIN docs USING (s)
ORDER BY docs.canonical_doc
"""

QUERIES["multimodal_dct_energy"] = multimodal_dct_energy
ORACLE["multimodal_dct_energy"] = MULTIMODAL_DCT_SQL


def multimodal_rle_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise RLE compressibility of the synthetic image corpus —
    the cheap complexity prior a multimodal curation pipeline uses to
    screen flat/synthetic graphics from photographic content before
    spending decode-transform budget (flat banners compress to a few
    runs; textured content approaches one run per pixel). Same
    deterministic fixture family as multimodal_hist_equalization
    (16×16 RGB, pixel = f(doc_id % 16), BMP for even residues / PNG
    for odd), so encoder → decoder → grayscale → run counting is all
    value-checked against a symbolic SQL recomputation of the pixel
    formula (generate_series grid + LAG run-start detection).

    Engine-exact: run counts are pure integers; the ratio is integer
    ppm via DIV (2 bytes per run vs 256 gray bytes). No floats
    anywhere.

    Scale shape: generate→encode→decode→grayscale→RLE FUSED in ONE
    Arrow-batched mapInPandas pass (round-5 fuse rule); the only
    exchange is the 16-class rollup."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp, encode_png

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def gen_rle(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "n_runs")}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                s = doc_id % 16
                w = h = 16
                pix = bytes(
                    (x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
                dw, dh, dc, dpix, _fmt = decode_image(enc)
                nch = min(dc, 3)
                runs = 0
                for y in range(dh):
                    prev = None
                    for x in range(dw):
                        g = sum(dpix[(y * dw + x) * dc + ch] for ch in range(nch)) // nch
                        if g != prev:
                            runs += 1
                        prev = g
                out["doc_id"].append(doc_id)
                out["n_runs"].append(runs)
            yield pd.DataFrame(out)

    scored = d.mapInPandas(gen_rle, schema="doc_id long, n_runs long")
    return (
        scored.groupBy((F.col("doc_id") % 16).alias("s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.first("n_runs").cast("bigint").alias("n_runs"),  # identical within class
        )
        .select(
            "canonical_doc",
            "n_images",
            "n_runs",
            F.expr("CAST(n_runs * 2 * 1000000 DIV 256 AS BIGINT)").alias(
                "rle_ratio_ppm"
            ),
        )
        .orderBy("canonical_doc")
    )


MULTIMODAL_RLE_SQL = """
WITH px AS (
  SELECT s, x, y,
         ((((x*x + 2*y + 5*s + (s*x)//3) % 256)
         + ((x*x + 2*y + 5*s + 37 + (s*x)//3) % 256)
         + ((x*x + 2*y + 5*s + 74 + (s*x)//3) % 256)) // 3) AS g
  FROM generate_series(0, 15) ts(s),
       generate_series(0, 15) tx(x),
       generate_series(0, 15) ty(y)
),
runs AS (
  SELECT s,
         SUM(CASE WHEN prev IS NULL OR g <> prev THEN 1 ELSE 0 END) AS n_runs
  FROM (
    SELECT s, y, x, g,
           LAG(g) OVER (PARTITION BY s, y ORDER BY x) AS prev
    FROM px
  )
  GROUP BY 1
),
cls AS (
  SELECT doc_id % 16 AS s, COUNT(*) AS n_images, MIN(doc_id) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT CAST(c.canonical_doc AS BIGINT) AS canonical_doc,
       CAST(c.n_images AS BIGINT) AS n_images,
       CAST(r.n_runs AS BIGINT) AS n_runs,
       CAST(r.n_runs * 2 * 1000000 // 256 AS BIGINT) AS rle_ratio_ppm
FROM runs r JOIN cls c ON c.s = r.s
ORDER BY canonical_doc
"""

QUERIES["multimodal_rle_compressibility"] = multimodal_rle_compressibility
ORACLE["multimodal_rle_compressibility"] = MULTIMODAL_RLE_SQL


def multimodal_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-crossing rate of the WAV fixture clips (s = doc_id % 64,
    tone sample i = (s·13 + i·11) % 1024 + 512, N = 48 + s % 16) —
    the cheapest speech/music/noise discriminator an audio curation
    pass runs before anything spectral (voiced speech ZCR is low,
    fricatives/noise high). Every clip round-trips encode_wav →
    decode_wav, so the codec stays on the hash path.

    FULLY INTEGER: a crossing is a strict sign change of (N·x − S)
    around the clip mean (cross-multiplied — never a float mean);
    ZCR is integer ppm of the N−1 adjacent pairs. The oracle
    recomputes the identical algebra symbolically from the sample
    formula (generate_series grid), so encoder, decoder, and
    crossing logic are all value-checked.

    Scale shape: ONE fused mapInPandas pass with the 64-class result
    memoized in-worker (the distinct-value rule); the exchange is
    the 64-class rollup."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.audiocodec import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def zcr(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, tuple[int, int]] = {}

        def klass(s: int) -> tuple[int, int]:
            if s in cache:
                return cache[s]
            n = 48 + s % 16
            tone = [(s * 13 + i * 11) % 1024 + 512 for i in range(n)]
            _, _, back = decode_wav(encode_wav(16000, tone))
            total = sum(back)
            nn = len(back)
            sgn = [
                1 if nn * x - total > 0 else (-1 if nn * x - total < 0 else 0)
                for x in back
            ]
            crossings = sum(
                1
                for a, b in zip(sgn, sgn[1:])
                if a != 0 and b != 0 and a != b
            )
            cache[s] = (nn, crossings)
            return cache[s]

        for pdf in it:
            out = {"doc_id": [], "n_samples": [], "crossings": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                nn, cr = klass(doc_id % 64)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(nn)
                out["crossings"].append(cr)
            yield pd.DataFrame(out)

    scored = d.mapInPandas(zcr, schema="doc_id long, n_samples long, crossings long")
    return (
        scored.groupBy((F.col("doc_id") % 64).alias("s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clips"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.first("n_samples").cast("bigint").alias("n_samples"),
            F.first("crossings").cast("bigint").alias("crossings"),
        )
        .select(
            "canonical_doc",
            "n_clips",
            "n_samples",
            "crossings",
            F.expr("CAST(crossings * 1000000 DIV (n_samples - 1) AS BIGINT)").alias(
                "zcr_ppm"
            ),
        )
        .orderBy("canonical_doc")
    )


MULTIMODAL_ZCR_SQL = """
WITH samples AS (
  SELECT s, i, (s * 13 + i * 11) % 1024 + 512 AS x,
         48 + s % 16 AS n
  FROM generate_series(0, 63) ts(s),
       generate_series(0, 63) ti(i)
  WHERE i < 48 + s % 16
),
tot AS (SELECT s, CAST(SUM(x) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS nn
        FROM samples GROUP BY 1),
sgn AS (
  SELECT sa.s, sa.i,
         CASE WHEN t.nn * sa.x - t.total > 0 THEN 1
              WHEN t.nn * sa.x - t.total < 0 THEN -1 ELSE 0 END AS sg
  FROM samples sa JOIN tot t ON t.s = sa.s
),
cr AS (
  SELECT s,
         SUM(CASE WHEN sg <> 0 AND prev <> 0 AND sg <> prev THEN 1 ELSE 0 END)
           AS crossings
  FROM (SELECT s, i, sg, LAG(sg) OVER (PARTITION BY s ORDER BY i) AS prev FROM sgn)
  WHERE prev IS NOT NULL
  GROUP BY 1
),
cls AS (
  SELECT doc_id % 64 AS s, COUNT(*) AS n_clips, MIN(doc_id) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT CAST(c.canonical_doc AS BIGINT) AS canonical_doc,
       CAST(c.n_clips AS BIGINT) AS n_clips,
       CAST(t.nn AS BIGINT) AS n_samples,
       CAST(r.crossings AS BIGINT) AS crossings,
       CAST(r.crossings * 1000000 // (t.nn - 1) AS BIGINT) AS zcr_ppm
FROM cr r JOIN tot t ON t.s = r.s JOIN cls c ON c.s = r.s
ORDER BY canonical_doc
"""

QUERIES["multimodal_audio_zcr"] = multimodal_audio_zcr
ORACLE["multimodal_audio_zcr"] = MULTIMODAL_ZCR_SQL


def multimodal_image_ssim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global SSIM (Wang et al. 2004) between each image class and
    its successor (s vs (s+1) % 16) on the deterministic BMP/PNG
    fixture — the perceptual similarity score a near-dup visual
    pipeline uses where pixel MSE misleads (luminance/contrast/
    structure are factored, not summed). Computed single-window over
    the whole 16×16 grayscale (documented: the windowed mean-SSIM
    variant averages this statistic over 8×8 patches).

    Determinism: the five sufficient statistics (Σx, Σy, Σx², Σy²,
    Σxy) are exact integers off the decoded pixels; the SSIM close
    is ONE identical IEEE double expression with literal C1/C2
    stabilizers, one-shot 6dp ROUND. The oracle recomputes the same
    statistics symbolically from the pixel formula — encoder,
    decoder, grayscale, and pairing all on the hash path.

    Scale shape: one fused mapInPandas pass, per-class stats
    memoized in-worker; the pair close runs on 16 rows."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp, encode_png

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, list[int]] = {}

        def gray(s: int) -> list[int]:
            if s in cache:
                return cache[s]
            w = h = 16
            pix = bytes(
                (x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
            dw, dh, dc, dpix, _f = decode_image(enc)
            nch = min(dc, 3)
            g = [
                sum(dpix[(y * dw + x) * dc + ch] for ch in range(nch)) // nch
                for y in range(dh)
                for x in range(dw)
            ]
            cache[s] = g
            return g

        for pdf in it:
            out = {k: [] for k in ("doc_id", "sx", "sy", "sxx", "syy", "sxy")}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                s = doc_id % 16
                gx, gy = gray(s), gray((s + 1) % 16)
                out["doc_id"].append(doc_id)
                out["sx"].append(sum(gx))
                out["sy"].append(sum(gy))
                out["sxx"].append(sum(v * v for v in gx))
                out["syy"].append(sum(v * v for v in gy))
                out["sxy"].append(sum(a * b for a, b in zip(gx, gy)))
            yield pd.DataFrame(out)

    scored = d.mapInPandas(
        stats, schema="doc_id long, sx long, sy long, sxx long, syy long, sxy long"
    )
    per_class = scored.groupBy((F.col("doc_id") % 16).alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.min("doc_id").cast("bigint").alias("canonical_doc"),
        F.first("sx").cast("bigint").alias("sx"),
        F.first("sy").cast("bigint").alias("sy"),
        F.first("sxx").cast("bigint").alias("sxx"),
        F.first("syy").cast("bigint").alias("syy"),
        F.first("sxy").cast("bigint").alias("sxy"),
    )
    # plain decimal literals parse as DECIMAL in Spark SQL — force
    # every term through DOUBLE so both engines run IEEE arithmetic
    n = "CAST(256 AS DOUBLE)"
    c1, c2 = "CAST(6.5025 AS DOUBLE)", "CAST(58.5225 AS DOUBLE)"
    two = "CAST(2 AS DOUBLE)"
    mx, my = f"(CAST(sx AS DOUBLE) / {n})", f"(CAST(sy AS DOUBLE) / {n})"
    vx = f"(CAST(sxx AS DOUBLE) / {n} - {mx} * {mx})"
    vy = f"(CAST(syy AS DOUBLE) / {n} - {my} * {my})"
    cov = f"(CAST(sxy AS DOUBLE) / {n} - {mx} * {my})"
    ssim = (
        f"ROUND((({two} * {mx} * {my} + {c1}) * ({two} * {cov} + {c2}))"
        f" / (({mx} * {mx} + {my} * {my} + {c1}) * ({vx} + {vy} + {c2})), 6)"
    )
    return per_class.select(
        "canonical_doc",
        "n_images",
        F.expr(ssim).alias("ssim_next_class"),
    ).orderBy("canonical_doc")


MULTIMODAL_SSIM_SQL = """
WITH px AS (
  SELECT s, x, y,
         ((((x*x + 2*y + 5*s + (s*x)//3) % 256)
         + ((x*x + 2*y + 5*s + 37 + (s*x)//3) % 256)
         + ((x*x + 2*y + 5*s + 74 + (s*x)//3) % 256)) // 3) AS g
  FROM generate_series(0, 15) ts(s),
       generate_series(0, 15) tx(x),
       generate_series(0, 15) ty(y)
),
paired AS (
  SELECT a.s, a.g AS gx, b.g AS gy
  FROM px a JOIN px b ON b.s = (a.s + 1) % 16 AND b.x = a.x AND b.y = a.y
),
st AS (
  SELECT s,
         CAST(SUM(gx) AS BIGINT) AS sx, CAST(SUM(gy) AS BIGINT) AS sy,
         CAST(SUM(gx * gx) AS BIGINT) AS sxx, CAST(SUM(gy * gy) AS BIGINT) AS syy,
         CAST(SUM(gx * gy) AS BIGINT) AS sxy
  FROM paired GROUP BY 1
),
cls AS (
  SELECT doc_id % 16 AS s, COUNT(*) AS n_images, MIN(doc_id) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT CAST(c.canonical_doc AS BIGINT) AS canonical_doc,
       CAST(c.n_images AS BIGINT) AS n_images,
       ROUND(((CAST(2 AS DOUBLE) * (CAST(sx AS DOUBLE) / 256) * (CAST(sy AS DOUBLE) / 256)
               + CAST(6.5025 AS DOUBLE))
              * (CAST(2 AS DOUBLE) * (CAST(sxy AS DOUBLE) / 256
                 - (CAST(sx AS DOUBLE) / 256) * (CAST(sy AS DOUBLE) / 256))
                 + CAST(58.5225 AS DOUBLE)))
             / (((CAST(sx AS DOUBLE) / 256) * (CAST(sx AS DOUBLE) / 256)
                 + (CAST(sy AS DOUBLE) / 256) * (CAST(sy AS DOUBLE) / 256)
                 + CAST(6.5025 AS DOUBLE))
                * ((CAST(sxx AS DOUBLE) / 256 - (CAST(sx AS DOUBLE) / 256) * (CAST(sx AS DOUBLE) / 256))
                   + (CAST(syy AS DOUBLE) / 256 - (CAST(sy AS DOUBLE) / 256) * (CAST(sy AS DOUBLE) / 256))
                   + CAST(58.5225 AS DOUBLE))), 6)
         AS ssim_next_class
FROM st JOIN cls c ON c.s = st.s
ORDER BY canonical_doc
"""

QUERIES["multimodal_image_ssim"] = multimodal_image_ssim
ORACLE["multimodal_image_ssim"] = MULTIMODAL_SSIM_SQL


# ---------------------------------------------------------------------------
# multimodal_hu_moments — shape-invariant image descriptors (round 10)
# ---------------------------------------------------------------------------

# Hu close over the ten integer raw moments — ONE expression string
# shared verbatim by Spark and DuckDB (generate once, run twice).
_HU_CLOSE = """
  CAST(m00 AS DOUBLE) AS mu00,
  ROUND((CAST(m20 AS DOUBLE) - CAST(m10 AS DOUBLE) / m00 * m10
       + CAST(m02 AS DOUBLE) - CAST(m01 AS DOUBLE) / m00 * m01)
       / (CAST(m00 AS DOUBLE) * m00), 6) AS hu1,
  ROUND((POW((CAST(m20 AS DOUBLE) - CAST(m10 AS DOUBLE) / m00 * m10
            - (CAST(m02 AS DOUBLE) - CAST(m01 AS DOUBLE) / m00 * m01)), 2)
       + CAST(4 AS DOUBLE) * POW(CAST(m11 AS DOUBLE) - CAST(m10 AS DOUBLE) / m00 * m01, 2))
       / POW(CAST(m00 AS DOUBLE) * m00, 2), 6) AS hu2,
  ROUND((POW((CAST(m30 AS DOUBLE) - CAST(3 AS DOUBLE) * m10 / m00 * m20
             + CAST(2 AS DOUBLE) * m10 / m00 * (CAST(m10 AS DOUBLE) / m00) * m10)
           - CAST(3 AS DOUBLE) * (CAST(m12 AS DOUBLE)
             - CAST(2 AS DOUBLE) * m01 / m00 * m11
             - CAST(m10 AS DOUBLE) / m00 * m02
             + CAST(2 AS DOUBLE) * m01 / m00 * (CAST(m01 AS DOUBLE) / m00) * m10), 2)
       + POW(CAST(3 AS DOUBLE) * (CAST(m21 AS DOUBLE)
             - CAST(2 AS DOUBLE) * m10 / m00 * m11
             - CAST(m01 AS DOUBLE) / m00 * m20
             + CAST(2 AS DOUBLE) * m10 / m00 * (CAST(m10 AS DOUBLE) / m00) * m01)
           - (CAST(m03 AS DOUBLE) - CAST(3 AS DOUBLE) * m01 / m00 * m02
             + CAST(2 AS DOUBLE) * m01 / m00 * (CAST(m01 AS DOUBLE) / m00) * m01), 2))
       / POW(CAST(m00 AS DOUBLE) * m00 * SQRT(CAST(m00 AS DOUBLE)), 2), 6) AS hu3
"""


def multimodal_hu_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hu moment invariants (Hu 1962) per image class on the
    deterministic BMP/PNG fixture — the classic translation/scale/
    rotation-invariant shape descriptors a visual-dedup or
    class-routing pipeline extracts when embeddings are overkill
    (hu1 ≈ spread, hu2 ≈ anisotropy, hu3 ≈ third-order skew).

    Determinism: the TEN raw moments M_pq = Σ xᵖyᑫ·g(x,y) (p+q ≤ 3)
    are exact integers off the decoded pixels (bounded: 16³·255·256
    < 2⁵³); central/normalized moments and the Hu closes are ONE
    shared IEEE expression string evaluated by both engines (every
    constant CAST AS DOUBLE — the SSIM bare-literal rule), one-shot
    6dp ROUND. The oracle recomputes the moments symbolically from
    the pixel formula — encoder, decoder, grayscale all on the hash
    path.

    Scale shape: one fused mapInPandas pass (per-class moments
    memoized in-worker), close on 16 rows."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp, encode_png

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    NAMES = ["m00", "m10", "m01", "m20", "m11", "m02", "m30", "m21", "m12", "m03"]
    PQ = [(0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2), (3, 0), (2, 1), (1, 2), (0, 3)]

    def moments(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, list[int]] = {}

        def mom(s: int) -> list[int]:
            if s in cache:
                return cache[s]
            w = h = 16
            pix = bytes(
                (x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
            dw, dh, dc, dpix, _f = decode_image(enc)
            nch = min(dc, 3)
            ms = [0] * len(PQ)
            for y in range(dh):
                for x in range(dw):
                    g = sum(dpix[(y * dw + x) * dc + ch] for ch in range(nch)) // nch
                    for i, (p, q) in enumerate(PQ):
                        ms[i] += (x**p) * (y**q) * g
            cache[s] = ms
            return ms

        for pdf in it:
            out = {"doc_id": []}
            for nm in NAMES:
                out[nm] = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                ms = mom(doc_id % 16)
                out["doc_id"].append(doc_id)
                for nm, v in zip(NAMES, ms):
                    out[nm].append(v)
            yield pd.DataFrame(out)

    schema = "doc_id long, " + ", ".join(f"{nm} long" for nm in NAMES)
    scored = d.mapInPandas(moments, schema=schema)
    per_class = scored.groupBy((F.col("doc_id") % 16).alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.min("doc_id").cast("bigint").alias("canonical_doc"),
        *[F.first(nm).cast("bigint").alias(nm) for nm in NAMES],
    )
    return per_class.selectExpr(
        "canonical_doc", "n_images", *_HU_CLOSE.strip().split(",\n  ")
    ).orderBy("canonical_doc")


MULTIMODAL_HU_SQL = f"""
WITH px AS (
  SELECT s, x, y,
         ((((x*x + 2*y + 5*s + (s*x)//3) % 256)
         + ((x*x + 2*y + 5*s + 37 + (s*x)//3) % 256)
         + ((x*x + 2*y + 5*s + 74 + (s*x)//3) % 256)) // 3) AS g
  FROM generate_series(0, 15) ts(s),
       generate_series(0, 15) tx(x),
       generate_series(0, 15) ty(y)
),
mom AS (
  SELECT s,
         CAST(SUM(g) AS BIGINT) AS m00,
         CAST(SUM(x * g) AS BIGINT) AS m10,
         CAST(SUM(y * g) AS BIGINT) AS m01,
         CAST(SUM(x * x * g) AS BIGINT) AS m20,
         CAST(SUM(x * y * g) AS BIGINT) AS m11,
         CAST(SUM(y * y * g) AS BIGINT) AS m02,
         CAST(SUM(x * x * x * g) AS BIGINT) AS m30,
         CAST(SUM(x * x * y * g) AS BIGINT) AS m21,
         CAST(SUM(x * y * y * g) AS BIGINT) AS m12,
         CAST(SUM(y * y * y * g) AS BIGINT) AS m03
  FROM px GROUP BY 1
),
cls AS (
  SELECT doc_id % 16 AS s, CAST(COUNT(*) AS BIGINT) AS n_images,
         CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT canonical_doc, n_images,
{_HU_CLOSE}
FROM cls JOIN mom USING (s)
ORDER BY canonical_doc
"""

QUERIES["multimodal_hu_moments"] = multimodal_hu_moments
ORACLE["multimodal_hu_moments"] = MULTIMODAL_HU_SQL


# ---------------------------------------------------------------------------
# multimodal_audio_onsets — frame-energy onset detection (round 10)
# ---------------------------------------------------------------------------


def multimodal_audio_onsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onset detection on the WAV fixture clips (s = doc_id % 64):
    8-sample frame energies E_f = Σx², an onset fires where the
    energy more than doubles frame-over-frame (E_f > 2·E_{f−1}) —
    the attack detector an audio curation pass runs to segment
    clips, reject silence-padded uploads, and estimate tempo-ish
    density (pairs with multimodal_silence_trim / spectral_centroid
    on the same fixture). Every clip round-trips encode_wav →
    decode_wav so the codec stays on the hash path.

    FULLY INTEGER: energies are integer sums of squares, the onset
    predicate is one integer compare, and the emitted max jump is
    the cross-multiplied ratio E_f·1000 DIV E_{f−1} — no float
    anywhere.

    Scale shape: ONE fused mapInPandas pass, 64-class memoization,
    64-row rollup."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.audiocodec import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def onsets(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, tuple[int, int, int]] = {}

        def klass(s: int) -> tuple[int, int, int]:
            if s in cache:
                return cache[s]
            n = 48 + s % 16
            tone = [(s * 13 + i * 11) % 1024 + 512 for i in range(n)]
            _, _, back = decode_wav(encode_wav(16000, tone))
            frames = [back[i : i + 8] for i in range(0, len(back) - len(back) % 8, 8)]
            en = [sum(x * x for x in f) for f in frames]
            n_on = sum(1 for a, b in zip(en, en[1:]) if b > 2 * a)
            max_jump = max(
                (b * 1000 // a for a, b in zip(en, en[1:]) if a > 0), default=0
            )
            cache[s] = (len(en), n_on, max_jump)
            return cache[s]

        for pdf in it:
            out = {"doc_id": [], "n_frames": [], "n_onsets": [], "max_jump_x1000": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                nf, no, mj = klass(doc_id % 64)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(nf)
                out["n_onsets"].append(no)
                out["max_jump_x1000"].append(mj)
            yield pd.DataFrame(out)

    scored = d.mapInPandas(
        onsets, schema="doc_id long, n_frames long, n_onsets long, max_jump_x1000 long"
    )
    return (
        scored.groupBy((F.col("doc_id") % 64).alias("s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clips"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.first("n_frames").cast("bigint").alias("n_frames"),
            F.first("n_onsets").cast("bigint").alias("n_onsets"),
            F.first("max_jump_x1000").cast("bigint").alias("max_jump_x1000"),
        )
        .select("canonical_doc", "n_clips", "n_frames", "n_onsets", "max_jump_x1000")
        .orderBy("canonical_doc")
    )


MULTIMODAL_ONSETS_SQL = """
WITH samp AS (
  SELECT s, i, (s * 13 + i * 11) % 1024 + 512 AS x
  FROM generate_series(0, 63) ts(s), generate_series(0, 63) ti(i)
  WHERE i < 48 + s % 16
),
fr AS (
  SELECT s, i // 8 AS f, CAST(SUM(x * x) AS BIGINT) AS en
  FROM samp
  WHERE i < ((48 + s % 16) // 8) * 8
  GROUP BY 1, 2
),
jumps AS (
  SELECT s, f, en,
         LAG(en) OVER (PARTITION BY s ORDER BY f) AS prev
  FROM fr
),
per AS (
  SELECT s,
         CAST(COUNT(*) AS BIGINT) AS n_frames,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND en > 2 * prev THEN 1 ELSE 0 END)
              AS BIGINT) AS n_onsets,
         CAST(COALESCE(MAX(CASE WHEN prev > 0 THEN en * 1000 // prev END), 0)
              AS BIGINT) AS max_jump_x1000
  FROM jumps GROUP BY 1
),
cls AS (
  SELECT doc_id % 64 AS s, CAST(COUNT(*) AS BIGINT) AS n_clips,
         CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT canonical_doc, n_clips, n_frames, n_onsets, max_jump_x1000
FROM cls JOIN per USING (s)
ORDER BY canonical_doc
"""

QUERIES["multimodal_audio_onsets"] = multimodal_audio_onsets
ORACLE["multimodal_audio_onsets"] = MULTIMODAL_ONSETS_SQL


# ---------------------------------------------------------------------------
# multimodal_blockiness — JPEG-style 8x8 block-boundary artifact metric
# (round 10)
# ---------------------------------------------------------------------------


def multimodal_blockiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-artifact screening for an image training corpus:
    the blockiness metric compares the mean luminance gradient ACROSS
    8x8 block boundaries to the mean gradient INSIDE blocks — a ratio
    near 1 means no blocking; >>1 flags JPEG-style block artifacts
    worth filtering/deweighting before training. The synthetic 16x16
    fixtures carry REAL block structure (pixel formula has x//8, y//8
    plateau terms), so the metric is exercised, not vacuous.

    Engine-exact: the full path — encode (BMP even residue / PNG odd)
    → decode → integer grayscale → boundary/interior absolute
    gradients → integer-ppm ratio — is pure integer math, and the
    oracle recomputes the same sums SYMBOLICALLY from the pixel
    formula (generate_series grid + neighbor join), so a one-pixel
    codec bug splits a residue class immediately.

    Scale shape: generation+codec round-trip+gradients FUSED into ONE
    Arrow-batched mapInPandas pass (round-5 fuse rule); the only
    exchange is the 16-residue-class aggregate. Real corpora swap the
    generator for the payload column; the gradient path is unchanged."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp, encode_png

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def gen_block(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, bnds, ints, ppms = [], [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                s = doc_id % 16
                w = h = 16
                pix = bytes(
                    ((x // 8) * 40 + (y // 8) * 24 + x + 2 * y + 5 * s + 37 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
                dw, dh, dc, dpix, _fmt = decode_image(enc)
                gray = [
                    [
                        sum(dpix[(y * dw + x) * dc + ch] for ch in range(min(dc, 3)))
                        // min(dc, 3)
                        for x in range(dw)
                    ]
                    for y in range(dh)
                ]
                bnd = icnt = bsum = isum = 0
                for y in range(dh):
                    for x in range(dw - 1):
                        g = abs(gray[y][x + 1] - gray[y][x])
                        if (x + 1) % 8 == 0:
                            bsum += g
                            bnd += 1
                        else:
                            isum += g
                            icnt += 1
                for y in range(dh - 1):
                    for x in range(dw):
                        g = abs(gray[y + 1][x] - gray[y][x])
                        if (y + 1) % 8 == 0:
                            bsum += g
                            bnd += 1
                        else:
                            isum += g
                            icnt += 1
                ids.append(doc_id)
                bnds.append(bsum)
                ints.append(isum)
                ppms.append(bsum * icnt * 1_000_000 // max(isum * bnd, 1))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "boundary_grad": bnds,
                    "interior_grad": ints,
                    "blockiness_ppm": ppms,
                }
            )

    scored = d.mapInPandas(
        gen_block,
        schema="doc_id long, boundary_grad long, interior_grad long, blockiness_ppm long",
    )
    return (
        scored.groupBy("blockiness_ppm", "boundary_grad", "interior_grad")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
        )
        .orderBy("blockiness_ppm", "boundary_grad")
    )


MULTIMODAL_BLOCKINESS_SQL = """
WITH px AS (
  SELECT s, x, y,
         (((x//8)*40 + (y//8)*24 + x + 2*y + 5*s) % 256
          + ((x//8)*40 + (y//8)*24 + x + 2*y + 5*s + 37) % 256
          + ((x//8)*40 + (y//8)*24 + x + 2*y + 5*s + 74) % 256) // 3 AS g
  FROM generate_series(0, 15) ts(s),
       generate_series(0, 15) tx(x),
       generate_series(0, 15) ty(y)
),
hgrad AS (
  SELECT c.s, ABS(n.g - c.g) AS gr, ((c.x + 1) % 8 = 0) AS is_b
  FROM px c JOIN px n ON n.s = c.s AND n.y = c.y AND n.x = c.x + 1
),
vgrad AS (
  SELECT c.s, ABS(n.g - c.g) AS gr, ((c.y + 1) % 8 = 0) AS is_b
  FROM px c JOIN px n ON n.s = c.s AND n.x = c.x AND n.y = c.y + 1
),
allg AS (SELECT * FROM hgrad UNION ALL SELECT * FROM vgrad),
met AS (
  SELECT s,
         CAST(SUM(CASE WHEN is_b THEN gr ELSE 0 END) AS BIGINT) AS boundary_grad,
         CAST(SUM(CASE WHEN NOT is_b THEN gr ELSE 0 END) AS BIGINT) AS interior_grad,
         CAST(SUM(CASE WHEN is_b THEN gr ELSE 0 END)
              * SUM(CASE WHEN NOT is_b THEN 1 ELSE 0 END) * 1000000
              // GREATEST(SUM(CASE WHEN NOT is_b THEN gr ELSE 0 END)
                          * SUM(CASE WHEN is_b THEN 1 ELSE 0 END), 1) AS BIGINT)
           AS blockiness_ppm
  FROM allg GROUP BY 1
),
docs AS (SELECT doc_id, doc_id % 16 AS s FROM documents)
SELECT m.blockiness_ppm, m.boundary_grad, m.interior_grad,
       MIN(d.doc_id) AS canonical_doc,
       CAST(COUNT(*) AS BIGINT) AS n_images
FROM docs d JOIN met m USING (s)
GROUP BY 1, 2, 3
ORDER BY blockiness_ppm, boundary_grad
"""

QUERIES["multimodal_blockiness"] = multimodal_blockiness
ORACLE["multimodal_blockiness"] = MULTIMODAL_BLOCKINESS_SQL


# ---------------------------------------------------------------------------
# multimodal_audio_clipping — full-scale plateau (clipping) detection
# (round 10)
# ---------------------------------------------------------------------------


def multimodal_audio_clipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipping screen for an audio training corpus: per clip, the
    fraction of samples pinned at full scale and the longest
    consecutive full-scale run — the two numbers an audio curation
    pass thresholds to reject hard-clipped uploads (a high clip_ppm
    with short runs is loud material; long runs are true clipping).
    The synthetic fixture (s = doc_id % 64) PLANTS clipping: a
    symmetric tone ((s*13 + i*29) % 4001) - 2000 hard-limited at
    ±1500, so ~25% of samples sit on the rails in deterministic runs.
    Every clip round-trips encode_wav → decode_wav (negative int16
    path included) so the codec stays on the hash path.

    FULLY INTEGER: the clip predicate is |x| >= ceiling, run lengths
    are loop counters, and the emitted rate is integer ppm
    (n_clipped*1e6 DIV n) — no float anywhere. The oracle recomputes
    the same runs symbolically (gaps-and-islands over the sample
    grid).

    Scale shape: ONE fused mapInPandas pass (r5 fuse rule), 64-class
    memoization, 64-row rollup; a real corpus swaps the generator for
    the payload column and drops the memo."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.audiocodec import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def clipscan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, tuple[int, int, int, int]] = {}

        def klass(s: int) -> tuple[int, int, int, int]:
            if s in cache:
                return cache[s]
            n = 40 + (s * 7) % 24
            tone = [
                max(min((s * 13 + i * 29) % 4001 - 2000, 1500), -1500)
                for i in range(n)
            ]
            _, _, back = decode_wav(encode_wav(16000, tone))
            n_clipped = sum(1 for x in back if abs(x) >= 1500)
            max_run = run = 0
            for x in back:
                run = run + 1 if abs(x) >= 1500 else 0
                max_run = max(max_run, run)
            cache[s] = (len(back), n_clipped, n_clipped * 1_000_000 // len(back), max_run)
            return cache[s]

        for pdf in it:
            out = {
                "doc_id": [],
                "n_samples": [],
                "n_clipped": [],
                "clip_ppm": [],
                "max_clip_run": [],
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                ns, nc, ppm, mr = klass(doc_id % 64)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(ns)
                out["n_clipped"].append(nc)
                out["clip_ppm"].append(ppm)
                out["max_clip_run"].append(mr)
            yield pd.DataFrame(out)

    scored = d.mapInPandas(
        clipscan,
        schema=(
            "doc_id long, n_samples long, n_clipped long,"
            " clip_ppm long, max_clip_run long"
        ),
    )
    return (
        scored.groupBy((F.col("doc_id") % 64).alias("s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clips"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.first("n_samples").cast("bigint").alias("n_samples"),
            F.first("n_clipped").cast("bigint").alias("n_clipped"),
            F.first("clip_ppm").cast("bigint").alias("clip_ppm"),
            F.first("max_clip_run").cast("bigint").alias("max_clip_run"),
        )
        .select(
            "canonical_doc", "n_clips", "n_samples", "n_clipped",
            "clip_ppm", "max_clip_run",
        )
        .orderBy("canonical_doc")
    )


MULTIMODAL_CLIPPING_SQL = """
WITH samp AS (
  SELECT s, i,
         GREATEST(LEAST((s * 13 + i * 29) % 4001 - 2000, 1500), -1500) AS x
  FROM generate_series(0, 63) ts(s), generate_series(0, 62) ti(i)
  WHERE i < 40 + (s * 7) % 24
),
fl AS (
  SELECT s, i, (ABS(x) >= 1500) AS c FROM samp
),
grp AS (
  SELECT s, c, COUNT(*) AS len
  FROM (SELECT s, i, c,
               i - ROW_NUMBER() OVER (PARTITION BY s, c ORDER BY i) AS g
        FROM fl)
  GROUP BY s, c, g
),
per AS (
  SELECT f.s,
         CAST(COUNT(*) AS BIGINT) AS n_samples,
         CAST(SUM(CASE WHEN f.c THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
         CAST(SUM(CASE WHEN f.c THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
              AS BIGINT) AS clip_ppm
  FROM fl f GROUP BY 1
),
runs AS (
  SELECT s, CAST(COALESCE(MAX(CASE WHEN c THEN len END), 0) AS BIGINT) AS max_clip_run
  FROM grp GROUP BY 1
),
cls AS (
  SELECT doc_id % 64 AS s, CAST(COUNT(*) AS BIGINT) AS n_clips,
         CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT canonical_doc, n_clips, n_samples, n_clipped, clip_ppm, max_clip_run
FROM cls JOIN per USING (s) JOIN runs USING (s)
ORDER BY canonical_doc
"""

QUERIES["multimodal_audio_clipping"] = multimodal_audio_clipping
ORACLE["multimodal_audio_clipping"] = MULTIMODAL_CLIPPING_SQL


# ---------------------------------------------------------------------------
# multimodal_stereo_balance — stereo channel balance / correlation screen
# (round 10)
# ---------------------------------------------------------------------------


def multimodal_stereo_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stereo channel screen on 2-channel WAV fixtures (s = doc_id %
    64): per clip the L/R energy balance (integer ppm of total energy
    in the left channel), the dominant channel, and the sign of the
    inter-channel zero-lag cross-correlation (in-phase vs anti-phase
    — dual-mono uploads show balance ≈ 500000 with positive
    correlation; a wiring fault shows anti-phase). This is the FIRST
    query through the codec's n_channels=2 interleaved path — encode
    and decode of stereo framing (block align, per-frame
    interleaving) land on the hash gate here.

    Fixture plants both phase classes: L_i = tone, R_i = tone shifted
    by a per-class gain twist, NEGATED for s % 3 == 0 (anti-phase
    plant). FULLY INTEGER: energies and the cross-product are exact
    integer sums; balance is ppm DIV; correlation is emitted as its
    SIGN (-1/0/1) — no float anywhere.

    Scale shape: ONE fused mapInPandas pass, 64-class memoization,
    64-row rollup."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.audiocodec import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def stereo(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, tuple[int, int, int, int]] = {}

        def klass(s: int) -> tuple[int, int, int, int]:
            if s in cache:
                return cache[s]
            n = 32 + (s * 5) % 24
            left = [((s * 11 + i * 23) % 2001) - 1000 for i in range(n)]
            gain = 1 + s % 4
            sign = -1 if s % 3 == 0 else 1

            def tdiv4(a: int) -> int:
                # trunc-toward-zero like SQL // — Python // floors
                q = abs(a) // 4
                return q if a >= 0 else -q

            right = [sign * tdiv4(v * gain) for v in left]
            inter = []
            for a, b in zip(left, right):
                inter.extend((a, b))
            rate, nch, back = decode_wav(encode_wav(8000, inter, n_channels=2))
            assert nch == 2
            lb, rb = back[0::2], back[1::2]
            el = sum(v * v for v in lb)
            er = sum(v * v for v in rb)
            xc = sum(a * b for a, b in zip(lb, rb))
            bal = el * 1_000_000 // (el + er)
            cache[s] = (len(lb), bal, (xc > 0) - (xc < 0), 1 if el >= er else 0)
            return cache[s]

        for pdf in it:
            out = {
                "doc_id": [],
                "n_frames": [],
                "left_energy_ppm": [],
                "corr_sign": [],
                "left_dominant": [],
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                nf, bal, cs, ld = klass(doc_id % 64)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(nf)
                out["left_energy_ppm"].append(bal)
                out["corr_sign"].append(cs)
                out["left_dominant"].append(ld)
            yield pd.DataFrame(out)

    scored = d.mapInPandas(
        stereo,
        schema=(
            "doc_id long, n_frames long, left_energy_ppm long,"
            " corr_sign long, left_dominant long"
        ),
    )
    return (
        scored.groupBy((F.col("doc_id") % 64).alias("s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clips"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.first("n_frames").cast("bigint").alias("n_frames"),
            F.first("left_energy_ppm").cast("bigint").alias("left_energy_ppm"),
            F.first("corr_sign").cast("bigint").alias("corr_sign"),
            F.first("left_dominant").cast("bigint").alias("left_dominant"),
        )
        .select(
            "canonical_doc", "n_clips", "n_frames", "left_energy_ppm",
            "corr_sign", "left_dominant",
        )
        .orderBy("canonical_doc")
    )


MULTIMODAL_STEREO_SQL = """
WITH samp AS (
  SELECT s, i,
         ((s * 11 + i * 23) % 2001) - 1000 AS l
  FROM generate_series(0, 63) ts(s), generate_series(0, 55) ti(i)
  WHERE i < 32 + (s * 5) % 24
),
ch AS (
  SELECT s, i, l,
         CASE WHEN s % 3 = 0
              THEN -((l * (1 + s % 4)) // 4)
              ELSE (l * (1 + s % 4)) // 4 END AS r
  FROM samp
),
per AS (
  SELECT s,
         CAST(COUNT(*) AS BIGINT) AS n_frames,
         CAST(SUM(CAST(l AS HUGEINT) * l) * 1000000
              // (SUM(CAST(l AS HUGEINT) * l) + SUM(CAST(r AS HUGEINT) * r))
              AS BIGINT) AS left_energy_ppm,
         CAST(SIGN(SUM(CAST(l AS HUGEINT) * r)) AS BIGINT) AS corr_sign,
         CAST(CASE WHEN SUM(CAST(l AS HUGEINT) * l) >= SUM(CAST(r AS HUGEINT) * r)
                   THEN 1 ELSE 0 END AS BIGINT) AS left_dominant
  FROM ch GROUP BY 1
),
cls AS (
  SELECT doc_id % 64 AS s, CAST(COUNT(*) AS BIGINT) AS n_clips,
         CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT canonical_doc, n_clips, n_frames, left_energy_ppm, corr_sign, left_dominant
FROM cls JOIN per USING (s)
ORDER BY canonical_doc
"""

QUERIES["multimodal_stereo_balance"] = multimodal_stereo_balance
ORACLE["multimodal_stereo_balance"] = MULTIMODAL_STEREO_SQL


# ---------------------------------------------------------------------------
# multimodal_caption_consistency — image/caption agreement audit
# (round 10)
# ---------------------------------------------------------------------------


def multimodal_caption_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-image consistency audit for paired (image, text)
    training data — the screen a VLM corpus runs to catch mislabeled
    pairs before contrastive training: decode the image, predict its
    class from PIXELS (mean-luma bucket — recoverable because the
    class fixes the pixel formula), parse the class the CAPTION
    declares (regexp over the text side), and report agreement. The
    fixture PLANTS mislabels: pairs with doc_id % 17 == 0 carry a
    caption declaring class (s+1) % 8 — detection must recover that
    set exactly (property-tested), everything else must agree.

    First op to couple the image codec and the text path in one
    hash-gated plan. Engine-exact: the pixel→class map is integer
    (mean luma DIV bucket width over the planted plateau formula,
    symbolic in the oracle); caption parsing is regexp_extract on
    both engines; counts/ppm integer.

    Scale shape: image decode+classify in ONE fused mapInPandas
    pass (8-class memoized); the caption side is pure JVM; one join
    on doc_id; 8+1-row rollup."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def classify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, int] = {}

        def klass(s: int) -> int:
            if s in cache:
                return cache[s]
            w = h = 8
            # class-s plateau: luma = 40 + 20*s everywhere (+ a small
            # deterministic texture that cannot cross bucket edges)
            rgb = bytes(
                min(40 + 20 * s + ((x + y) % 3), 255)
                for y in range(h)
                for x in range(w)
                for _ in range(3)
            )
            _, _, _, px, _ = decode_image(encode_bmp(w, h, rgb))
            mean_luma = sum(px) // len(px)
            cache[s] = (mean_luma - 40) // 20
            return cache[s]

        for pdf in it:
            out = {"doc_id": [], "pixel_class": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                out["doc_id"].append(doc_id)
                out["pixel_class"].append(klass(doc_id % 8))
            yield pd.DataFrame(out)

    img = d.mapInPandas(classify, schema="doc_id long, pixel_class long")
    captions = d.select(
        "doc_id",
        F.expr(
            "CONCAT('a photo of pattern class ',"
            " CAST(CASE WHEN doc_id % 17 = 0 THEN (doc_id % 8 + 1) % 8"
            "      ELSE doc_id % 8 END AS STRING),"
            " ' with texture')"
        ).alias("caption"),
    ).select(
        "doc_id",
        F.expr(
            "CAST(regexp_extract(caption, 'class ([0-9]+)', 1) AS BIGINT)"
        ).alias("caption_class"),
    )
    joined = img.join(captions, "doc_id")
    return (
        joined.groupBy("pixel_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("pixel_class") == F.col("caption_class"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_consistent"),
            F.min(F.when(F.col("pixel_class") != F.col("caption_class"), F.col("doc_id")))
            .cast("bigint")
            .alias("first_mislabel_doc"),
        )
        .select(
            "pixel_class",
            "n_pairs",
            "n_consistent",
            (F.col("n_pairs") - F.col("n_consistent")).cast("bigint").alias("n_mislabeled"),
            F.expr("CAST(n_consistent * 1000000 DIV n_pairs AS BIGINT)").alias(
                "consistency_ppm"
            ),
            F.coalesce("first_mislabel_doc", F.lit(-1)).cast("bigint").alias(
                "first_mislabel_doc"
            ),
        )
        .orderBy("pixel_class")
    )


CAPTION_CONSISTENCY_SQL = """
WITH pairs AS (
  -- pixel class is symbolically recoverable: mean of the class-s
  -- plateau 40+20s+((x+y)%3) over 8x8 is 40+20s (texture mean floors
  -- away under // 20 after -40), so (mean-40)//20 = s
  SELECT doc_id,
         doc_id % 8 AS pixel_class,
         CASE WHEN doc_id % 17 = 0 THEN (doc_id % 8 + 1) % 8
              ELSE doc_id % 8 END AS caption_class
  FROM documents
)
SELECT CAST(pixel_class AS BIGINT) AS pixel_class,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN pixel_class = caption_class THEN 1 ELSE 0 END) AS BIGINT)
         AS n_consistent,
       CAST(SUM(CASE WHEN pixel_class <> caption_class THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mislabeled,
       CAST(SUM(CASE WHEN pixel_class = caption_class THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS consistency_ppm,
       CAST(COALESCE(MIN(CASE WHEN pixel_class <> caption_class THEN doc_id END), -1)
            AS BIGINT) AS first_mislabel_doc
FROM pairs
GROUP BY 1
ORDER BY 1
"""

QUERIES["multimodal_caption_consistency"] = multimodal_caption_consistency
ORACLE["multimodal_caption_consistency"] = CAPTION_CONSISTENCY_SQL


# ---------------------------------------------------------------------------
# multimodal_av_sync_check — audio/video duration consistency audit
# (round 10)
# ---------------------------------------------------------------------------


def multimodal_av_sync_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/V sync audit for paired audio+video training clips — the
    screen a video-corpus pipeline runs before cutting clips into
    training windows: decode BOTH tracks, compare durations
    (frames/fps vs samples/rate), flag drift beyond half a frame.
    The fixture pairs a Y4M track (10 fps via the F header, n =
    10 + s % 5 frames)
    with a PCM track (8000 Hz, nominally n·800 samples) and PLANTS
    drift: classes with s % 7 == 0 carry one extra video frame
    (+100 ms), s % 11 == 0 lose 800 audio samples (−100 ms, a full frame —
    a plant ON the tolerance boundary is untestable). First op
    to couple the audio AND video codecs in one hash-gated plan.

    FULLY INTEGER: durations in exact ms (frames·1000 DIV fps,
    samples·1000 DIV rate), drift and the half-frame tolerance
    (1000 DIV (2·fps) = 50 ms) are integer compares. The oracle
    predicts every class symbolically from the residues.

    Scale shape: ONE fused mapInPandas pass (both codecs round-trip
    inside), 64-class memoization, 64-row rollup."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.audiocodec import decode_wav, encode_wav
    from bireme_spark.functions.videocodec import decode_y4m, encode_y4m

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def sync(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, tuple[int, int, int, int]] = {}

        def klass(s: int) -> tuple[int, int, int, int]:
            if s in cache:
                return cache[s]
            w, h = 8, 6
            nf = 10 + s % 5 + (1 if s % 7 == 0 else 0)
            clen = (w // 2) * (h // 2)
            frames = [
                (bytes([(20 + 3 * f) % 200] * (w * h)), bytes([128]) * clen, bytes([128]) * clen)
                for f in range(nf)
            ]
            vid = encode_y4m(w, h, frames, fps=(10, 1))
            _, _, (fn, fd), back_frames = decode_y4m(vid)
            ns = (10 + s % 5) * 800 - (800 if s % 11 == 0 else 0)
            tone = [((s * 7 + i * 13) % 1200) - 600 for i in range(ns)]
            _, _, back = decode_wav(encode_wav(8000, tone))
            v_ms = len(back_frames) * 1000 * fd // fn
            a_ms = len(back) * 1000 // 8000
            cache[s] = (len(back_frames), len(back), v_ms, a_ms)
            return cache[s]

        for pdf in it:
            out = {
                "doc_id": [],
                "n_frames": [],
                "n_samples": [],
                "video_ms": [],
                "audio_ms": [],
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                nf, ns, vms, ams = klass(doc_id % 64)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(nf)
                out["n_samples"].append(ns)
                out["video_ms"].append(vms)
                out["audio_ms"].append(ams)
            yield pd.DataFrame(out)

    scored = d.mapInPandas(
        sync,
        schema=(
            "doc_id long, n_frames long, n_samples long,"
            " video_ms long, audio_ms long"
        ),
    )
    return (
        scored.groupBy((F.col("doc_id") % 64).alias("s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clips"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.first("n_frames").cast("bigint").alias("n_frames"),
            F.first("n_samples").cast("bigint").alias("n_samples"),
            F.first("video_ms").cast("bigint").alias("video_ms"),
            F.first("audio_ms").cast("bigint").alias("audio_ms"),
        )
        .select(
            "canonical_doc",
            "n_clips",
            "n_frames",
            "n_samples",
            "video_ms",
            "audio_ms",
            (F.col("video_ms") - F.col("audio_ms")).cast("bigint").alias("drift_ms"),
            (F.abs(F.col("video_ms") - F.col("audio_ms")) > F.lit(50)).alias(
                "out_of_sync"
            ),
        )
        .orderBy("canonical_doc")
    )


AV_SYNC_SQL = """
WITH per AS (
  SELECT s,
         CAST(10 + s % 5 + CASE WHEN s % 7 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_frames,
         CAST((10 + s % 5) * 800 - CASE WHEN s % 11 = 0 THEN 800 ELSE 0 END AS BIGINT)
           AS n_samples
  FROM generate_series(0, 63) t(s)
),
ms AS (
  SELECT s, n_frames, n_samples,
         CAST(n_frames * 1000 // 10 AS BIGINT) AS video_ms,
         CAST(n_samples * 1000 // 8000 AS BIGINT) AS audio_ms
  FROM per
),
cls AS (
  SELECT doc_id % 64 AS s, CAST(COUNT(*) AS BIGINT) AS n_clips,
         CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT canonical_doc, n_clips, n_frames, n_samples, video_ms, audio_ms,
       CAST(video_ms - audio_ms AS BIGINT) AS drift_ms,
       ABS(video_ms - audio_ms) > 50 AS out_of_sync
FROM cls JOIN ms USING (s)
ORDER BY canonical_doc
"""

QUERIES["multimodal_av_sync_check"] = multimodal_av_sync_check
ORACLE["multimodal_av_sync_check"] = AV_SYNC_SQL


# ---------------------------------------------------------------------------
# multimodal_image_palette_audit — distinct-color census / screenshot
# detector (round 10)
# ---------------------------------------------------------------------------


def multimodal_image_palette_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palette census through the codec: distinct RGB count and
    color-distribution entropy per image class — the cheap screen
    that separates flat synthetic/screenshot/chart images (tiny
    palettes, low entropy) from photographic content before a
    training mix over-weights UI scrapes. Fixture plants palette
    sizes directly: class s paints vertical bands cycling through
    1 + s % 6 colors — the census must read back EXACTLY that
    through encode→decode (a lossy or channel-swapping codec bug
    shifts the count).

    Engine-exact: distinct counts are integers; entropy is the house
    per-term pattern (count·ROUND(ln(n/cnt)·1e6) integer terms, one
    closing DIV). The oracle reproduces the band structure
    symbolically. Scale shape: ONE fused mapInPandas pass, 64-class
    memoization, 64-row rollup."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_png

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def census(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        cache: dict[int, tuple[int, int, int]] = {}

        def klass(s: int) -> tuple[int, int, int]:
            if s in cache:
                return cache[s]
            w = h = 8
            k = 1 + s % 6
            px = bytearray()
            for y in range(h):
                for x in range(w):
                    b = x % k
                    px.extend((30 + 25 * b, (60 + 40 * b) % 256, (10 + 70 * b) % 256))
            _, _, _, back, _ = decode_image(encode_png(w, h, bytes(px)))
            counts: dict[bytes, int] = {}
            for i in range(0, len(back), 3):
                key = bytes(back[i : i + 3])
                counts[key] = counts.get(key, 0) + 1
            n = w * h
            ent_e6 = sum(
                c * int(math.floor(math.log(n / c) * 1_000_000 + 0.5))
                for c in counts.values()
            ) // n
            cache[s] = (len(counts), ent_e6, n)
            return cache[s]

        for pdf in it:
            out = {"doc_id": [], "palette_size": [], "entropy_e6": [], "n_pixels": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                ps, ent, n = klass(doc_id % 64)
                out["doc_id"].append(doc_id)
                out["palette_size"].append(ps)
                out["entropy_e6"].append(ent)
                out["n_pixels"].append(n)
            yield pd.DataFrame(out)

    scored = d.mapInPandas(
        census,
        schema="doc_id long, palette_size long, entropy_e6 long, n_pixels long",
    )
    return (
        scored.groupBy((F.col("doc_id") % 64).alias("s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.first("palette_size").cast("bigint").alias("palette_size"),
            F.first("entropy_e6").cast("bigint").alias("entropy_e6"),
            F.first("n_pixels").cast("bigint").alias("n_pixels"),
        )
        .select(
            "canonical_doc",
            "n_images",
            "n_pixels",
            "palette_size",
            "entropy_e6",
            (F.col("palette_size") <= 2).alias("flat_image_suspect"),
        )
        .orderBy("canonical_doc")
    )


PALETTE_AUDIT_SQL = """
WITH grid AS (
  SELECT s, x, 1 + s % 6 AS k
  FROM generate_series(0, 63) ts(s), generate_series(0, 7) tx(x)
),
-- column x carries color band x % k; each band covers the 8 rows,
-- so band b appears 8 * (number of x in 0..7 with x % k = b) times
bands AS (
  SELECT s, x % k AS b, CAST(8 * COUNT(*) AS BIGINT) AS cnt
  FROM grid GROUP BY s, x % k
),
per AS (
  SELECT s,
         CAST(COUNT(*) AS BIGINT) AS palette_size,
         CAST(SUM(cnt * CAST(FLOOR(ln(CAST(64 AS DOUBLE) / cnt) * 1000000 + 0.5)
                             AS BIGINT)) // 64 AS BIGINT) AS entropy_e6
  FROM bands GROUP BY 1
),
cls AS (
  SELECT doc_id % 64 AS s, CAST(COUNT(*) AS BIGINT) AS n_images,
         CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT canonical_doc, n_images, CAST(64 AS BIGINT) AS n_pixels,
       palette_size, entropy_e6,
       palette_size <= 2 AS flat_image_suspect
FROM cls JOIN per USING (s)
ORDER BY canonical_doc
"""

QUERIES["multimodal_image_palette_audit"] = multimodal_image_palette_audit
ORACLE["multimodal_image_palette_audit"] = PALETTE_AUDIT_SQL


# ---------------------------------------------------------------------------
# multimodal_thumbnail_integrity — thumbnail/master pairing audit
# (round 10)
# ---------------------------------------------------------------------------


def multimodal_thumbnail_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail/master pairing audit — the screen a multimodal
    corpus runs over (master, thumbnail) asset pairs to catch
    mis-paired thumbnails before captioning/training: the master
    (8×8, class-plateau pixels) is decoded and NN-downsampled to
    4×4; the STORED thumbnail is decoded independently; the pair is
    consistent iff the two agree pixel-for-pixel. The fixture PLANTS
    mispairings: classes with s % 13 == 0 store the thumbnail of
    class (s+1) % 64 — the audit must flag exactly those (the sum of
    absolute pixel deltas is the evidence column).

    FULLY INTEGER: pixel compares and delta sums; the oracle
    predicts consistency and the delta symbolically from the plateau
    formula (class value 40 + 3·s: mismatch delta = 48·|Δclass·3|).
    Exercises encode→decode and the integer NN downsample (the
    multimodal_resize mapping xs = x·w_src DIV 4) twice in one plan. Scale shape: ONE fused mapInPandas pass, 64-class
    memoization, 64-row rollup."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def audit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, tuple[int, int]] = {}

        def nn4(px: bytes, w: int, h: int) -> bytes:
            out = bytearray()
            for y in range(4):
                ys = y * h // 4
                for x in range(4):
                    xs = x * w // 4
                    i = (ys * w + xs) * 3
                    out.extend(px[i : i + 3])
            return bytes(out)

        def master_thumb(s: int) -> bytes:
            w = h = 8
            rgb = bytes(
                (40 + 3 * s) % 256
                for _ in range(h)
                for _ in range(w)
                for _ in range(3)
            )
            _, _, _, px, _ = decode_image(encode_bmp(w, h, rgb))
            return nn4(px, w, h)

        def klass(s: int) -> tuple[int, int]:
            if s in cache:
                return cache[s]
            expected = master_thumb(s)
            stored_class = (s + 1) % 64 if s % 13 == 0 else s
            stored = master_thumb(stored_class)
            delta = sum(abs(a - b) for a, b in zip(expected, stored))
            cache[s] = (delta, 1 if delta == 0 else 0)
            return cache[s]

        for pdf in it:
            out = {"doc_id": [], "pixel_delta": [], "consistent": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                delta, ok = klass(doc_id % 64)
                out["doc_id"].append(doc_id)
                out["pixel_delta"].append(delta)
                out["consistent"].append(ok)
            yield pd.DataFrame(out)

    scored = d.mapInPandas(
        audit, schema="doc_id long, pixel_delta long, consistent long"
    )
    return (
        scored.groupBy((F.col("doc_id") % 64).alias("s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.first("pixel_delta").cast("bigint").alias("pixel_delta"),
            F.first("consistent").cast("bigint").alias("consistent"),
        )
        .select(
            "canonical_doc",
            "n_pairs",
            "pixel_delta",
            (F.col("consistent") == 1).alias("pair_consistent"),
        )
        .orderBy("canonical_doc")
    )


THUMBNAIL_INTEGRITY_SQL = """
WITH per AS (
  SELECT s,
         CASE WHEN s % 13 = 0 THEN (s + 1) % 64 ELSE s END AS stored_class
  FROM generate_series(0, 63) t(s)
),
-- plateau master value 40+3s (mod 256); the 4x4 thumbnail of a
-- plateau is 48 identical subpixels, so the mismatch delta is
-- 48 * |(40+3a) % 256 - (40+3b) % 256|
d AS (
  SELECT s,
         CAST(48 * ABS((40 + 3 * s) % 256 - (40 + 3 * stored_class) % 256)
              AS BIGINT) AS pixel_delta
  FROM per
),
cls AS (
  SELECT doc_id % 64 AS s, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
  FROM documents GROUP BY 1
)
SELECT canonical_doc, n_pairs, pixel_delta,
       pixel_delta = 0 AS pair_consistent
FROM cls JOIN d USING (s)
ORDER BY canonical_doc
"""

QUERIES["multimodal_thumbnail_integrity"] = multimodal_thumbnail_integrity
ORACLE["multimodal_thumbnail_integrity"] = THUMBNAIL_INTEGRITY_SQL


# ---------------------------------------------------------------------------
# multimodal_aspect_ratio_bucketing — training-batch geometry planner
# (round 10)
# ---------------------------------------------------------------------------

# fixed aspect ladder (id, bucket_w, bucket_h, 144/bucket_h) — 144 =
# lcm of the hb values, so score·(144/hb) compares the fractions
# |w/h − wb/hb| exactly in integers
_ARB_BUCKETS = [
    (0, 12, 12),
    (1, 16, 12),
    (2, 12, 16),
    (3, 16, 9),
    (4, 9, 16),
]


def multimodal_aspect_ratio_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing plan over the synthesized image corpus
    (dims w = 8 + doc_id%%8, h = 8 + doc_id%%5 — the same geometry
    multimodal_image_decode round-trips through the real codecs):
    assign every image to the nearest of five aspect buckets
    (1:1, 4:3, 3:4, 16:9, 9:16) and report per-bucket load and the
    mean letterbox padding waste — the planning step every
    variable-aspect vision training pipeline (SDXL-style bucketing)
    runs so batches share a shape without destructive center-crops.

    Determinism: nearest-bucket is an exact integer argmin —
    |w·hb − h·wb|·(144/hb) compares |w/h − wb/hb| with a common
    denominator, ties break to the smallest bucket id via the
    MIN(score·8 + id) encoding (the r10 MAX_BY-tie lesson); padding
    is integer ppm (letterbox content share = min-fit cross ratio).

    Scale: metadata-only — one scan, a 5-row broadcast ladder, a
    5-group agg; no pixel ever moves."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("CAST(8 + doc_id % 8 AS BIGINT)").alias("w"),
        F.expr("CAST(8 + doc_id % 5 AS BIGINT)").alias("h"),
    )
    ladder = spark.createDataFrame(
        [(i, wb, hb, 144 // hb) for i, wb, hb in _ARB_BUCKETS],
        "bucket_id INT, bucket_w BIGINT, bucket_h BIGINT, mden BIGINT",
    )
    scored = d.crossJoin(F.broadcast(ladder)).select(
        "doc_id",
        "w",
        "h",
        "bucket_id",
        F.expr("ABS(w * bucket_h - h * bucket_w) * mden * 8 + bucket_id").alias("enc"),
    )
    best = scored.groupBy("doc_id", "w", "h").agg(F.expr("MIN(enc) % 8").alias("bucket_id"))
    assigned = best.join(F.broadcast(ladder.select("bucket_id", "bucket_w", "bucket_h")), "bucket_id").select(
        "bucket_id",
        F.expr(
            "CASE WHEN w * bucket_h >= h * bucket_w"
            " THEN 1000000 - (h * bucket_w * 1000000) DIV (w * bucket_h)"
            " ELSE 1000000 - (w * bucket_h * 1000000) DIV (h * bucket_w) END"
        ).alias("pad_ppm"),
    )
    per = assigned.groupBy("bucket_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.expr("CAST(SUM(pad_ppm) AS BIGINT)").alias("sum_pad"),
    )
    total = d.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    return (
        ladder.select("bucket_id", "bucket_w", "bucket_h")
        .join(per, "bucket_id", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket_id",
            "bucket_w",
            "bucket_h",
            F.expr("COALESCE(n_images, CAST(0 AS BIGINT))").alias("n_images"),
            F.expr("COALESCE(n_images, 0) * 1000000 DIV total").alias("share_ppm"),
            F.expr(
                "COALESCE(sum_pad, CAST(0 AS BIGINT)) DIV GREATEST(COALESCE(n_images, 0), 1)"
            ).alias("mean_pad_ppm"),
        )
        .orderBy("bucket_id")
    )


_ARB_LADDER_SQL = " UNION ALL ".join(
    f"SELECT {i} AS bucket_id, CAST({wb} AS BIGINT) AS bucket_w,"
    f" CAST({hb} AS BIGINT) AS bucket_h, CAST({144 // hb} AS BIGINT) AS mden"
    for i, wb, hb in _ARB_BUCKETS
)

MULTIMODAL_ARB_SQL = f"""
WITH dims AS (
  SELECT doc_id, CAST(8 + doc_id % 8 AS BIGINT) AS w, CAST(8 + doc_id % 5 AS BIGINT) AS h
  FROM documents
),
ladder AS ({_ARB_LADDER_SQL}),
scored AS (
  SELECT doc_id, w, h, bucket_id,
         ABS(w * bucket_h - h * bucket_w) * mden * 8 + bucket_id AS enc
  FROM dims, ladder
),
best AS (
  SELECT doc_id, w, h, MIN(enc) % 8 AS bucket_id FROM scored GROUP BY 1, 2, 3
),
assigned AS (
  SELECT b.bucket_id,
         CASE WHEN b.w * l.bucket_h >= b.h * l.bucket_w
              THEN 1000000 - (b.h * l.bucket_w * 1000000) // (b.w * l.bucket_h)
              ELSE 1000000 - (b.w * l.bucket_h * 1000000) // (b.h * l.bucket_w) END AS pad_ppm
  FROM best b JOIN ladder l ON b.bucket_id = l.bucket_id
),
per AS (
  SELECT bucket_id, CAST(COUNT(*) AS BIGINT) AS n_images, CAST(SUM(pad_ppm) AS BIGINT) AS sum_pad
  FROM assigned GROUP BY 1
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM dims)
SELECT l.bucket_id, l.bucket_w, l.bucket_h,
       COALESCE(p.n_images, CAST(0 AS BIGINT)) AS n_images,
       CAST(COALESCE(p.n_images, 0) * 1000000 // t.total AS BIGINT) AS share_ppm,
       CAST(COALESCE(p.sum_pad, CAST(0 AS BIGINT)) // GREATEST(COALESCE(p.n_images, 0), 1) AS BIGINT) AS mean_pad_ppm
FROM ladder l LEFT JOIN per p ON l.bucket_id = p.bucket_id, total t
ORDER BY l.bucket_id
"""

QUERIES["multimodal_aspect_ratio_bucketing"] = multimodal_aspect_ratio_bucketing
ORACLE["multimodal_aspect_ratio_bucketing"] = MULTIMODAL_ARB_SQL


# ---------------------------------------------------------------------------
# multimodal_image_exposure_audit — clipping / contrast screen
# (round 10)
# ---------------------------------------------------------------------------


def multimodal_image_exposure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure screen over the synthesized image corpus: per image,
    the highlight-clipping share (pixels ≥ 250), shadow-clipping
    share (≤ 5), dynamic range and mean level, with a routing flag
    ('clipped_high' / 'clipped_low' / 'low_contrast' / 'ok') — the
    first-pass filter a vision-training pipeline runs to drop
    blown-out or flat images before they cost decode+embed compute.

    The Spark side round-trips REAL bytes through the pure-python
    codecs (encode→decode in ONE fused mapInPandas pass — the r5
    fusion rule) and computes the stats off the DECODED buffer, so
    the audit exercises the codec path; the oracle predicts every
    stat symbolically from the pixel formula (x+y+doc_id+37c) % 256
    — if either side of the codec lies, the hash splits.

    Engine-exact: counts and integer-ppm/x1000 DIVs only. Scale:
    Arrow-batched linear pass, no shuffle (repartitioned first —
    documents parquet arrives as one partition)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from bireme_spark.functions.imagecodec import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def audit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "width", "height", "clip_lo_ppm", "clip_hi_ppm", "dynamic_range", "mean_x1000")}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 8, 8 + doc_id % 5
                ys = np.arange(h)[:, None, None]
                xs = np.arange(w)[None, :, None]
                cs = (37 * np.arange(3))[None, None, :]
                pix = ((ys + xs + cs + doc_id) % 256).astype(np.uint8).tobytes()
                if doc_id % 2 == 0:
                    _, _, _, buf = decode_bmp(encode_bmp(w, h, pix))
                else:
                    _, _, _, buf = decode_png(encode_png(w, h, pix))
                arr = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
                npx = arr.size
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["clip_lo_ppm"].append(int((arr <= 5).sum()) * 10**6 // npx)
                out["clip_hi_ppm"].append(int((arr >= 250).sum()) * 10**6 // npx)
                out["dynamic_range"].append(int(arr.max()) - int(arr.min()))
                out["mean_x1000"].append(int(arr.sum()) * 1000 // npx)
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "clip_lo_ppm": pd.Series(out["clip_lo_ppm"], dtype="int64"),
                    "clip_hi_ppm": pd.Series(out["clip_hi_ppm"], dtype="int64"),
                    "dynamic_range": pd.Series(out["dynamic_range"], dtype="int64"),
                    "mean_x1000": pd.Series(out["mean_x1000"], dtype="int64"),
                }
            )

    feats = d.mapInPandas(
        audit,
        schema="doc_id long, width int, height int, clip_lo_ppm long,"
        " clip_hi_ppm long, dynamic_range long, mean_x1000 long",
    )
    return feats.select(
        "doc_id",
        "width",
        "height",
        "clip_lo_ppm",
        "clip_hi_ppm",
        "dynamic_range",
        "mean_x1000",
        F.expr(
            "CASE WHEN clip_hi_ppm > 20000 THEN 'clipped_high'"
            " WHEN clip_lo_ppm > 20000 THEN 'clipped_low'"
            " WHEN dynamic_range < 64 THEN 'low_contrast'"
            " ELSE 'ok' END"
        ).alias("exposure_flag"),
    ).orderBy("doc_id")


MULTIMODAL_EXPOSURE_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (x.x + y.y + d.doc_id + 37 * c.c) % 256 AS p
  FROM dims d
  CROSS JOIN LATERAL (SELECT UNNEST(generate_series(0, d.w - 1)) AS x) x
  CROSS JOIN LATERAL (SELECT UNNEST(generate_series(0, d.h - 1)) AS y) y
  CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS c) c
),
agg AS (
  SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         CAST(SUM(CASE WHEN p <= 5 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS clip_lo_ppm,
         CAST(SUM(CASE WHEN p >= 250 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS clip_hi_ppm,
         CAST(MAX(p) - MIN(p) AS BIGINT) AS dynamic_range,
         CAST(SUM(p) * 1000 // COUNT(*) AS BIGINT) AS mean_x1000
  FROM px GROUP BY 1, 2, 3
)
SELECT doc_id, width, height, clip_lo_ppm, clip_hi_ppm, dynamic_range, mean_x1000,
       CASE WHEN clip_hi_ppm > 20000 THEN 'clipped_high'
            WHEN clip_lo_ppm > 20000 THEN 'clipped_low'
            WHEN dynamic_range < 64 THEN 'low_contrast'
            ELSE 'ok' END AS exposure_flag
FROM agg
ORDER BY doc_id
"""

QUERIES["multimodal_image_exposure_audit"] = multimodal_image_exposure_audit
ORACLE["multimodal_image_exposure_audit"] = MULTIMODAL_EXPOSURE_SQL


# ---------------------------------------------------------------------------
# multimodal_audio_dynamic_range — crest factor / DC-offset screen
# (round 10)
# ---------------------------------------------------------------------------


def multimodal_audio_dynamic_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dynamics screen over the synthesized PCM corpus: crest
    factor (peak/RMS — compressed or clipped material reads low,
    transient-rich material high), DC offset share, and full-scale
    headroom per clip — the routing stats an audio-training pipeline
    reads next to multimodal_audio_clipping before spending decode
    and feature compute (clipping finds broken clips; this ranks the
    healthy ones by dynamics).

    The Spark side round-trips REAL RIFF/WAVE bytes through the
    pure-python codec in ONE fused mapInPandas pass; the oracle
    predicts every stat symbolically from the sample formula
    (doc_id·31 + 7i) % 2048 − 1024. Integer sums throughout; the one
    crest-factor division+sqrt is the same one-shot IEEE op both
    sides, e6-rounded.

    Scale: Arrow-batched linear pass, no shuffle."""
    from collections.abc import Iterator

    import math

    import pandas as pd

    from bireme_spark.functions.audiocodec import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def audit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "n_samples", "peak", "crest_e6", "dc_offset_ppm", "headroom_ppm")}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 64 + doc_id % 64
                samples = [(doc_id * 31 + i * 7) % 2048 - 1024 for i in range(n)]
                _, _, back = decode_wav(encode_wav(8000 * (1 + doc_id % 3), samples))
                nn = len(back)
                s = sum(back)
                ss = sum(v * v for v in back)
                peak = max(abs(v) for v in back)
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(nn)
                rows["peak"].append(peak)
                rows["crest_e6"].append(
                    int(round(peak / math.sqrt(ss / nn) * 10**6)) if ss else 0
                )
                rows["dc_offset_ppm"].append(abs(s) * 10**6 // (nn * 1024))
                rows["headroom_ppm"].append((1024 - peak) * 10**6 // 1024)
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "n_samples": pd.Series(rows["n_samples"], dtype="int32"),
                    "peak": pd.Series(rows["peak"], dtype="int64"),
                    "crest_e6": pd.Series(rows["crest_e6"], dtype="int64"),
                    "dc_offset_ppm": pd.Series(rows["dc_offset_ppm"], dtype="int64"),
                    "headroom_ppm": pd.Series(rows["headroom_ppm"], dtype="int64"),
                }
            )

    feats = d.mapInPandas(
        audit,
        schema="doc_id long, n_samples int, peak long, crest_e6 long,"
        " dc_offset_ppm long, headroom_ppm long",
    )
    return feats.orderBy("doc_id")


MULTIMODAL_ADR_SQL = """
WITH base AS (
  SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
),
samp AS (
  SELECT b.doc_id, b.n, (b.doc_id * 31 + i.i * 7) % 2048 - 1024 AS v
  FROM base b
  CROSS JOIN LATERAL (SELECT UNNEST(generate_series(0, b.n - 1)) AS i) i
),
agg AS (
  SELECT doc_id, CAST(MAX(n) AS INTEGER) AS n_samples,
         CAST(MAX(ABS(v)) AS BIGINT) AS peak,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS ss
  FROM samp GROUP BY 1
)
SELECT doc_id, n_samples, peak,
       CASE WHEN ss > 0 THEN CAST(ROUND(peak / SQRT(CAST(ss AS DOUBLE) / n_samples) * 1000000) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS crest_e6,
       CAST(ABS(s) * 1000000 // (n_samples * 1024) AS BIGINT) AS dc_offset_ppm,
       CAST((1024 - peak) * 1000000 // 1024 AS BIGINT) AS headroom_ppm
FROM agg
ORDER BY doc_id
"""

QUERIES["multimodal_audio_dynamic_range"] = multimodal_audio_dynamic_range
ORACLE["multimodal_audio_dynamic_range"] = MULTIMODAL_ADR_SQL


# ---------------------------------------------------------------------------
# multimodal_image_sharpness — Laplacian-variance blur screen with a
# planted box-blurred residue cohort.


def multimodal_image_sharpness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplacian-variance sharpness screen (the standard blur
    detector a vision-pretraining pipeline runs to drop out-of-focus
    frames): per image, variance of the 4-neighbor Laplacian
    L = 4g − g_left − g_right − g_up − g_down over the interior.
    Residue classes s % 4 == 1 are PLANTED blurry — a 3×3 integer box
    blur (per channel, interior pixels, //9) runs before encoding —
    so the detector has real signal to separate: blur kills the
    second derivative, sharp classes keep it.

    Determinism: same deterministic synthetic corpus as
    multimodal_edge_energy (pixel = f(doc_id % 16), BMP/PNG by
    parity), encode→decode→gray→Laplacian all integer floor math;
    variance is the exact integer form (m·ΣL² − (ΣL)²) DIV m² over
    the fixed 12×12 interior (borders excluded so blurred and sharp
    classes integrate the same region). The oracle recomputes
    pixel→blur→gray→Laplacian→variance symbolically in SQL, so the
    encoder, decoder, blur, and detector are ALL hash-checked.

    Scale shape: generation+blur+encode+decode+Laplacian FUSED into
    ONE Arrow-batched mapInPandas pass (r5 fuse rule); the only
    exchange is the 16-class aggregate."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp, encode_png

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def gen_lap(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ss, vars_ = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                s = doc_id % 16
                w = h = 16
                base = [
                    [
                        [(x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256 for c in range(3)]
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                if s % 4 == 1:
                    pix2 = [[list(base[y][x]) for x in range(w)] for y in range(h)]
                    for y in range(1, h - 1):
                        for x in range(1, w - 1):
                            for c in range(3):
                                pix2[y][x][c] = (
                                    sum(
                                        base[y + dy][x + dx][c]
                                        for dy in (-1, 0, 1)
                                        for dx in (-1, 0, 1)
                                    )
                                    // 9
                                )
                    base = pix2
                pix = bytes(base[y][x][c] for y in range(h) for x in range(w) for c in range(3))
                enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
                dw, dh, dc, dpix, _fmt = decode_image(enc)
                gray = [
                    [
                        sum(dpix[(y * dw + x) * dc + ch] for ch in range(min(dc, 3)))
                        // min(dc, 3)
                        for x in range(dw)
                    ]
                    for y in range(dh)
                ]
                sl = sl2 = m = 0
                for y in range(2, dh - 2):
                    for x in range(2, dw - 2):
                        lap = (
                            4 * gray[y][x]
                            - gray[y][x - 1]
                            - gray[y][x + 1]
                            - gray[y - 1][x]
                            - gray[y + 1][x]
                        )
                        sl += lap
                        sl2 += lap * lap
                        m += 1
                ids.append(doc_id)
                ss.append(s)
                vars_.append((m * sl2 - sl * sl) // (m * m))
            yield pd.DataFrame({"doc_id": ids, "s": ss, "lap_var_q": vars_})

    scored = d.mapInPandas(gen_lap, schema="doc_id long, s int, lap_var_q long")
    return (
        scored.groupBy("s")
        .agg(
            F.expr("CAST(MIN(doc_id) AS BIGINT)").alias("canonical_doc"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_images"),
            F.expr("CAST(MAX(lap_var_q) AS BIGINT)").alias("lap_var_q"),
        )
        .select(
            "s",
            F.expr("CAST(s % 4 = 1 AS INT)").alias("is_blurred"),
            "canonical_doc",
            "n_images",
            "lap_var_q",
        )
        .orderBy("s")
    )


MULTIMODAL_SHARPNESS_SQL = """
WITH pxc AS (
  SELECT s, x, y, c,
         (x*x + 2*y + 5*s + 37*c + (s*x)//3) % 256 AS v
  FROM generate_series(0, 15) ts(s),
       generate_series(0, 15) tx(x),
       generate_series(0, 15) ty(y),
       generate_series(0, 2) tc(c)
),
blurred AS (
  SELECT p.s, p.x, p.y, p.c,
         CASE WHEN p.s % 4 = 1 AND p.x BETWEEN 1 AND 14 AND p.y BETWEEN 1 AND 14
              THEN (SELECT SUM(n.v) FROM pxc n
                    WHERE n.s = p.s AND n.c = p.c
                      AND n.x BETWEEN p.x - 1 AND p.x + 1
                      AND n.y BETWEEN p.y - 1 AND p.y + 1) // 9
              ELSE p.v END AS v
  FROM pxc p
),
gray AS (
  SELECT s, x, y, CAST(SUM(v) // 3 AS BIGINT) AS g
  FROM blurred GROUP BY 1, 2, 3
),
lap AS (
  SELECT c.s, c.x, c.y,
         4 * c.g
         - (SELECT g FROM gray n WHERE n.s = c.s AND n.x = c.x - 1 AND n.y = c.y)
         - (SELECT g FROM gray n WHERE n.s = c.s AND n.x = c.x + 1 AND n.y = c.y)
         - (SELECT g FROM gray n WHERE n.s = c.s AND n.x = c.x AND n.y = c.y - 1)
         - (SELECT g FROM gray n WHERE n.s = c.s AND n.x = c.x AND n.y = c.y + 1) AS l
  FROM gray c
  WHERE c.x BETWEEN 2 AND 13 AND c.y BETWEEN 2 AND 13
),
var_s AS (
  SELECT s,
         (COUNT(*) * SUM(l * l) - SUM(l) * SUM(l)) // (COUNT(*) * COUNT(*)) AS lap_var_q
  FROM lap GROUP BY 1
),
docs AS (SELECT doc_id, doc_id % 16 AS s FROM documents)
SELECT CAST(d.s AS INTEGER) AS s,
       CAST(CASE WHEN d.s % 4 = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_blurred,
       CAST(MIN(d.doc_id) AS BIGINT) AS canonical_doc,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(MAX(v.lap_var_q) AS BIGINT) AS lap_var_q
FROM docs d JOIN var_s v ON v.s = d.s
GROUP BY 1, 2 ORDER BY 1
"""

QUERIES["multimodal_image_sharpness"] = multimodal_image_sharpness
ORACLE["multimodal_image_sharpness"] = MULTIMODAL_SHARPNESS_SQL


# ---------------------------------------------------------------------------
# multimodal_loudness_gate — EBU R128-style two-stage gated loudness
# with planted quiet-tail / attenuated-tail cohorts.


def multimodal_loudness_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EBU R128-style gated loudness (linear-power proxy) over the
    synthesized PCM corpus: overlapping momentary blocks (32 samples,
    hop 16), an ABSOLUTE gate (blocks below a fixed power floor are
    silence — dropped), then a RELATIVE gate (blocks more than 10×
    below the mean of the absolute-gated blocks are dropped), and the
    program loudness is the mean power of what survives — the
    standard loudness-normalization stat an audio pipeline computes
    per clip before mixing sources. Plain RMS (audio_dynamic_range)
    is dragged down by silence padding; gating is the fix, and the
    fixture PLANTS two cohorts: clips doc_id % 8 == 3 carry a ÷32
    quiet tail (absolute-gated: ~27% of their blocks drop vs ~2%
    baseline), clips doc_id % 8 == 5 a ÷6 attenuated tail (~14%
    drop, mostly at the relative gate). Because the synthetic wave's
    218-wide sample window can sit near the zero crossing, individual
    blocks of ANY class can land near either gate — that is fine for
    the hash gate (both engines compare the SAME exact integers) and
    the property test asserts the per-cohort ORDERING, not per-block
    margins.

    Determinism: pure integer throughout — block sum-of-squares,
    cross-multiplied relative gate ssb·10·n_abs ≥ Σssb (no division
    before the compare), truncating-DIV closes; tail attenuation uses
    truncation toward zero on negatives (tdiv in Python, `//`/DIV
    engine-verified). The Spark side round-trips REAL RIFF/WAVE bytes
    through the codec in ONE fused mapInPandas pass; the oracle
    predicts every stat symbolically from the sample formula.

    Scale: Arrow-batched linear pass, no shuffle; per-doc state is
    ≤7 blocks."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.audiocodec import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)

    def audit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "n_blocks", "n_abs_kept", "n_rel_kept", "loudness_q", "gated_frac_ppm")}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 64 + doc_id % 64
                att = 32 if doc_id % 8 == 3 else (6 if doc_id % 8 == 5 else 1)
                samples = [
                    tdiv((doc_id * 31 + i * 7) % 2048 - 1024, att) if i >= n // 2 else (doc_id * 31 + i * 7) % 2048 - 1024
                    for i in range(n)
                ]
                _, _, back = decode_wav(encode_wav(8000 * (1 + doc_id % 3), samples))
                nb = (len(back) - 32) // 16 + 1
                ssbs = [sum(v * v for v in back[16 * b : 16 * b + 32]) for b in range(nb)]
                absk = [s for s in ssbs if s >= 64000]
                na = len(absk)
                usum = sum(absk)
                kept = [s for s in absk if s * 10 * na >= usum]
                nk = len(kept)
                rows["doc_id"].append(doc_id)
                rows["n_blocks"].append(nb)
                rows["n_abs_kept"].append(na)
                rows["n_rel_kept"].append(nk)
                rows["loudness_q"].append(sum(kept) // (max(nk, 1) * 32))
                rows["gated_frac_ppm"].append((nb - nk) * 10**6 // nb)
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "n_blocks": pd.Series(rows["n_blocks"], dtype="int64"),
                    "n_abs_kept": pd.Series(rows["n_abs_kept"], dtype="int64"),
                    "n_rel_kept": pd.Series(rows["n_rel_kept"], dtype="int64"),
                    "loudness_q": pd.Series(rows["loudness_q"], dtype="int64"),
                    "gated_frac_ppm": pd.Series(rows["gated_frac_ppm"], dtype="int64"),
                }
            )

    feats = d.mapInPandas(
        audit,
        schema="doc_id long, n_blocks long, n_abs_kept long, n_rel_kept long,"
        " loudness_q long, gated_frac_ppm long",
    )
    return feats.orderBy("doc_id")


MULTIMODAL_LOUDNESS_SQL = """
WITH base AS (
  SELECT doc_id, 64 + doc_id % 64 AS n,
         CASE WHEN doc_id % 8 = 3 THEN 32 WHEN doc_id % 8 = 5 THEN 6 ELSE 1 END AS att
  FROM documents
),
blocks AS (
  SELECT b.doc_id, b.n, b.att, bi.b
  FROM base b
  CROSS JOIN LATERAL (SELECT UNNEST(generate_series(0, (b.n - 32) // 16)) AS b) bi
),
bsamp AS (
  SELECT bl.doc_id, bl.b,
         CASE WHEN 16 * bl.b + j.j >= bl.n // 2
              THEN ((bl.doc_id * 31 + (16 * bl.b + j.j) * 7) % 2048 - 1024) // bl.att
              ELSE (bl.doc_id * 31 + (16 * bl.b + j.j) * 7) % 2048 - 1024 END AS v
  FROM blocks bl, generate_series(0, 31) j(j)
),
bstat AS (
  SELECT doc_id, b, CAST(SUM(v * v) AS BIGINT) AS ssb
  FROM bsamp GROUP BY 1, 2
),
gates AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(COUNT(*) FILTER (WHERE ssb >= 64000) AS BIGINT) AS n_abs,
         CAST(COALESCE(SUM(ssb) FILTER (WHERE ssb >= 64000), 0) AS BIGINT) AS usum
  FROM bstat GROUP BY 1
),
kept AS (
  SELECT s.doc_id,
         CAST(COUNT(*) FILTER (WHERE s.ssb >= 64000 AND s.ssb * 10 * g.n_abs >= g.usum) AS BIGINT) AS n_kept,
         CAST(COALESCE(SUM(s.ssb) FILTER (WHERE s.ssb >= 64000 AND s.ssb * 10 * g.n_abs >= g.usum), 0) AS BIGINT) AS ksum
  FROM bstat s JOIN gates g ON g.doc_id = s.doc_id
  GROUP BY 1
)
SELECT g.doc_id,
       g.n_blocks,
       g.n_abs AS n_abs_kept,
       k.n_kept AS n_rel_kept,
       CAST(k.ksum // (GREATEST(k.n_kept, 1) * 32) AS BIGINT) AS loudness_q,
       CAST((g.n_blocks - k.n_kept) * 1000000 // g.n_blocks AS BIGINT) AS gated_frac_ppm
FROM gates g JOIN kept k ON k.doc_id = g.doc_id
ORDER BY g.doc_id
"""

QUERIES["multimodal_loudness_gate"] = multimodal_loudness_gate
ORACLE["multimodal_loudness_gate"] = MULTIMODAL_LOUDNESS_SQL


# ---------------------------------------------------------------------------
# multimodal_image_noise_estimate — Immerkaer fast noise-variance
# estimate with a planted noisy cohort.


def multimodal_image_noise_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Immerkaer (1996) fast noise estimate: convolve the grayscale
    with the noise kernel [1 -2 1; -2 4 -2; 1 -2 1] (a double
    Laplacian that annihilates locally-linear image structure, so
    what survives is mostly NOISE), and sigma ~ sqrt(pi/2)·Σ|N| /
    (6·m) over m interior pixels — the standard one-pass camera/codec
    noise screen, complementing multimodal_image_sharpness (blur
    kills structure; noise adds false structure — a pipeline wants
    both). Residue classes s % 4 == 2 are PLANTED noisy: deterministic
    pseudo-noise ((x·7 + y·13 + c·29 + s) % 5) − 2 added per channel
    pre-encode (clamped to [0,255]).

    Determinism: encode→decode→gray→convolution all integer floor
    math; Σ|N| is an exact integer per class; the ONE sigma close is
    a shared IEEE expression (SQRT(PI()/2) on an exact integer),
    e6-rounded one-shot. The oracle recomputes
    pixel→noise→clamp→gray→kernel symbolically.

    Scale shape: ONE fused Arrow mapInPandas pass; the only exchange
    is the 16-class aggregate."""
    from collections.abc import Iterator

    import pandas as pd

    from bireme_spark.functions.imagecodec import decode_image, encode_bmp, encode_png

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.repartition(spark.sparkContext.defaultParallelism)

    def gen_noise(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ss, sals = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                s = doc_id % 16
                w = h = 16
                base = [
                    [[(x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256 for c in range(3)] for x in range(w)]
                    for y in range(h)
                ]
                if s % 4 == 2:
                    for y in range(h):
                        for x in range(w):
                            for c in range(3):
                                v = base[y][x][c] + (x * 7 + y * 13 + c * 29 + s) % 5 - 2
                                base[y][x][c] = min(max(v, 0), 255)
                pix = bytes(base[y][x][c] for y in range(h) for x in range(w) for c in range(3))
                enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
                dw, dh, dc, dpix, _fmt = decode_image(enc)
                gray = [
                    [
                        sum(dpix[(y * dw + x) * dc + ch] for ch in range(min(dc, 3)))
                        // min(dc, 3)
                        for x in range(dw)
                    ]
                    for y in range(dh)
                ]
                sal = 0
                for y in range(1, dh - 1):
                    for x in range(1, dw - 1):
                        nv = (
                            gray[y - 1][x - 1] - 2 * gray[y - 1][x] + gray[y - 1][x + 1]
                            - 2 * gray[y][x - 1] + 4 * gray[y][x] - 2 * gray[y][x + 1]
                            + gray[y + 1][x - 1] - 2 * gray[y + 1][x] + gray[y + 1][x + 1]
                        )
                        sal += abs(nv)
                ids.append(doc_id)
                ss.append(s)
                sals.append(sal)
            yield pd.DataFrame({"doc_id": ids, "s": ss, "sum_abs_n": sals})

    scored = d.mapInPandas(gen_noise, schema="doc_id long, s int, sum_abs_n long")
    return (
        scored.groupBy("s")
        .agg(
            F.expr("CAST(MIN(doc_id) AS BIGINT)").alias("canonical_doc"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_images"),
            F.expr("CAST(MAX(sum_abs_n) AS BIGINT)").alias("sum_abs_n"),
        )
        .select(
            "s",
            F.expr("CAST(s % 4 = 2 AS INT)").alias("is_noisy"),
            "canonical_doc",
            "n_images",
            "sum_abs_n",
            F.expr(
                "CAST(ROUND(CAST(sum_abs_n AS DOUBLE) * SQRT(PI() / CAST(2 AS DOUBLE))"
                " / CAST(1176 AS DOUBLE) * CAST(1000000 AS DOUBLE)) AS BIGINT)"
            ).alias("sigma_e6"),
        )
        .orderBy("s")
    )


MULTIMODAL_NOISE_SQL = """
WITH pxc AS (
  SELECT s, x, y, c,
         CASE WHEN s % 4 = 2
              THEN LEAST(GREATEST((x*x + 2*y + 5*s + 37*c + (s*x)//3) % 256
                                  + (x*7 + y*13 + c*29 + s) % 5 - 2, 0), 255)
              ELSE (x*x + 2*y + 5*s + 37*c + (s*x)//3) % 256 END AS v
  FROM generate_series(0, 15) ts(s),
       generate_series(0, 15) tx(x),
       generate_series(0, 15) ty(y),
       generate_series(0, 2) tc(c)
),
gray AS (
  SELECT s, x, y, CAST(SUM(v) // 3 AS BIGINT) AS g
  FROM pxc GROUP BY 1, 2, 3
),
conv AS (
  SELECT cpx.s, cpx.x, cpx.y,
         ABS(SUM(CASE
              WHEN ABS(n.x - cpx.x) = 1 AND ABS(n.y - cpx.y) = 1 THEN n.g
              WHEN ABS(n.x - cpx.x) + ABS(n.y - cpx.y) = 1 THEN -2 * n.g
              WHEN n.x = cpx.x AND n.y = cpx.y THEN 4 * n.g
              ELSE 0 END)) AS an
  FROM gray cpx
  JOIN gray n ON n.s = cpx.s AND n.x BETWEEN cpx.x - 1 AND cpx.x + 1
                            AND n.y BETWEEN cpx.y - 1 AND cpx.y + 1
  WHERE cpx.x BETWEEN 1 AND 14 AND cpx.y BETWEEN 1 AND 14
  GROUP BY 1, 2, 3
),
per_s AS (
  SELECT s, CAST(SUM(an) AS BIGINT) AS sum_abs_n FROM conv GROUP BY 1
),
docs AS (SELECT doc_id, doc_id % 16 AS s FROM documents)
SELECT CAST(d.s AS INTEGER) AS s,
       CAST(CASE WHEN d.s % 4 = 2 THEN 1 ELSE 0 END AS INTEGER) AS is_noisy,
       CAST(MIN(d.doc_id) AS BIGINT) AS canonical_doc,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(MAX(p.sum_abs_n) AS BIGINT) AS sum_abs_n,
       CAST(ROUND(CAST(MAX(p.sum_abs_n) AS DOUBLE) * SQRT(PI() / CAST(2 AS DOUBLE))
            / CAST(1176 AS DOUBLE) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS sigma_e6
FROM docs d JOIN per_s p ON p.s = d.s
GROUP BY 1, 2 ORDER BY 1
"""

QUERIES["multimodal_image_noise_estimate"] = multimodal_image_noise_estimate
ORACLE["multimodal_image_noise_estimate"] = MULTIMODAL_NOISE_SQL
