"""Multimodal payload columns: images/audio/video as opaque binary +
typed metadata, with the Spark-side plumbing (schema, batching,
partition discipline) AND a real zero-dependency codec layer
(functions/media_codecs.py — PNG/GIF/BMP/PNM/WAV from the published
specs over stdlib zlib/wave + numpy).

Pattern for 100 TB: payloads are a ``binary`` column in the same
row as their metadata; decode/feature steps are ``mapInPandas``
stages sized by bytes (``spark.sql.execution.arrow.maxRecordsPerBatch``
+ ``maxPartitionBytes``), never collected, never shuffled except by
explicit content-hash bucketing. The decoded FEATURES (a few dozen
bytes per row) are what downstream joins and dedups shuffle — the
payload bytes never move after the feature pass.

Format scope: PNG, GIF (multi-frame), BMP, PNM and PCM WAV decode for
real; JPEG/MP3/MP4-class formats (entropy/DCT codecs) are reported as
``unsupported`` — the dispatch table below is the swap point where a
production cluster plugs PIL/libvips/ffmpeg without touching the Spark
plumbing.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .media_codecs import (
    DecodeError,
    ahash64,
    decode_bmp,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_pnm,
    decode_wav,
    encode_gif_animation,
    encode_png,
    mean_luma,
    resize_nearest,
    to_signed64,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sniffed_mime", StringType(), True),
        StructField("payload_hash", StringType(), False),
        StructField("decoded", StringType(), False),  # ok|unsupported|corrupt|empty
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("ahash", LongType(), True),
    ]
)

_MAGIC = (
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"BM", "image/bmp"),
    (b"P5", "image/x-portable-anymap"),
    (b"P6", "image/x-portable-anymap"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),
)


def sniff_media_mime(payload: bytes | None) -> str | None:
    """Prefix-only magic sniff (the reference's AtraFileInformation
    style: cheap, prefix-determined; deep validation happens in
    decode)."""
    if not payload:
        return None
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


def _image_info(arr: np.ndarray, n_frames: int = 1, duration_s: float | None = None) -> dict:
    h, w = arr.shape[:2]
    ch = 1 if arr.ndim == 2 else int(arr.shape[2])
    return {
        "width": int(w),
        "height": int(h),
        "channels": ch,
        "n_frames": int(n_frames),
        "duration_s": duration_s,
        "mean_luma": mean_luma(arr),
        "ahash": to_signed64(ahash64(arr)),
    }


def decode_media(payload: bytes, mime: str) -> dict:
    """Decode a payload into a feature dict.

    Raises :class:`DecodeError` for corrupt payloads of a supported
    format and :class:`NotImplementedError` for formats outside the
    stdlib codec layer's scope (JPEG/MP3/MP4 — swap in native codecs
    here on a production cluster)."""
    try:
        if mime == "audio/wav":
            samples, sr = decode_wav(payload)
            return {
                "sample_rate": int(sr),
                "duration_s": samples.shape[0] / float(sr),
                "rms": float(np.sqrt(np.mean(np.square(samples))))
                if samples.size
                else 0.0,
                "n_frames": int(samples.shape[0]),
                "channels": int(samples.shape[1]),
            }
        # single dispatch table (_STILL_DECODERS + gif) shared with the
        # frame-level operators, so the codec swap point stays in ONE place
        frames, delays = _decode_frames(payload, mime)
        return _image_info(
            frames[0],
            n_frames=len(frames),
            # still formats report no duration (a single frame has no
            # timeline); animated GIF reports the decoded delay sum
            duration_s=float(sum(delays)) if mime == "image/gif" else None,
        )
    except DecodeError:
        raise
    # NOTE: ordered before LookupError — IndexError is its subclass and
    # means corruption, not an unsupported format
    except (ValueError, IndexError, OverflowError, MemoryError) as e:
        # defensive: any malformed-input failure inside a codec is
        # corruption, never a job-killing executor exception
        raise DecodeError(f"{mime}: {e}") from e
    except LookupError:  # pragma: no cover — audio handled above
        raise NotImplementedError(f"no stdlib codec for {mime}")


_FEATURE_COLS = [f.name for f in FEATURE_SCHEMA.fields]
_NULLED = ["width", "height", "channels", "n_frames", "sample_rate",
           "duration_s", "rms", "mean_luma", "ahash"]


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature pass over media rows: size, magic-byte mime,
    content hash, and REAL decoded features (dimensions, channel count,
    frame count, mean luma, 64-bit average perceptual hash for images;
    sample rate, duration, RMS for audio). ``decoded`` records the
    outcome per row: ok | unsupported | corrupt | empty — a corrupt
    payload never kills the batch."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {c: [] for c in _FEATURE_COLS}
            for i in range(len(pdf)):
                payload = pdf["payload"].iat[i]
                payload = bytes(payload) if payload is not None else None
                mime = sniff_media_mime(payload)
                info: dict = {}
                if not payload:
                    status = "empty"
                else:
                    try:
                        info = decode_media(payload, mime or "")
                        status = "ok"
                    except NotImplementedError:
                        status = "unsupported"
                    except DecodeError:
                        status = "corrupt"
                out["media_id"].append(int(pdf["media_id"].iat[i]))
                out["kind"].append(pdf["kind"].iat[i])
                out["n_bytes"].append(len(payload) if payload else 0)
                out["sniffed_mime"].append(mime)
                out["payload_hash"].append(hashlib.md5(payload or b"").hexdigest())
                out["decoded"].append(status)
                for c in _NULLED:
                    out[c].append(info.get(c))
            pdf_out = pd.DataFrame({c: out[c] for c in _FEATURE_COLS})
            for c, dt in (
                ("width", "Int32"), ("height", "Int32"), ("channels", "Int32"),
                ("n_frames", "Int32"), ("sample_rate", "Int32"), ("ahash", "Int64"),
            ):
                pdf_out[c] = pd.array(out[c], dtype=dt)
            yield pdf_out

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("decoded", StringType(), False),  # ok|not_image|unsupported|corrupt|empty
        StructField("orig_width", IntegerType(), True),
        StructField("orig_height", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),  # re-encoded PNG
        StructField("ahash", LongType(), True),  # perceptual hash of the RESIZED image
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("decoded", StringType(), False),
        StructField("n_frames", IntegerType(), True),
        StructField("frame_index", IntegerType(), True),
        StructField("t_offset", DoubleType(), True),  # seconds from stream start
        StructField("mean_luma", DoubleType(), True),
        StructField("ahash", LongType(), True),
    ]
)


# THE codec swap point: a production cluster replaces these entries
# with PIL/libvips (stills), ffmpeg (gif/video), soundfile (audio)
# without touching any Spark stage — every decode path in this module
# (decode_media, _decode_frames, the fingerprint pass) dispatches here.
_STILL_DECODERS = {
    "image/png": decode_png,
    "image/jpeg": decode_jpeg,
    "image/bmp": decode_bmp,
    "image/x-portable-anymap": decode_pnm,
}


def _decode_frames(payload: bytes, mime: str):
    """(frames, per-frame delay seconds) for image payloads; raises
    LookupError for decodable-but-not-image media (audio)."""
    if mime == "image/gif":
        return decode_gif(payload)
    if mime in _STILL_DECODERS:
        return [_STILL_DECODERS[mime](payload)], [0.0]
    if mime == "audio/wav":
        raise LookupError("decodable but not an image")
    raise NotImplementedError(f"no stdlib codec for {mime}")


def _frame_status(payload, mime):
    """Shared status ladder for the image-frame operators."""
    if not payload:
        return "empty", None, None
    try:
        frames, delays = _decode_frames(payload, mime or "")
        return "ok", frames, delays
    except NotImplementedError:
        return "unsupported", None, None
    except DecodeError:
        return "corrupt", None, None
    # NOTE: ordered before LookupError — IndexError is its subclass and
    # means corruption, not "decodable but not an image" (same ladder
    # ordering as decode_media above, so the two can never disagree on
    # the same malformed payload)
    except (ValueError, IndexError, OverflowError, MemoryError):
        return "corrupt", None, None
    except LookupError:
        return "not_image", None, None


def resized_features(arr: np.ndarray, max_dim: int) -> dict:
    """Shared by the Spark resize pass and the golden generator: resize
    the array, re-encode as PNG, hash the RESIZED pixels."""
    small = resize_nearest(arr, max_dim)
    return {
        "orig_width": int(arr.shape[1]),
        "orig_height": int(arr.shape[0]),
        "width": int(small.shape[1]),
        "height": int(small.shape[0]),
        "payload": encode_png(small if small.ndim == 3 else np.stack([small] * 3, -1)),
        "ahash": to_signed64(ahash64(small)),
    }


def sample_frame_indices(n_frames: int, k: int) -> list[int]:
    """Evenly spaced frame sample, endpoints included, duplicates
    collapsed — pure integer math so the golden generator and the Spark
    pass cannot disagree."""
    if n_frames <= 1 or k <= 1:
        return [0]
    if k >= n_frames:
        return list(range(n_frames))
    return sorted({(i * (n_frames - 1)) // (k - 1) for i in range(k)})


def frame_feature_rows(frames, delays, k: int) -> list[dict]:
    """Shared by the Spark frame-sample pass and the golden generator."""
    offs = [0.0]
    for d in delays[:-1]:
        offs.append(offs[-1] + d)
    return [
        {
            "n_frames": len(frames),
            "frame_index": int(ix),
            "t_offset": float(offs[ix]),
            "mean_luma": mean_luma(frames[ix]),
            "ahash": to_signed64(ahash64(frames[ix])),
        }
        for ix in sample_frame_indices(len(frames), k)
    ]


def media_resize(df: DataFrame, max_dim: int = 8) -> DataFrame:
    """Thumbnail pass: decode image payloads, nearest-neighbor downscale
    to max(H, W) <= max_dim, re-encode as PNG, and hash the resized
    pixels. Arrow-batched mapInPandas over the payload column — on a
    production cluster this is the exact stage shape for a
    PIL/libvips-backed resize; only the codec dispatch changes. Rows
    that are not decodable images pass through with their status and
    NULL features (never dropped, never batch-fatal)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RESIZE_SCHEMA.fields]
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for i in range(len(pdf)):
                payload = pdf["payload"].iat[i]
                payload = bytes(payload) if payload is not None else None
                status, frames, _ = _frame_status(payload, sniff_media_mime(payload))
                info = resized_features(frames[0], max_dim) if status == "ok" else {}
                out["media_id"].append(int(pdf["media_id"].iat[i]))
                out["decoded"].append(status)
                for c in cols[2:]:
                    out[c].append(info.get(c))
            pdf_out = pd.DataFrame({c: out[c] for c in cols})
            for c in ("orig_width", "orig_height", "width", "height"):
                pdf_out[c] = pd.array(out[c], dtype="Int32")
            pdf_out["ahash"] = pd.array(out["ahash"], dtype="Int64")
            yield pdf_out

    return df.mapInPandas(run, RESIZE_SCHEMA)


def media_frame_sample(df: DataFrame, k: int = 3) -> DataFrame:
    """Frame-sampling pass for animated media: decode, pick k evenly
    spaced frames (endpoints included), emit one row per sampled frame
    with its stream time offset and per-frame visual features. Single-
    frame images yield their only frame; non-image rows yield one
    status row. This is the video-keyframe stage shape — a production
    cluster swaps the GIF decoder for ffmpeg keyframe extraction and
    the row geometry (explode media -> frames) is unchanged."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        feat_cols = cols[2:]
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for i in range(len(pdf)):
                payload = pdf["payload"].iat[i]
                payload = bytes(payload) if payload is not None else None
                status, frames, delays = _frame_status(payload, sniff_media_mime(payload))
                rows = (
                    frame_feature_rows(frames, delays, k)
                    if status == "ok"
                    else [dict.fromkeys(feat_cols)]
                )
                for r in rows:
                    out["media_id"].append(int(pdf["media_id"].iat[i]))
                    out["decoded"].append(status)
                    for c in feat_cols:
                        out[c].append(r.get(c))
            pdf_out = pd.DataFrame({c: out[c] for c in cols})
            for c in ("n_frames", "frame_index"):
                pdf_out[c] = pd.array(out[c], dtype="Int32")
            pdf_out["ahash"] = pd.array(out["ahash"], dtype="Int64")
            yield pdf_out

    return df.mapInPandas(run, FRAME_SCHEMA)


def media_audio_fingerprints(df: DataFrame) -> DataFrame:
    """Landmark audio fingerprints (media_codecs.audio_fingerprints)
    for WAV payloads: one row per (media_id, fp). Arrow-batched
    mapInPandas; rows that are not decodable audio emit nothing (the
    fingerprint relation is sparse by design — joins downstream)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codecs import audio_fingerprints

        for pdf in batches:
            ids: list[int] = []
            fps: list[int] = []
            for i in range(len(pdf)):
                payload = pdf["payload"].iat[i]
                payload = bytes(payload) if payload is not None else None
                if not payload or sniff_media_mime(payload) != "audio/wav":
                    continue
                try:
                    samples, _sr = decode_wav(payload)
                except DecodeError:
                    continue
                for fp in audio_fingerprints(samples[:, 0]):
                    ids.append(int(pdf["media_id"].iat[i]))
                    fps.append(fp)
            yield pd.DataFrame({"media_id": ids, "fp": fps}).astype(
                {"media_id": "int64", "fp": "int64"}
            )

    return df.mapInPandas(run, "media_id long, fp long")


def audio_near_dup(
    fps: DataFrame, min_common: int = 8, max_fp_docs: int = 1000
) -> DataFrame:
    """Audio near-duplicate pairs: media sharing >= ``min_common``
    landmark fingerprints (re-encoded / phase-shifted copies share
    dominant spectral bins even when PCM bytes differ). Same scale
    discipline as the shingle joins: fingerprints hotter than
    ``max_fp_docs`` are dropped before the self-join (logged), so the
    join is bounded by fp bucket size, never O(n^2) over the corpus.
    All JVM column math."""
    # ONE shuffle and ONE pass over the (expensive: decode + FFT)
    # fingerprint lineage: group media ids per fingerprint, drop groups
    # hotter than the cap (logged with the count, never silent), and
    # expand ordered pairs INSIDE each group with JVM array lambdas —
    # no self-join, so the decode pass is never executed twice.
    groups = fps.groupBy("fp").agg(
        F.array_sort(F.collect_set("media_id")).alias("ids")
    ).localCheckpoint()  # materializes ONCE for the hot count + expansion below
    hot_n = groups.filter(F.size("ids") > max_fp_docs).count()
    if hot_n:
        import logging

        logging.getLogger(__name__).warning(
            "audio_near_dup: dropping %d fingerprints with docfreq > %d "
            "before pair expansion",
            hot_n,
            max_fp_docs,
        )
    pairs = F.expr(
        "flatten(transform(ids, (x, i) ->"
        " transform(slice(ids, i + 2, size(ids)), y ->"
        " struct(x AS media_a, y AS media_b))))"
    )
    return (
        groups.filter(F.size("ids").between(2, max_fp_docs))
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.media_a").alias("media_a"), F.col("p.media_b").alias("media_b"))
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def synth_audio_fp_goldens(n: int, seed: int) -> list[dict]:
    """Golden (media_id, fp) rows computed from the generator's SOURCE
    samples via the same shared fingerprint function — the WAV decoder
    is never consulted (lossless 16-bit round trip makes the decoded
    samples bit-identical to the quantized source)."""
    from .media_codecs import audio_fingerprints

    rows = []
    for i in range(n):
        _kind, _payload, _info, status, src = _synth_row(i, seed)
        if status == "ok" and src is not None and "samples" in src:
            for fp in audio_fingerprints(src["samples"]):
                rows.append({"media_id": i, "fp": fp})
    return rows


def media_exact_dedup(df: DataFrame) -> DataFrame:
    """Exact media dedup on payload hash (JVM md5, no Python)."""
    return (
        df.select(F.md5(F.col("payload")).alias("payload_hash"), "media_id")
        .groupBy("payload_hash")
        .agg(F.min("media_id").alias("keeper"), F.count("*").alias("n_dups"))
    )


def media_phash_near_dup(features: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash Hamming distance
    over the decoded ``ahash`` column (visual near-dups survive
    re-encoding and minor pixel noise that defeats md5 dedup).

    Blocking is the pigeonhole band join (dedup.py's SimHash pattern):
    ``max_hamming + 1`` contiguous bit bands over the 64-bit hash — a
    pair within Hamming h <= max_hamming matches on at least one band,
    so recall is 100% by construction and the join is never O(n^2).
    Band extraction uses ``shiftrightunsigned`` (the top ahash bit
    makes the long negative; an arithmetic shift would sign-extend
    into the band keys). All JVM column math — no Python."""
    sig = features.filter(F.col("ahash").isNotNull()).select("media_id", "ahash")
    n_bands = max_hamming + 1
    base, rem = divmod(64, n_bands)
    bands = None
    off = 0
    for b in range(n_bands):
        w = base + (1 if b < rem else 0)
        part = sig.select(
            "media_id",
            "ahash",
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("ahash"), off)
            .bitwiseAND(F.lit((1 << w) - 1))
            .alias("key"),
        )
        bands = part if bands is None else bands.unionByName(part)
        off += w
    a = bands.select(
        F.col("media_id").alias("media_a"), F.col("ahash").alias("ha"), "band", "key"
    )
    b = bands.select(
        F.col("media_id").alias("media_b"), F.col("ahash").alias("hb"), "band", "key"
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["media_a", "media_b"])
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic REAL media table for tests/benches: payloads are
    genuine PNG/JPEG/GIF/BMP/WAV bytes produced by the codec layer's
    encoders, plus planted exact duplicates, near-duplicate images
    (small pixel noise), an unsupported format (progressive JPEG) and a
    corrupt payload — every ``decoded`` status is represented."""
    media, _golden = synth_media_with_golden(n, seed)
    return spark.createDataFrame(media, MEDIA_SCHEMA)


def synth_media_with_golden(n: int = 64, seed: int = 42):
    """The canonical media synthesis: returns (media_rows, golden_rows)
    where golden_rows are the EXPECTED feature rows computed BY
    CONSTRUCTION from the source arrays/samples the encoders were fed —
    never by running the decoders. A fixture oracle reads the goldens;
    the Spark feature pass must reproduce them through real
    encode->decode round trips (lossless codecs + shared feature fns
    make the doubles bit-identical)."""
    import hashlib

    media_rows, golden_rows = [], []
    for i in range(n):
        kind, payload, info, status, _src = _synth_row(i, seed)
        media_rows.append((i, kind, None, payload, None, None, None))
        golden_rows.append(
            {
                "media_id": i,
                "kind": kind,
                "n_bytes": len(payload) if payload else 0,
                "sniffed_mime": sniff_media_mime(payload),
                "payload_hash": hashlib.md5(payload or b"").hexdigest(),
                "decoded": status,
                **{c: info.get(c) for c in _NULLED},
            }
        )
    return media_rows, golden_rows


def synth_media_derived_goldens(n: int, seed: int, max_dim: int = 8, k_frames: int = 3):
    """Golden rows for the derived image passes (media_resize,
    media_frame_sample), computed from the generator's SOURCE frames —
    the decoders are never consulted. Statuses mirror the operators'
    ladder: audio rows are ``not_image``, JPEG-magic rows
    ``unsupported``, truncated payloads ``corrupt``, None ``empty``."""
    resize_rows, frame_rows = [], []
    for i in range(n):
        kind, payload, _info, status, src = _synth_row(i, seed)
        if src is None or "frames" not in src:
            st = status if status != "ok" else "not_image"
            resize_rows.append({"media_id": i, "decoded": st})
            frame_rows.append({"media_id": i, "decoded": st})
            continue
        frames, delays = src["frames"], src["delays"]
        resize_rows.append(
            {"media_id": i, "decoded": "ok", **resized_features(frames[0], max_dim)}
        )
        for r in frame_feature_rows(frames, delays, k_frames):
            frame_rows.append({"media_id": i, "decoded": "ok", **r})
    return resize_rows, frame_rows


def _synth_row(i: int, seed: int):
    """One deterministic (kind, payload, expected_features, status,
    source). ``source`` is (frames, per-frame delay seconds) for image
    rows — the arrays the encoder was fed, so derived goldens can be
    computed without running any decoder — and None otherwise."""
    from .media_codecs import encode_bmp, encode_gif, encode_wav

    rng = np.random.RandomState(seed * 1_000_003 + i)
    slot = i % 8
    if slot in (0, 1, 2, 5):
        if i % 16 == 1:  # exact duplicate payload family (GIF slot)
            arr = np.full((8, 8, 3), 37, dtype=np.uint8)
        else:
            arr = rng.randint(0, 256, size=(16 + i % 5, 16, 3), dtype=np.uint8).astype(
                np.uint8
            )
        if slot == 5:  # near-duplicate of the slot-0 image five ids back
            base = np.random.RandomState(seed * 1_000_003 + (i - 5)).randint(
                0, 256, size=(16 + (i - 5) % 5, 16, 3), dtype=np.uint8
            ).astype(np.uint8)
            arr = base.copy()
            arr[0, 0] = (arr[0, 0].astype(int) + 4).clip(0, 255).astype(np.uint8)
        if slot == 1:
            q = (arr // 64 * 64).astype(np.uint8)  # <=256 colors
            return (
                "image",
                encode_gif(q),
                {**_image_info(q), "duration_s": 0.0},
                "ok",
                {"frames": [q], "delays": [0.0]},
            )
        if slot == 2:
            if i % 16 == 10:
                # real baseline JPEG (codec layer's own encoder). JPEG is
                # LOSSY, so this family's golden is golden-by-construction
                # through the decoder: the expected array is DEFINED as
                # decode(encode(src)) — both the fixture generator and the
                # Spark pass run the identical pure function, and decoder
                # correctness itself is pinned against source arrays in
                # tests/test_media_codecs.py. i%32==26 is a near-duplicate
                # of i%32==10's gradient (one perturbed pixel) so JPEG rows
                # join the perceptual-hash near-dup pairs.
                from .media_codecs import decode_jpeg, encode_jpeg

                k = i // 32
                yy, xx = np.mgrid[0 : 16 + k % 3, 0:16]
                src = np.stack(
                    [(yy * 3 + xx * 5 + k * 37 + c * 11) % 256 for c in range(3)],
                    axis=-1,
                ).astype(np.uint8)
                if i % 32 == 26:
                    src = src.copy()
                    src[1, 1] = (src[1, 1].astype(int) + 4).clip(0, 255).astype(np.uint8)
                payload = encode_jpeg(src, quality=90)
                dec = decode_jpeg(payload)
                return ("image", payload, _image_info(dec), "ok",
                        {"frames": [dec], "delays": [0.0]})
            return ("image", encode_bmp(arr), _image_info(arr), "ok",
                    {"frames": [arr], "delays": [0.0]})
        return ("image", encode_png(arr), _image_info(arr), "ok",
                {"frames": [arr], "delays": [0.0]})
    if slot == 3:
        # a deterministic "melody": frequency steps every 160 samples,
        # so the landmark fingerprint is a sequence of dominant-bin
        # 3-grams rather than one constant bin
        nsamp = 1600 + 80 * (i % 4)
        base = i - 8 if i % 16 == 11 else i
        # near-duplicate family: same melody as id i-8 with a small
        # phase shift — different PCM bytes, same dominant bins
        phase = 0.01 if i % 16 == 11 else 0.0
        t = np.arange(nsamp) / 8000.0
        seg_freq = 300.0 + 40.0 * ((base * 7 + (np.arange(nsamp) // 160) * 3) % 12)
        x = 0.3 * np.sin(2 * np.pi * seg_freq * t + phase)
        # expected rms reflects the encoder's documented 16-bit
        # quantization (computed here independently of the decoder)
        pcm = np.clip(np.rint(x * 32767.0), -32768, 32767) / 32768.0
        info = {
            "sample_rate": 8000,
            "duration_s": nsamp / 8000.0,
            "rms": float(np.sqrt(np.mean(np.square(pcm)))),
            "n_frames": nsamp,
            "channels": 1,
        }
        return ("audio", encode_wav(x, 8000), info, "ok",
                {"samples": pcm, "sr": 8000})
    if slot == 4:
        # unsupported: PROGRESSIVE JPEG (SOF2) — a valid format outside
        # the baseline decoder's declared scope, reported `unsupported`
        # never `corrupt` (the deterministic tail varies payload hashes)
        return "image", b"\xff\xd8\xff\xc2" + rng.bytes(96), {}, "unsupported", None
    if slot == 6:  # corrupt: truncated PNG
        png = encode_png(rng.randint(0, 256, (12, 12, 3)).astype(np.uint8))
        return "image", png[:40], {}, "corrupt", None
    if i % 16 == 15:  # animated GIF: 3-6 frames with centisecond delays
        nf = 3 + (i // 16) % 4
        frames = [
            (rng.randint(0, 4, size=(12 + i % 3, 14, 3)) * 80).astype(np.uint8)
            for _ in range(nf)
        ]
        delays_cs = [4 + 2 * (f % 5) for f in range(nf)]
        delays_s = [d / 100.0 for d in delays_cs]
        info = _image_info(frames[0], n_frames=nf, duration_s=float(sum(delays_s)))
        return ("image", encode_gif_animation(frames, delays_cs), info, "ok",
                {"frames": frames, "delays": delays_s})
    return "image", None, {}, "empty", None


def shard_pack(
    df: DataFrame,
    size_col: str,
    shard_bytes: int = 1 << 30,
    order_col: str = "doc_id",
) -> DataFrame:
    """Webdataset-style shard packing: assign every item to a
    size-bounded shard by GLOBAL byte position in a deterministic
    order, emitting (order_col, shard_id, offset_in_shard, size) — the
    index a training loader reads to stream shard files without
    unpacking them. Items keep ``order_col`` order inside and across
    shards; an item whose bytes straddle a boundary belongs to the
    shard its FIRST byte lands in (shards are approximately
    ``shard_bytes``, never re-split an item).

    This is a global prefix sum, and the naive Spark spelling —
    ``Window.orderBy(order_col)`` with no partition key — collapses
    the whole table into ONE task. Uses the shared two-phase
    distributed prefix sum (``functions/prefix.py``), whose result is
    a pure function of the global order, so a single-window SQL
    oracle reproduces it exactly.
    """
    from .prefix import distributed_prefix_sum

    packed = distributed_prefix_sum(df, order_col, size_col, out_col="_cum")
    # integer DIV, not floor(double /): past 2^53 cumulative bytes a
    # double-precision quotient can land one shard off while the exact
    # long modulo still reflects the true offset — an internally
    # inconsistent index entry
    b = int(shard_bytes)
    return (
        packed.withColumn(
            "_start", (F.col("_cum") - F.col(size_col)).cast("long")
        )
        .select(
            F.col(order_col),
            F.expr(f"_start DIV {b}").alias("shard_id"),
            (F.col("_start") % F.lit(b)).alias("offset_in_shard"),
            F.col(size_col).cast("long").alias("size"),
        )
    )


def pack_sequences(
    df: DataFrame,
    size_col: str,
    block_tokens: int = 2048,
    order_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing: concatenate all documents in global
    ``order_col`` order and cut the token stream into fixed
    ``block_tokens``-size training blocks, SPLITTING documents across
    block boundaries (the concat-and-chunk regime of GPT/LLaMA
    pretraining — the complement of ``shard_pack``, which never splits
    an item). Emits one row per (document, block) SEGMENT:

      order_col     — the document
      block_id      — which fixed-size block the segment lands in
      block_offset  — segment start position inside the block
      doc_offset    — segment start position inside the document
      seg_len       — segment length in tokens

    A loader materializes block b by concatenating its segments in
    block_offset order (and derives attention-mask document boundaries
    from the segment edges). Zero-length documents are dropped — they
    occupy no positions in the stream.

    Scale: the document's global start position is the shared
    two-phase distributed prefix sum (``functions/prefix.py``) — never
    a single-task global window. A document spanning k blocks explodes
    into ceil(size/block_tokens)+1 <= k+1 rows via a bounded
    ``sequence()``; all arithmetic is integer (DIV, not floor(double/),
    for the same 2^53 reason as shard_pack). Everything is
    whole-stage JVM; the only shuffle is the prefix sum's range
    exchange. The result is a pure function of the global order, so a
    single-window SQL twin reproduces it exactly.
    """
    from .prefix import distributed_prefix_sum

    b = int(block_tokens)
    packed = (
        distributed_prefix_sum(df, order_col, size_col, out_col="_cum")
        .filter(F.col(size_col) > 0)
        .withColumn("_start", (F.col("_cum") - F.col(size_col)).cast("long"))
        .withColumn("_end", F.col("_cum").cast("long"))
    )
    exploded = packed.withColumn(
        "block_id",
        F.explode(F.sequence(F.expr(f"_start DIV {b}"), F.expr(f"(_end - 1) DIV {b}"))),
    )
    seg_start = F.greatest(F.col("_start"), F.col("block_id") * F.lit(b))
    seg_end = F.least(F.col("_end"), (F.col("block_id") + 1) * F.lit(b))
    return exploded.select(
        F.col(order_col),
        F.col("block_id").cast("long").alias("block_id"),
        (seg_start - F.col("block_id") * F.lit(b)).cast("long").alias("block_offset"),
        (seg_start - F.col("_start")).cast("long").alias("doc_offset"),
        (seg_end - seg_start).cast("long").alias("seg_len"),
    )
