"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning) is real and tested; the codec is gated exactly
like the reference gates OCR (reference: src/document_parser.py:22-28):
with Pillow installed, ``_decode_image_real`` decodes payloads into a
deterministic grayscale-histogram feature; without it, ``_feature_fake``
produces a byte-histogram stand-in with the same shape. Installing Pillow
enables the real decode — nothing else changes. Decode errors degrade the
row's feature to None (never crash the stage).

Media rows follow the pages-table pattern: ``(url, media_type, payload
binary, meta struct)``; features come back as fixed-width float arrays so
they compose with operators/similarity.py for cross-modal near-dup search.

Audio mirrors the image path with one upgrade: WAV payloads decode for
REAL via the stdlib ``wave`` module (16-bit PCM → RMS energy envelope),
dependency-free; other codecs gate on soundfile exactly as image decode
gates on Pillow, with the deterministic byte-histogram stand-in when
absent. Video contributes the native frame-sample plan (the frame decode
itself is the gated step).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover — not installed in this environment
    from PIL import Image  # type: ignore  # noqa: F401

    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("url", StringType(), nullable=False),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def _decode_image_real(payload: bytes) -> list[float]:
    """Real decode path (requires Pillow): open → grayscale → 32×32 resize →
    FEATURE_DIM-bin luminance histogram, L1-normalized. Deterministic for a
    given payload. Raises on undecodable bytes; ``_payload_to_feature``
    degrades that row to a None feature (same degrade contract as the OCR
    path, reference: src/document_parser.py:144-146)."""
    import io

    with Image.open(io.BytesIO(payload)) as img:
        gray = img.convert("L").resize((32, 32))
        pixels = list(gray.getdata())
    hist = [0] * FEATURE_DIM
    bucket = 256 // FEATURE_DIM
    for px in pixels:
        hist[min(int(px) // bucket, FEATURE_DIM - 1)] += 1
    total = float(len(pixels))
    return [h / total for h in hist]


def _feature_fake(payload: bytes) -> list[float]:
    """Deterministic stand-in feature: byte-histogram over 16 buckets,
    L1-normalized. Pure function of the payload — stable across runs,
    good enough to exercise the whole downstream similarity stack."""
    if not payload:
        return [0.0] * FEATURE_DIM
    hist = [0] * FEATURE_DIM
    for b in payload[:4096]:
        hist[b % FEATURE_DIM] += 1
    total = float(sum(hist))
    return [h / total for h in hist]


def _payload_to_feature(payload) -> list[float] | None:
    """Dispatch seam: real Pillow decode when installed, the deterministic
    fake otherwise; any decode error degrades the row to None rather than
    failing the stage (mirrors extract_udfs._payload_to_text)."""
    if payload is None:
        return None
    decode = _decode_image_real if HAS_PIL else _feature_fake
    try:
        return decode(bytes(payload))
    except Exception:
        return None


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of binary payloads.

    Partitioning contract: caller repartitions by ``xxhash64(url)`` when
    payload sizes are skewed (same rule as the pages pipeline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_payload_to_feature(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# audio features — mirrors the image path; WAV decodes for REAL via the
# stdlib `wave` module (no external dependency), other codecs gate on
# soundfile exactly like image decode gates on Pillow
# ---------------------------------------------------------------------------

try:  # pragma: no cover — not installed in this environment
    import soundfile  # type: ignore  # noqa: F401

    HAS_SOUNDFILE = True
except Exception:  # pragma: no cover
    HAS_SOUNDFILE = False

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_audio_wav(payload: bytes) -> tuple[int, int, list[float]]:
    """Real WAV decode (stdlib, always available): parse PCM frames and
    compute a FEATURE_DIM-segment RMS energy envelope, L1-normalized —
    deterministic for a given payload. Returns (sample_rate, n_samples,
    feature). Raises on undecodable bytes."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got width={width}")
    samples = struct.unpack(f"<{len(raw) // 2}h", raw)
    if channels > 1:  # mono mixdown: mean over channels, fixed order
        samples = [
            sum(samples[i : i + channels]) / channels
            for i in range(0, len(samples) - channels + 1, channels)
        ]
    n_samples = len(samples)
    if n_samples == 0:
        return sr, 0, [0.0] * FEATURE_DIM
    seg = max(1, n_samples // FEATURE_DIM)
    env = []
    for b in range(FEATURE_DIM):
        chunk = samples[b * seg : (b + 1) * seg]
        env.append(
            (sum(float(s) * s for s in chunk) / len(chunk)) ** 0.5 if chunk else 0.0
        )
    total = sum(env)
    return sr, n_samples, [e / total if total else 0.0 for e in env]


def _decode_audio_soundfile(payload: bytes) -> tuple[int, int, list[float]]:
    """Gated real path for non-WAV codecs (flac/ogg/…): soundfile decode →
    the same RMS envelope. Requires the soundfile package."""
    import io

    import numpy as np
    import soundfile as sf

    data, sr = sf.read(io.BytesIO(payload), always_2d=True)
    mono = data.mean(axis=1)
    n_samples = len(mono)
    if n_samples == 0:
        return int(sr), 0, [0.0] * FEATURE_DIM
    seg = max(1, n_samples // FEATURE_DIM)
    env = [
        float(np.sqrt(np.mean(np.square(mono[b * seg : (b + 1) * seg]))))
        if len(mono[b * seg : (b + 1) * seg])
        else 0.0
        for b in range(FEATURE_DIM)
    ]
    total = sum(env)
    return int(sr), n_samples, [e / total if total else 0.0 for e in env]


def _audio_feature_fake(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for codecs no installed library can decode:
    byte-histogram feature (same shape as the envelope), metadata zeroed —
    the downstream plumbing and similarity stack run identically."""
    return 0, 0, _feature_fake(payload)


def _payload_to_audio_feature(payload) -> tuple[int, int, list[float] | None]:
    """Dispatch seam mirroring ``_payload_to_feature``: RIFF/WAVE magic →
    stdlib wave decode (real, dependency-free); otherwise soundfile when
    installed, the deterministic fake when not. Any decode error degrades
    the row's feature to None — never fails the stage."""
    if payload is None:
        return 0, 0, None
    data = bytes(payload)
    try:
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return _decode_audio_wav(data)
        if HAS_SOUNDFILE:
            return _decode_audio_soundfile(data)
        return _audio_feature_fake(data)
    except Exception:
        return 0, 0, None


def extract_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas audio-feature extraction — identical batch shape and
    partitioning contract as ``extract_media_features``; emits the RMS
    energy envelope plus decode metadata per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_payload_to_audio_feature(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "sample_rate": [d[0] for d in decoded],
                    "n_samples": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode one row per planned frame
    timestamp (the decode itself is the stubbed step). Native expressions —
    the frame plan costs no Python."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("long")
    return media.filter(F.col("media_type") == "video").select(
        "url",
        F.explode(
            F.when(
                n_frames > 0, F.sequence(F.lit(0), n_frames - 1)
            ).otherwise(F.array().cast("array<long>"))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
