"""Multimodal (image/audio/video) column handling.

Design (BASELINE.json north star — multimodal columns): media payloads are
opaque ``binary`` columns with a typed metadata struct travelling beside
them. All Spark-side plumbing — schema, partition sizing, Arrow batch
shape through mapInPandas — is real and tested; the actual codec calls are
STUBBED (the container ships no image/audio libraries) behind
``decode_media(..., real=True)`` which raises NotImplementedError, and a
deterministic fake feature extractor used by tests and queries.

Scale notes: binary payloads dominate row size, so the operators here
repartition by size-aware keys before any wide transform, and the decode
path streams Arrow record batches (mapInPandas) so one task never
materializes more than ``spark.sql.execution.arrow.maxRecordsPerBatch``
payloads at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import fan_out

MEDIA_FORMATS = ("png", "jpeg", "wav")

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),      # image-ish metadata
        StructField("height", LongType()),
        StructField("sample_rate", LongType()),  # audio-ish metadata
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: payload = UTF-8
    bytes of the text (deterministic stand-in for real blobs), format and
    metadata derived from doc_id. Produces exactly MEDIA_SCHEMA."""
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in MEDIA_FORMATS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        fmt.alias("format"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.when(F.col("doc_id") % 3 != 2, (F.col("doc_id") % 640 + 1)).alias("width"),
        F.when(F.col("doc_id") % 3 != 2, (F.col("doc_id") % 480 + 1)).alias("height"),
        F.when(F.col("doc_id") % 3 == 2, F.lit(16000)).alias("sample_rate"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: byte
    histogram moments. Pure arithmetic on the payload bytes."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    out = []
    n = len(payload)
    for d in range(dim):
        # mean byte value over the d-th stride slice
        sl = payload[d::dim]
        out.append(round(sum(sl) / max(len(sl), 1) / 255.0, 6))
    assert len(out) == dim
    return out


def decode_media(media: DataFrame, real: bool = False, dim: int = 8) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    ``real=True`` is the hook for an actual codec (PIL/libav) — not
    available in this container, so it raises NotImplementedError. The
    fake path exercises the full distributed plumbing: schema in/out,
    Arrow batch iteration, per-batch vectorized work.
    """
    if real:
        raise NotImplementedError(
            "real media decoding requires image/audio codecs not present in "
            "this environment; use real=False for the deterministic stub"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": [
                        _fake_feature(p, dim) for p in pdf["payload"]
                    ],
                }
            )

    return fan_out(media).mapInPandas(decode_batches, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload every N bytes (for
    video this would be keyframe extraction). JVM-side substr on binary —
    no Python needed for the sampling itself."""
    n_frames = F.floor(F.col("n_bytes") / every_n_bytes).cast("long")
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: F.substring(F.col("payload"), (i * every_n_bytes + 1).cast("int"), 16),
    )
    return media.select(
        "media_id",
        "format",
        n_frames.alias("n_frames"),
        frames.alias("frames"),
    )


def phash_media(media: DataFrame, dim: int = 64) -> DataFrame:
    """64-bit perceptual-hash-style fingerprint per payload.

    Stand-in for a real image pHash (DCT of a downscaled grayscale
    image): here the "signal" is the byte stream itself — ``dim``
    stride-mean samples thresholded at their own mean, packed into one
    BIGINT. The SHAPE is the real thing: with a codec present, only the
    per-batch numpy body changes (decode → DCT → threshold) while the
    Spark contract — binary in, one 64-bit fingerprint out through an
    Arrow batch — is identical. Near-identical payloads (a few bytes
    changed) land within a small Hamming distance, unrelated payloads
    near 32.

    Fully batch-vectorized: the whole Arrow batch is concatenated into
    one byte buffer and the per-(payload, stride) means come from two
    ``np.bincount`` passes over it — no per-row Python loop (the loop
    form made 16M interpreted numpy calls for 250k docs: 59 s at sf5
    vs ~1 s vectorized). Bit packing is ``np.packbits`` + a big-endian
    uint64 view reinterpreted as int64 — the same two's complement as
    the scalar ``h -= 1 << 64``.
    """
    import numpy as np

    if dim != 64:
        # The vectorized packbits->big-endian-uint64 view and the fixed
        # "phash long" output schema both assume exactly one 64-bit word
        # per row; other dims would crash (dim<64) or silently emit
        # multiple words per row (dim=128).
        raise ValueError("dim must be exactly 64 (one int64 fingerprint)")

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"],
                     "phash": pd.Series([], dtype="int64")}
                )
                continue
            payloads = [
                b"" if p is None else bytes(p) for p in pdf["payload"]
            ]
            lens = np.array([len(p) for p in payloads], dtype=np.int64)
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            if buf.size:
                row_id = np.repeat(np.arange(n, dtype=np.int64), lens)
                offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
                pos_in_row = (
                    np.arange(buf.size, dtype=np.int64)
                    - np.repeat(offsets, lens)
                )
                cls = row_id * dim + pos_in_row % dim
                sums = np.bincount(
                    cls, weights=buf.astype(np.float64), minlength=n * dim
                ).reshape(n, dim)
                counts = np.bincount(cls, minlength=n * dim).reshape(n, dim)
            else:
                sums = np.zeros((n, dim))
                counts = np.zeros((n, dim), dtype=np.int64)
            # mean of each stride slice; empty slices contribute 0.0
            # (matches the scalar form's `mean() if slice else 0.0`,
            # and all-empty payloads hash to 0 since no bit clears >).
            means = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
            bits = means > means.mean(axis=1, keepdims=True)
            packed = np.ascontiguousarray(np.packbits(bits, axis=1))
            h = packed.view(">u8").ravel().astype(np.uint64)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": h.view(np.int64)}
            )

    return fan_out(media.select("media_id", "payload")).mapInPandas(
        hash_batches, "media_id long, phash long"
    )


def phash_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 3, max_bucket_size: int = 512
) -> DataFrame:
    """Near-duplicate media pairs by fingerprint Hamming distance.

    Delegates to the fingerprint-generic near-pair core
    (operators/dedup.py::fingerprint_near_pairs), inheriting the
    hardening the text SimHash path earned in the 10x dup-heavy scale
    audit: exact-first collapse of identical fingerprints into star
    pairs (a billion blank images stay linear, never a quadratic
    bucket self-join), 4×16-bit pigeonhole bucketing over DISTINCT
    hashes only, mega-bucket star fallback past ``max_bucket_size``,
    and exact ``bit_count(xor)`` verify on candidates only. Returns
    (media_a, media_b, hamming) with media_a < media_b — a spanning
    structure of the near-dup graph (identical-hash groups link
    through their representative; connected components are exact).
    """
    from .dedup import fingerprint_near_pairs
    from .graph import _register_round_state

    pairs = fingerprint_near_pairs(
        hashes, "media_id", "phash",
        max_bits=max_hamming, max_bucket_size=max_bucket_size,
    )
    out = pairs.select(
        F.col("id_a").alias("media_a"),
        F.col("id_b").alias("media_b"),
        "hamming",
    )
    # re-register: derived frames don't inherit Python-side attributes,
    # and downstream CC chains this state for deterministic release
    return _register_round_state(out, *getattr(pairs, "_round_state", ()))
