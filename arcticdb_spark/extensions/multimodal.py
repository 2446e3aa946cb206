"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + a typed metadata struct; the Spark-side
contract (schema, partitioning, Arrow batch shape through ``mapInPandas``)
is real and tested — the actual codec calls are STUBBED (the image/audio
libraries are not in this container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (seeded by content hash) produces stable features so the
pipeline is end-to-end testable.

Scale shape: media rows are large and variable — ``mapInPandas`` streams
Arrow batches so no single row set is materialized; repartition by a size
bucket first so batches stay balanced (skew from 100 MB videos next to 10 KB
thumbnails).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("content", T.BinaryType(), True),      # opaque payload
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "sha256 string, feat array<double>")


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: content-hash seeded floats.
    Each feature is (32-bit digest chunk) / 2**32 — exactly representable in
    a double, so an independent engine (the DuckDB oracle) reproduces the
    values bit-for-bit from the same payload."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i:4 * i + 4], "big") / 2**32 for i in range(dim)]


def decode_media_batch(fake: bool = True, dim: int = 8, decoder=None):
    """Returns a mapInPandas function: binary content -> feature vector.

    ``decoder`` is the real-codec injection seam: a callable
    ``(payload: bytes, kind: str) -> list[float]`` (e.g. a PIL decode +
    embed, a librosa spectrogram, an ffmpeg probe) — it is serialized by
    value into the python workers, so pass a top-level-importable or
    locally-defined function, and do any heavy model loading lazily inside
    it. Without a decoder, ``fake=True`` uses the deterministic
    content-hash features (oracle-checkable stand-in); ``fake=False`` with
    no decoder is a configuration error raised at plan-build time.
    """
    if decoder is None and not fake:
        raise ValueError(
            "decode_media_batch: pass decoder=<callable(payload, kind)> "
            "for real decoding, or fake=True for the deterministic "
            "content-hash features")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf["content"]
            kinds = pdf["kind"]
            if decoder is not None:
                feats = [decoder(bytes(b) if b is not None else b"", k)
                         for b, k in zip(contents, kinds)]
            else:
                feats = [_fake_features(b or b"", dim) for b in contents]
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": kinds,
                "n_bytes": contents.map(lambda b: len(b) if b is not None else 0),
                "sha256": contents.map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()),
                "feat": feats,
            })
            yield out
    return fn


def extract_features(df: DataFrame, fake: bool = True, dim: int = 8,
                     batch_partitions: int | None = None,
                     decoder=None) -> DataFrame:
    """Media frame -> feature frame via Arrow-batched mapInPandas
    (``decoder`` — see :func:`decode_media_batch`)."""
    if batch_partitions:
        # balance batches: big payloads hash-spread across partitions
        df = df.repartition(batch_partitions, "media_id")
    return df.mapInPandas(
        decode_media_batch(fake=fake, dim=dim, decoder=decoder),
        FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame, limit: int | None = None) -> DataFrame:
    """Deterministic media frame derived from the ``documents`` table: the
    UTF-8 text bytes stand in for an opaque payload (kind assigned round-robin
    by doc_id). Because the payload is a pure function of table data, the
    whole decode pipeline is oracle-checkable in SQL — an engine with real
    codecs would substitute actual image/audio bytes and lose only the
    oracle, not the plumbing."""
    out = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.concat(F.lit("application/x-doc")).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        # time-based media get a deterministic duration (1 ms per source
        # char) so frame sampling is a pure function of table data
        F.when(F.col("doc_id") % 3 != 0, F.col("n_chars"))
         .cast("long").alias("duration_ms"))
    return out.limit(limit) if limit else out


def make_demo_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), f"application/x-{kind}",
                     64 + i % 128 if kind == "image" else None,
                     64 + i % 64 if kind == "image" else None,
                     1000 * (i % 30) if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Per-kind payload statistics — pure column expressions, no Python."""
    return (df.groupBy("kind")
              .agg(F.count(F.lit(1)).alias("n_media"),
                   F.sum(F.length("content")).alias("total_bytes"),
                   F.max(F.length("content")).alias("max_bytes"),
                   F.countDistinct(F.sha2(F.col("content"), 256))
                    .alias("n_distinct_payloads")))


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  frame_bytes: int = 64) -> DataFrame:
    """Frame sampling for time-based media (audio/video): one output row per
    sampled frame, ``frame = content[i*frame_bytes : (i+1)*frame_bytes]``
    with byte offsets wrapped modulo the payload size (the deterministic
    stand-in for a real ffmpeg seek+decode — swap the frame expression for a
    decoder UDF in an environment that has one; the fan-out plumbing,
    schema, and partitioning do not change).

    Entirely JVM-side: ``explode(sequence(...))`` for the fan-out and
    ``substring`` on the binary payload — no Python in the path, so the
    same arithmetic replays exactly in the DuckDB oracle.
    """
    n_frames = F.greatest(
        F.lit(1),
        (F.coalesce(F.col("duration_ms"), F.lit(0)) / F.lit(every_ms))
        .cast("long"))
    size = F.length("content")
    frames = (df.filter(F.col("kind").isin("audio", "video"))
                .filter(size > 0)
                .select("media_id", "kind", "content", size.alias("n_bytes"),
                        F.explode(F.sequence(F.lit(0), n_frames - 1))
                         .alias("frame_idx")))
    off = (F.col("frame_idx") * frame_bytes) % F.col("n_bytes") + 1
    frame = F.expr(f"substring(content, "
                   f"(frame_idx * {frame_bytes}) % n_bytes + 1, "
                   f"{frame_bytes})")
    return (frames.select("media_id", "kind", "frame_idx",
                          off.alias("byte_offset"),
                          frame.alias("frame"))
                  .withColumn("frame_sha",
                              F.sha2(F.col("frame"), 256)))
