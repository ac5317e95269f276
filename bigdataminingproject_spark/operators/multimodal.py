"""Multimodal column plumbing (north-star set).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side machinery — schema,
partition-friendly batch shapes, Arrow-batched UDF signatures — is real
and tested; the codec step itself is STUBBED because no imaging/audio
libraries exist in this environment:

- ``decode_media``: raises NotImplementedError for real codecs unless
  the payload is this module's deterministic fake format (used by tests
  and the synthetic query below);
- ``extract_features``: byte-histogram embedding — a real, deterministic,
  dependency-free feature extractor over any binary payload, usable with
  the similarity operators;
- ``resize_images`` / ``sample_frames``: stubs with production
  signatures and the fake-format implementation.

Fake format (deterministic, self-describing):
``b"FAKE" + width(4B big-endian) + height(4B) + payload bytes``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FAKE_MAGIC = b"FAKE"
FEATURE_DIM = 16


def make_fake_media(width: int, height: int, payload: bytes) -> bytes:
    """Deterministic stand-in for an encoded image/frame."""
    return FAKE_MAGIC + struct.pack(">II", width, height) + payload


def _decode_one(content: bytes) -> tuple[int, int, bytes]:
    """Decode a single payload. Real codecs are deliberately not wired:
    this container has no imaging libraries, so anything non-FAKE raises
    (the documented stub boundary)."""
    if content is None:
        raise ValueError("null media payload")
    if content[:4] != FAKE_MAGIC:
        raise NotImplementedError(
            "real media codecs (JPEG/PNG/WAV/MP4) are not available in "
            "this environment; payload is not in the FAKE test format"
        )
    w, h = struct.unpack(">II", content[4:12])
    return w, h, content[12:]


def decode_media(media: DataFrame, content_col: str = "content") -> DataFrame:
    """Decode binary payloads → (media_id, width, height, n_bytes).

    ``mapInPandas`` so each Arrow batch is decoded vectorized-ish in one
    Python call; schema and batch shape are exactly what a real decoder
    (PIL/ffmpeg) would use — only ``_decode_one``'s body changes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_bytes": []}
            for mid, content in zip(pdf["media_id"], pdf[content_col]):
                w, h, payload = _decode_one(bytes(content))
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    return media.select("media_id", content_col).mapInPandas(
        run, schema="media_id long, width int, height int, n_bytes long"
    )


def extract_features(
    media: DataFrame, content_col: str = "content", dim: int = FEATURE_DIM
) -> DataFrame:
    """Byte-histogram feature embedding over any binary payload.

    Real (not stubbed): buckets the byte distribution into ``dim`` bins,
    L1-normalized — a deterministic, library-free stand-in for a learned
    image/audio embedding with the same schema (array<float>), so the
    similarity-search operators compose with it unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, vecs = [], []
            for mid, content in zip(pdf["media_id"], pdf[content_col]):
                data = np.frombuffer(bytes(content), dtype=np.uint8)
                hist = np.bincount(data >> (8 - dim.bit_length() + 1), minlength=dim)[
                    :dim
                ].astype(np.float64)
                total = hist.sum() or 1.0
                ids.append(int(mid))
                vecs.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return media.select("media_id", content_col).mapInPandas(
        run, schema="media_id long, embedding array<float>"
    )


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
) -> DataFrame:
    """Resize stub: real implementation would decode → resample → encode
    per Arrow batch. For the FAKE format it rewrites the header (payload
    untouched), preserving the production signature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid, content in zip(pdf["media_id"], pdf[content_col]):
                _, _, payload = _decode_one(bytes(content))
                ids.append(int(mid))
                blobs.append(make_fake_media(target_w, target_h, payload))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return media.select("media_id", content_col).mapInPandas(
        run, schema="media_id long, content binary"
    )


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 64,
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling stub: emits one row per sampled "frame" (payload
    slice). Real video sampling keeps this exact output shape
    (media_id, frame_index, frame binary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_index": [], "frame": []}
            for mid, content in zip(pdf["media_id"], pdf[content_col]):
                w, h, payload = _decode_one(bytes(content))
                for i in range(0, len(payload), every_n_bytes):
                    rows["media_id"].append(int(mid))
                    rows["frame_index"].append(i // every_n_bytes)
                    rows["frame"].append(
                        make_fake_media(w, h, payload[i : i + every_n_bytes])
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", content_col).mapInPandas(
        run, schema="media_id long, frame_index int, frame binary"
    )


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents fixture
    (the driver provides no binary table): payload = utf-8 text, sized
    header from doc stats. Exercises the full binary-column path."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(
            F.lit(FAKE_MAGIC),
            # big-endian uint32 width/height derived from doc_id/n_chars
            F.unhex(F.lpad(F.hex(F.pmod(F.col("doc_id"), 1024) + 16), 8, "0")),
            F.unhex(F.lpad(F.hex(F.pmod(F.col("n_chars"), 768) + 16), 8, "0")),
            F.encode("text", "UTF-8"),
        ).alias("content"),
    )


# --- query registry entry (rows-only: binary plumbing, no SQL oracle) -------

def q_media_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encode -> Arrow-UDF decode roundtrip, oracle-checked.

    Spark builds the binary container (concat/hex/unhex) and parses it
    back with the mapInPandas decoder; the DuckDB oracle re-derives
    width/height/payload size ARITHMETICALLY from the documents fixture
    (doc_id % 1024 + 16, n_chars % 768 + 16, octet_length(text)) — two
    independent paths that only agree if the struct packing, byte
    offsets, and Arrow binary handling are all correct.
    """
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    return (
        decode_media(media)
        .select("media_id", "width", "height", "n_bytes")
        .orderBy("media_id")
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal path, oracle-checked with exact integers.

    synthesize binary media → Arrow-UDF decode → byte-histogram features
    → per-width-bucket aggregates. The L1-normalized float features are
    multiplied back by the content length and rounded to recover the
    RAW NIBBLE COUNTS (exact: |float32 relative error| · total_bytes ≪
    0.5), so every output column is an integer the DuckDB oracle
    re-derives arithmetically — header bytes from (doc_id, n_chars)
    arithmetic, text bytes from regexp character-class counts (the
    corpus is ASCII, so char == byte). No float-rounding parity risk.
    """
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    decoded = decode_media(media)
    feats = extract_features(media)
    total_bytes = F.col("n_bytes") + F.lit(12)  # payload + FAKE header

    def nibble_count(k: int):
        return F.round(F.col("embedding")[k] * total_bytes, 0).cast("long")

    return (
        decoded.join(feats, "media_id")
        .groupBy((F.col("width") % 8).alias("width_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("sum_bytes"),
            F.sum(nibble_count(0)).alias("feat0_bytes"),
            F.sum(nibble_count(4)).alias("feat4_bytes"),
            F.sum(nibble_count(6)).alias("feat6_bytes"),
        )
        .orderBy("width_bucket")
    )


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing, oracle-checked with exact integers.

    synthesize binary media -> Arrow-UDF frame sampler (64-byte strides)
    -> per-media frame manifest. Every output column is an integer the
    DuckDB oracle re-derives ARITHMETICALLY from the documents fixture:
    n_frames = ceil(len/64), total frame bytes = 12*n_frames + len
    (each emitted frame re-wraps its slice in the 12-byte FAKE header),
    frame_index_sum = n*(n-1)/2 — so slicing offsets, header packing,
    and the mapInPandas fan-out are all pinned, not just row counts.
    """
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    frames = sample_frames(media, every_n_bytes=64)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.octet_length("frame")).alias("frame_bytes"),
            F.sum("frame_index").alias("frame_index_sum"),
        )
        .orderBy("media_id")
    )
