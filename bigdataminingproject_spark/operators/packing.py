"""Sequence packing: lay a shuffled corpus end-to-end into fixed-token
training sequences (north-star training-pipeline operator; no reference
counterpart — the reference stops at per-message analytics).

Two deterministic building blocks compose into "concatenate-and-chunk"
packing, the standard LLM pretraining layout:

1. A **deterministic global shuffle**: order docs by the md5-derived
   uniform variate of their id (``sampling.hash_uniform``). Like the
   stratified sampler, the permutation is a pure function of the data —
   identical on any cluster, any partition layout, any retry — which is
   what makes training runs reproducible.
2. An **exclusive global running token count** in that order
   (``plans.ordering.with_global_cumsum`` — two-phase quantile-bucketed
   cumsum, no single-partition window), from which each doc's sequence
   is just ``tokens_before // capacity``: the sequence its first token
   lands in.

Everything is exact integer arithmetic over a deterministic order, so a
DuckDB window-cumsum oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.functions.text import tokenize
from bigdataminingproject_spark.operators.sampling import hash_uniform
from bigdataminingproject_spark.plans.ordering import with_global_cumsum
from bigdataminingproject_spark.sources.tables import load_table

SEQ_CAPACITY = 2048


def pack_sequences(
    docs: DataFrame,
    capacity: int = SEQ_CAPACITY,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc packing assignment: (doc_id, n_tokens, cum_before,
    seq_id) where ``seq_id`` is the 0-based training sequence the doc's
    first token falls into under hash-shuffled concatenate-and-chunk."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(F.col(text_col))).alias("n_tokens"),
        hash_uniform(F.col(id_col)).alias("_u"),
    )
    cum = with_global_cumsum(
        base, "n_tokens", "_u", tiebreakers=[F.col("doc_id").asc()]
    )
    return cum.withColumn(
        "seq_id", F.floor(F.col("cum_before") / F.lit(capacity)).cast("long")
    ).drop("_u")


def sequence_summary(
    docs: DataFrame,
    capacity: int = SEQ_CAPACITY,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-sequence report: docs starting in each sequence, their total
    tokens, and an id checksum attesting exact membership (the same
    membership-not-just-counts trick as ``sampling.sample_summary``)."""
    packed = pack_sequences(docs, capacity, text_col, id_col)
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("doc_id").alias("doc_id_checksum"),
        )
        .orderBy("seq_id")
    )


LENGTH_BUCKET_EDGES = (16, 24, 32, 48, 64, 96, 128)


def length_buckets(
    docs: DataFrame,
    edges: tuple[int, ...] = LENGTH_BUCKET_EDGES,
    text_col: str = "text",
) -> DataFrame:
    """Context-length histogram: docs and token mass per length bucket
    (bucket = smallest edge ≥ n_tokens; the overflow bucket is -1).
    Drives packing-capacity and padding-waste decisions before a
    training run. One scan + one tiny-key shuffle; the bucket ladder is
    an explicit CASE chain, so both engines bucket identically (no
    float log2 at bucket boundaries)."""
    from bigdataminingproject_spark.functions.text import tokenize

    n = F.size(tokenize(F.col(text_col)))
    bucket = F.lit(-1)
    for e in sorted(edges, reverse=True):
        bucket = F.when(n <= e, F.lit(e)).otherwise(bucket)
    return (
        docs.select(bucket.alias("bucket"), n.alias("_nt"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
        )
        .orderBy("bucket")
    )


CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
    id_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """Split each document into overlapping fixed-token chunks (the RAG
    / embedding-index chunker: stride < chunk_size keeps a context
    overlap so no span is cut at a hard boundary).

    Chunk *i* covers tokens ``[i*stride, i*stride + chunk_size)``;
    chunks start while ``i*stride < n_tokens`` (so a doc's tail is
    always covered and a non-empty doc yields >= 1 chunk). Empty docs
    yield no rows.

    Plan: tokenize -> ``F.sequence`` over the chunk index range ->
    ``posexplode`` -> ``F.slice`` — a pure per-row projection, ZERO
    shuffles, fanout bounded by n_tokens/stride per doc. At 100 TB this
    is the shape you want feeding an embedding model: map-only,
    whole-stage codegen, output partitioning inherited from the scan.
    """
    toks = tokenize(F.col(text_col))
    n_chunks = F.when(
        F.size(toks) > 0,
        (F.size(toks) + F.lit(stride - 1)) / F.lit(stride),
    ).otherwise(F.lit(0)).cast("int")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.sequence(F.lit(0), n_chunks - 1).alias("_idx"),
    ).filter(F.size("_toks") > 0)
    chunk_toks = F.slice(
        F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_size
    )
    out = base.select(
        "doc_id", "_toks", F.explode("_idx").alias("chunk_idx")
    ).select(
        "doc_id",
        "chunk_idx",
        F.size(chunk_toks).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk_toks).alias("chunk_text"),
    )
    # ordered=False: streaming-safe / 100 TB shape (no presentation sort)
    return out.orderBy("doc_id", "chunk_idx") if ordered else out


# --- query registry entry ---------------------------------------------------

def q_doc_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram of the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return length_buckets(docs)


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token / stride-24 RAG chunks of every document."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs)


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the documents corpus into 2048-token sequences in
    deterministic hash-shuffled order; DuckDB recomputes the identical
    permutation and running sums."""
    docs = load_table(spark, sf_dir, "documents")
    return sequence_summary(docs, capacity=SEQ_CAPACITY)
