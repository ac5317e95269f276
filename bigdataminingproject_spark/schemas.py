"""Explicit schemas for every input the engine reads.

The reference loads JSON with *no* schema (dynamic dicts,
``data_loader/scc_dataset_loader.py:35-37``). We declare StructTypes up
front: fail-fast on shape drift, and Catalyst gets column pruning +
predicate pushdown into the scan for free (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Conversation corpus (reference-native input; SURVEY.md §1.1) ----------
# One JSON file per conversation: {"messages": [{body, time, medium,
# is_inbound}, ...]} (data_loader/scc_dataset_loader.py:46-50). `time` is any
# orderable numeric — we standardize on epoch-like LongType with TimestampType
# upcast at the edge; missing time sorts last (run_detectors.py:29).
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("body", T.StringType(), True),
        T.StructField("time", T.LongType(), True),
        T.StructField("medium", T.StringType(), True),
        T.StructField("is_inbound", T.BooleanType(), True),
    ]
)

CONVERSATION_SCHEMA = T.StructType(
    [
        T.StructField("messages", T.ArrayType(MESSAGE_SCHEMA), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("dataset", T.StringType(), True),
    ]
)

# Normalized messages relation (conversations exploded; loader adds
# raw_body — the pre-preprocessing copy, base_dataset_loader.py:69-75).
MESSAGES_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("msg_index", T.IntegerType(), False),
        T.StructField("body", T.StringType(), True),
        T.StructField("raw_body", T.StringType(), True),
        T.StructField("time", T.LongType(), True),
        T.StructField("medium", T.StringType(), True),
        T.StructField("is_inbound", T.BooleanType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("dataset", T.StringType(), True),
        T.StructField("split", T.StringType(), True),
    ]
)

# --- Driver synthetic tables (/root/testdata; FIXTURES.md §B) ---------------
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# --- Multimodal columns (north-star; opaque binary + typed metadata) --------
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque payload
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
