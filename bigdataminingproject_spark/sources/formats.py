"""Multi-format corpus IO: parquet / CSV / JSON-lines read and write
with explicit schemas, partitioned layout, and compression (north-star
source/sink breadth — the reference reads a recursive JSON dir scan and
caches parquet, both covered in ``conversations.py``; this module is
the general-format surface a standalone engine needs).

Scale rules encoded here:

- **Never infer schemas at scale.** ``read_corpus`` requires an
  explicit schema for CSV/JSON: inference is a full extra pass over
  100 TB before the real job starts, and a sampled inference can
  silently mistype sparse columns. Parquet carries its own schema.
- **Partitioned layout is the unit of pruning.** ``partition_by``
  writes hive-style directories (``source=src0/...``) so downstream
  filters on the partition column prune entire directories at
  planning time (verified by the partition-pruning test).
- **Bound file sizes, not file counts.** ``max_records_per_file``
  caps row groups so a skewed partition cannot produce a single
  unsplittable multi-GB file; small-file compaction is
  ``df.repartition(n)`` before the write, deliberately left to the
  caller who knows the target layout.
- **Nested types don't fit flat formats.** CSV writes reject
  array/map/struct columns up front with a clear error instead of
  Spark's late executor-side failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "csv", "json")

# Lossless-at-scale defaults: splittable compression everywhere.
_DEFAULT_COMPRESSION = {
    "parquet": "snappy",
    "csv": "gzip",
    "json": "gzip",
}


def _check_format(fmt: str) -> str:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    return fmt


def write_corpus(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
    max_records_per_file: int = 0,
) -> None:
    """Write ``df`` to ``path`` in the given format."""
    _check_format(fmt)
    if fmt == "csv":
        nested = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if nested:
            raise ValueError(
                f"CSV cannot represent nested columns {nested}; "
                "use parquet or json"
            )
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w = w.option(
        "compression", compression or _DEFAULT_COMPRESSION[fmt]
    )
    if fmt == "csv":
        # header row so the file is self-describing for humans; the
        # read path still demands an explicit schema.
        w = w.option("header", True)
    getattr(w, fmt)(path)


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read a corpus written by ``write_corpus``. CSV/JSON require an
    explicit schema (see module docstring); parquet uses its own."""
    _check_format(fmt)
    r = spark.read
    if fmt == "parquet":
        return r.parquet(path)
    if schema is None:
        raise ValueError(
            f"{fmt} reads require an explicit schema at scale "
            "(inference costs a full extra pass and can mistype "
            "sparse columns)"
        )
    r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", True)
    return getattr(r, fmt)(path)
