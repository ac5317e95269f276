"""Multi-format IO: roundtrip fidelity, schema discipline, partition
pruning, and the nested-type boundary."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.sources.formats import (
    read_corpus,
    write_corpus,
)
from bigdataminingproject_spark.sources.tables import load_table

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip_preserves_rows_and_schema(spark, docs, tmp_path, fmt):
    path = str(tmp_path / f"corpus_{fmt}")
    write_corpus(docs, path, fmt)
    back = read_corpus(spark, path, fmt, schema=DOC_SCHEMA)
    assert back.schema == docs.schema
    a = sorted(docs.collect(), key=lambda r: r.doc_id)
    b = sorted(back.collect(), key=lambda r: r.doc_id)
    assert a == b


def test_csv_rejects_nested_columns(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="nested"):
        write_corpus(emb, str(tmp_path / "x"), "csv")


def test_json_roundtrips_arrays(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    path = str(tmp_path / "emb_json")
    write_corpus(emb, path, "json")
    back = read_corpus(
        spark, path, "json",
        schema="vec_id long, embedding array<float>, label int",
    )
    assert back.count() == 50
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    for r in back.collect():
        assert r.embedding == pytest.approx(orig[r.vec_id])


def test_schema_required_for_flat_formats(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_corpus(spark, str(tmp_path), "csv")


def test_partitioned_write_prunes_directories(spark, docs, tmp_path):
    path = str(tmp_path / "parted")
    write_corpus(docs, path, "parquet", partition_by=["source"])
    # hive-style layout on disk
    assert glob.glob(f"{path}/source=src0")
    back = read_corpus(spark, path, "parquet")
    q = back.filter(F.col("source") == "src3")
    # partition filter prunes at planning time: only one dir scanned
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(source" in plan.replace("#", "")[:100000]
    expected = docs.filter(F.col("source") == "src3").count()
    assert q.count() == expected


def test_max_records_per_file_bounds_files(spark, docs, tmp_path):
    path = str(tmp_path / "bounded")
    write_corpus(
        docs.repartition(1), path, "parquet", max_records_per_file=100
    )
    n_docs = docs.count()
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) >= n_docs // 100  # 500 rows / 100 → ≥5 files
