"""AppendOnlyPartsStore: LSM binary-counter compaction (VERDICT r6 #3).

The store's contract: the read() union is always exactly the appended
rows; the live part count is O(log batches) instead of O(batches); a
protected base dir joins reads but is never merged or deleted.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.streaming.statestore import (
    AppendOnlyPartsStore,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="statestore_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("doc_id"))


def test_read_is_exact_union_across_merges(spark, root):
    store = AppendOnlyPartsStore(spark, root, "m", merge_fanout=2)
    for i in range(10):
        store.append(_batch(spark, i * 5, i * 5 + 5))
    got = sorted(r.doc_id for r in store.read().collect())
    assert got == list(range(50))
    assert store.merges > 0  # compaction actually ran


def test_part_count_is_logarithmic(spark, root):
    store = AppendOnlyPartsStore(spark, root, "m", merge_fanout=2)
    n_batches = 16
    for i in range(n_batches):
        store.append(_batch(spark, i, i + 1))
    # base-2 counter: part count == popcount(16) == 1, worst case
    # log2(B)+1 — far below the un-compacted 16
    assert store.n_parts <= int(math.log2(n_batches)) + 1
    # every row was rewritten at most log2(B) times
    assert store.rows_rewritten <= n_batches * int(math.log2(n_batches))


def test_fanout_4_counter(spark, root):
    store = AppendOnlyPartsStore(spark, root, "m", merge_fanout=4)
    for i in range(16):  # 16 = 100 in base 4 -> single level-2 part
        store.append(_batch(spark, i, i + 1))
    assert store.n_parts == 1
    assert sorted(r.doc_id for r in store.read().collect()) == list(
        range(16)
    )


def test_protected_base_never_touched(spark, root):
    base_dir = os.path.join(root, "owned_elsewhere")
    _batch(spark, 1000, 1100).write.parquet(base_dir)
    store = AppendOnlyPartsStore(spark, root, "m", merge_fanout=2)
    store.attach_protected(base_dir)
    for i in range(8):
        store.append(_batch(spark, i, i + 1))
    assert os.path.isdir(base_dir)  # never deleted by compaction
    got = sorted(r.doc_id for r in store.read().collect())
    assert got == list(range(8)) + list(range(1000, 1100))


def test_derive_sees_exact_delta_rows(spark, root):
    store = AppendOnlyPartsStore(spark, root, "m", merge_fanout=2)
    side = AppendOnlyPartsStore(spark, root, "idx", merge_fanout=2)
    seen = []
    for i in range(6):
        store.append(
            _batch(spark, i * 10, i * 10 + 3),
            derive=lambda part: (
                seen.append(sorted(r.doc_id for r in part.collect())),
                side.append(part.select((F.col("doc_id") * 2).alias("k"))),
            ),
        )
    assert seen == [[i * 10, i * 10 + 1, i * 10 + 2] for i in range(6)]
    got = sorted(r.k for r in side.read().collect())
    assert got == sorted(i * 10 * 2 + d * 2 for i in range(6) for d in range(3))


def test_empty_store_reads_none(spark, root):
    store = AppendOnlyPartsStore(spark, root, "m")
    assert store.read() is None
    with pytest.raises(ValueError):
        AppendOnlyPartsStore(spark, root, "m", merge_fanout=1)


def test_merge_transform_folds_at_compaction(spark, root):
    """Merge-operator mode: compaction FOLDS partial aggregates, so a
    merged part's row count tracks key cardinality, not batch count —
    and the fold-of-read equals the fold of all appended rows."""
    fold = lambda df: df.groupBy("k").agg(  # noqa: E731
        F.sum("v").cast("long").alias("v")
    )
    store = AppendOnlyPartsStore(
        spark, root, "m", merge_fanout=2, merge_transform=fold
    )
    for i in range(8):
        store.append(
            spark.createDataFrame(
                [(j, 1) for j in range(4)], "k int, v int"
            )
        )
    # 8 level-0 appends of 4 rows each -> one level-3 part of 4 rows
    assert store.n_parts == 1
    assert store.parts[0][2] == 4  # folded, not 32 stacked rows
    got = {r.k: r.v for r in fold(store.read()).collect()}
    assert got == {j: 8 for j in range(4)}


def test_fold_index_partials_equals_pairwise_merge(spark):
    """The n-ary fold must agree with repeated merge_inverted_index —
    and with the single-shot build — on a corpus split three ways."""
    from bigdataminingproject_spark.operators.retrieval import (
        finish_inverted_index,
        fold_index_partials,
        inverted_index_partial,
        merge_inverted_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "beta gamma gamma delta"),
            (3, "alpha alpha beta epsilon"),
            (4, "gamma delta epsilon epsilon"),
            (5, "alpha beta gamma delta epsilon"),
            (6, "beta beta beta alpha"),
        ],
        "doc_id long, text string",
    )
    parts = [
        inverted_index_partial(docs.filter(F.col("doc_id") % 3 == i))
        for i in range(3)
    ]
    stacked = parts[0].unionByName(parts[1]).unionByName(parts[2])
    via_fold = finish_inverted_index(
        fold_index_partials(stacked), min_df=1
    ).collect()
    via_pairwise = finish_inverted_index(
        merge_inverted_index(
            merge_inverted_index(parts[0], parts[1]), parts[2]
        ),
        min_df=1,
    ).collect()
    via_full = finish_inverted_index(
        inverted_index_partial(docs), min_df=1
    ).collect()
    assert [tuple(r) for r in via_fold] == [tuple(r) for r in via_pairwise]
    assert [tuple(r) for r in via_fold] == [tuple(r) for r in via_full]
