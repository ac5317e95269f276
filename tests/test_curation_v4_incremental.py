"""Incremental v4 curation == batch v4 (VERDICT r6 #2).

Simulates an id-ordered crawl: the train corpus is split into a day-0
snapshot plus three deltas, each processed ONCE through
``curation_v4_delta_signals`` / ``semantic_candidates`` against the
accumulated indices, then ``assemble_curation_v4`` publishes the final
manifest — which must equal ``curate_corpus_v4`` over the whole corpus
row for row (the induction the streaming maintenance query rides; this
test isolates the algebra from the streaming machinery).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.quality import (
    synthetic_pii_text,
)
from bigdataminingproject_spark.operators.similarity import (
    semantic_candidates,
    semantic_cells16,
    semantic_dedup,
    semantic_drops_from_candidates,
)
from bigdataminingproject_spark.plans.curation import (
    assemble_curation_v4,
    curate_corpus_v4,
    curation_v4_delta_signals,
)
from bigdataminingproject_spark.sources.tables import load_table


def _chunks(ids, n):
    qs = [ids[round(i * len(ids) / n)] for i in range(1, n)]
    bounds = [float("-inf")] + qs + [float("inf")]
    return list(zip(bounds[:-1], bounds[1:]))


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)
    vecs = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 25 != 0
    )
    return docs, bench, train, vecs


def test_incremental_v4_equals_batch(spark, corpus):
    _docs, bench, train, vecs = corpus
    expected = curate_corpus_v4(
        train, bench, vecs, redact_text=synthetic_pii_text()
    ).collect()

    ids = sorted(r.doc_id for r in train.select("doc_id").collect())
    # in-memory index "stores": accumulated unions, checkpointed per
    # delta so each batch's plans are cut from history's
    acc: dict[str, object] = {}

    def _append(key, df):
        part = df.localCheckpoint(eager=True)
        acc[key] = (
            part if key not in acc else acc[key].unionByName(part)
        )

    for lo, hi in _chunks(ids, 4):
        batch = train.filter(
            (F.col("doc_id") > F.lit(lo)) & (F.col("doc_id") <= F.lit(hi))
        ).localCheckpoint(eager=True)
        sigs = curation_v4_delta_signals(
            batch,
            bench,
            redact_text=synthetic_pii_text(),
            span_seen=acc.get("span_h"),
        )
        for key in ("stats", "tok_counts", "winnow_fp", "span_stats"):
            _append(key, sigs[key])
        _append("span_h", sigs["span_kept_hashes"])
        # vectors "arrive with" their docs
        delta_cells = semantic_cells16(
            vecs.join(
                batch.select(F.col("doc_id").alias("vec_id")),
                "vec_id",
                "left_semi",
            )
        ).localCheckpoint(eager=True)
        prior = acc.get("cells")
        allc = (
            delta_cells
            if prior is None
            else prior.unionByName(delta_cells)
        )
        _append(
            "cands",
            semantic_candidates(allc, delta_cells, allc.count()),
        )
        acc["cells"] = allc

    sem_drops = semantic_drops_from_candidates(
        acc["cands"], acc["cells"].count()
    )
    # the arrival-time decisions must equal the batch operator's alone
    assert sorted(
        (r.dup_id, r.rep_id, r.cosine_sim) for r in sem_drops.collect()
    ) == sorted(
        (r.dup_id, r.rep_id, r.cosine_sim)
        for r in semantic_dedup(vecs).collect()
    )

    got = assemble_curation_v4(
        acc["stats"],
        acc["tok_counts"],
        acc["winnow_fp"],
        sem_drops,
        acc["span_stats"],
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in expected]
