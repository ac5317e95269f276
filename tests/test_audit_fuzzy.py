"""Round-4 platform-QA operators: FK integrity audit, single-scan
column profiler, inverted-index build, and the SymSpell deletion-variant
fuzzy join.

All north-star additions (no reference counterpart — the reference has
no cross-table checks, no index materialization, and only whole-message
shingle dedup; SURVEY.md §2.9). Each test recomputes semantics
independently in Python on explicit fixtures so a Spark-plan regression
can't hide behind an oracle sharing the bug.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.fuzzy import (
    fuzzy_match_report,
    fuzzy_pairs,
)
from bigdataminingproject_spark.operators.retrieval import (
    build_inverted_index,
)
from bigdataminingproject_spark.plans.audit import (
    fk_audit,
    fk_orphan_stats,
    profile_table,
)


# ---------------------------------------------------------------- integrity


def test_fk_orphan_stats_counts_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,)], "k: int"
    ).select(F.col("k").alias("fk"))
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk: int")
    row = fk_orphan_stats(child, "fk", parent, "pk", "child.fk->parent.pk").collect()[0]
    assert row.child_rows == 5
    assert row.null_keys == 1
    assert row.orphan_rows == 1  # the 99
    assert row.ok is False


def test_fk_orphan_stats_duplicate_parent_keys_do_not_inflate(spark):
    # parent side is distinct-projected, so dup parent rows must not
    # multiply child rows through the join
    child = spark.createDataFrame([(1,), (1,)], "fk: int")
    parent = spark.createDataFrame([(1,), (1,), (1,)], "pk: int")
    row = fk_orphan_stats(child, "fk", parent, "pk", "e").collect()[0]
    assert row.child_rows == 2
    assert row.orphan_rows == 0
    assert row.ok is True


def test_fk_audit_star_schema_clean(spark, sf_dir):
    rows = fk_audit(spark, sf_dir).collect()
    assert len(rows) == 7
    assert all(r.ok for r in rows)
    assert [r.edge for r in rows] == sorted(r.edge for r in rows)


# ----------------------------------------------------------------- profiler


def test_profile_table_exact_stats(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, "b"), (3, None), (10, "aa")],
        "id: long, s: string",
    )
    out = {r.col_name: r for r in profile_table(df).collect()}
    assert out["id"].n_rows == 4
    assert out["id"].n_nonnull == 4
    assert out["id"].n_distinct == 4
    assert out["id"].min_val == "1"
    assert out["id"].max_val == "10"  # native-type min/max, not lexical
    # lengths: 1,1,1,2 -> 5/4 = 1.25
    assert out["id"].avg_len == 1.25
    assert out["s"].n_nonnull == 3
    assert out["s"].n_distinct == 2
    assert out["s"].min_val == "aa"
    assert out["s"].max_val == "b"
    # lengths over non-nulls: 2,1,2 -> 5/3 = 1.6667 (half-up 4dp)
    assert out["s"].avg_len == pytest.approx(1.6667)


def test_profile_table_single_scan(spark):
    # the whole profile must come from ONE pass over the input: exactly
    # one scan node in the optimized plan
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("b")
    )
    plan = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1


# ----------------------------------------------------------- inverted index


def test_inverted_index_postings_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta"),
            (2, "alpha gamma"),
            (3, "beta beta beta alpha"),
            (4, "delta"),
        ],
        "doc_id: long, text: string",
    )
    out = {
        r.token: r
        for r in build_inverted_index(docs, min_df=2, top_postings=2).collect()
    }
    # delta has df=1 -> cut by min_df
    assert set(out) == {"alpha", "beta"}
    assert out["alpha"].df == 3
    assert out["alpha"].cf == 3
    # ties on tf=1 break by doc_id asc; top_postings=2 truncates
    assert out["alpha"].postings == "1:1,2:1"
    assert out["beta"].df == 2
    assert out["beta"].cf == 5
    # tf desc first: doc 3 (tf=3) before doc 1 (tf=2)
    assert out["beta"].postings == "3:3,1:2"


def test_inverted_index_orders_by_df(spark, sf_dir):
    from bigdataminingproject_spark.sources.tables import load_table

    rows = build_inverted_index(load_table(spark, sf_dir, "documents")).collect()
    dfs = [r.df for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    assert all(len(r.postings.split(",")) <= 5 for r in rows)


# -------------------------------------------------------------- fuzzy join


def test_fuzzy_pairs_finds_all_edit_kinds(spark):
    terms = spark.createDataFrame(
        [
            ("spark",),
            ("spork",),  # substitution
            ("sparks",),  # insertion
            ("park",),  # deletion (prefix char)
            ("walk",),  # far away
            ("sposrks",),  # lev 2 from sparks -> excluded
        ],
        "term: string",
    )
    pairs = {
        (r.term_a, r.term_b) for r in fuzzy_pairs(terms).collect()
    }
    assert ("spark", "spork") in pairs
    assert ("spark", "sparks") in pairs
    assert ("park", "spark") in pairs
    assert not any("walk" in p for p in pairs)
    assert not any("sposrks" in p for p in pairs)


def test_fuzzy_pairs_exact_distance_one_only(spark):
    # "abcd" vs "abef": shares no deletion variant AND lev 2 — absent.
    # "ab" vs "ba" (transposition, lev 2): del of ab -> {ab,b,a}; ba ->
    # {ba,a,b} -> shared variants 'a','b', so it IS a blocking
    # candidate — but via DIFFERENT deletion positions (ab deletes pos
    # 2 to make 'a', ba deletes pos 1), so the positional verify must
    # drop it.
    terms = spark.createDataFrame(
        [("abcd",), ("abef",), ("ab",), ("ba",)], "term: string"
    )
    pairs = fuzzy_pairs(terms).collect()
    assert pairs == []


def test_fuzzy_pairs_positional_verify_matches_levenshtein(spark):
    # cross-verify the position arithmetic against the textbook
    # definition on a vocabulary dense in near-neighbors (includes
    # repeated-char cases where multiple deletions coincide)
    vocab = [
        "aaa", "aab", "aba", "baa", "ab", "ba", "abc", "abcd", "acbd",
        "aabc", "abca", "cabd", "abd", "bbcd", "abcde", "xabcd",
    ]
    terms = spark.createDataFrame([(t,) for t in vocab], "term: string")
    got = {(r.term_a, r.term_b) for r in fuzzy_pairs(terms).collect()}

    def lev(s, t):
        if len(s) < len(t):
            s, t = t, s
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    want = set()
    for i, a in enumerate(vocab):
        for b in vocab[i + 1:]:
            x, y = sorted((a, b))
            if lev(x, y) == 1:
                want.add((x, y))
    assert got == want


def test_fuzzy_match_report_counts_and_nearest(spark):
    terms = spark.createDataFrame(
        [("cat",), ("bat",), ("rat",), ("cart",)], "term: string"
    )
    out = {r.term: r for r in fuzzy_match_report(terms).collect()}
    # cat ~ bat, rat (subs), cart (insertion) -> 3 matches
    assert out["cat"].n_matches == 3
    assert out["cat"].nearest == "bat"
    assert out["bat"].n_matches == 2  # cat, rat
    assert out["cart"].n_matches == 1
    assert out["cart"].nearest == "cat"


def test_fuzzy_pairs_no_cartesian_in_plan(spark):
    # the blocking join must be an equi-join on the variant key; a
    # cartesian/broadcast-nested-loop candidate step would be the
    # quadratic wrong plan at scale
    terms = spark.createDataFrame([("cat",), ("bat",)], "term: string")
    plan = fuzzy_pairs(terms)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_inverted_index_single_token_exchange(spark):
    # the window's token partitioning must be reused by the final
    # aggregate: exactly two hash exchanges total — (token, doc_id)
    # for the tf agg and token for window+agg — plus the presentation
    # range sort
    import re

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha")], "doc_id: long, text: string"
    )
    plan = (
        build_inverted_index(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    hashes = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    token_only = [h for h in hashes if "token" in h and "doc_id" not in h]
    token_doc = [h for h in hashes if "token" in h and "doc_id" in h]
    assert len(set(token_only)) <= 1 and len(token_only) == 1
    assert len(token_doc) == 1


def test_incremental_index_merge_equals_full_rebuild(spark):
    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.retrieval import (
        finish_inverted_index,
        inverted_index_partial,
        merge_inverted_index,
    )

    # delta doc 10 has tf=4 for beta -> must displace a snapshot doc
    # from the merged head; gamma exists only in the delta
    docs = spark.createDataFrame(
        [
            (1, "beta beta"),
            (2, "beta alpha"),
            (3, "beta beta beta alpha"),
            (10, "beta beta beta beta gamma"),
            (11, "gamma alpha"),
        ],
        "doc_id: long, text: string",
    )
    from bigdataminingproject_spark.operators.retrieval import (
        build_inverted_index,
    )

    full = {
        r.token: r
        for r in build_inverted_index(docs, min_df=1, top_postings=2).collect()
    }
    snap = inverted_index_partial(
        docs.filter(F.col("doc_id") < 10), top_postings=2
    )
    delta = inverted_index_partial(
        docs.filter(F.col("doc_id") >= 10), top_postings=2
    )
    merged = {
        r.token: r
        for r in finish_inverted_index(
            merge_inverted_index(snap, delta, top_postings=2), min_df=1
        ).collect()
    }
    assert set(merged) == set(full)
    for t in full:
        assert merged[t].df == full[t].df, t
        assert merged[t].cf == full[t].cf, t
        assert merged[t].postings == full[t].postings, t
    # and the displacement actually happened: beta's head leads with
    # the delta doc
    assert full["beta"].postings.startswith("10:4")


def test_fuzzy_pairs_single_char_terms(spark):
    # "a" vs "b": both delete to the empty string at position 1 ->
    # substitution detected through the empty-variant bucket
    terms = spark.createDataFrame([("a",), ("b",)], "term: string")
    assert [(r.term_a, r.term_b) for r in fuzzy_pairs(terms).collect()] == [
        ("a", "b")
    ]
    # and empty input yields empty output, no crash
    empty = spark.createDataFrame([], "term: string")
    assert fuzzy_pairs(empty).count() == 0
