"""Unit tests for operators/quality.py on constructed fixtures (the
registry queries are oracle-checked separately; these pin the operator
semantics on inputs with known answers)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.quality import (
    decontaminate,
    doc_shingles,
    pii_redact,
    repetition_signals,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


class TestRepetitionSignals:
    def test_unique_tokens_doc(self, spark):
        out = repetition_signals(_docs(spark, ["alpha beta gamma delta"]))
        r = out.collect()[0]
        assert r.n_tokens == 4
        assert r.distinct_bp == 10000  # all distinct
        assert r.top_unigram_bp == 2500  # 1/4
        assert r.top_bigram_bp == 3333  # 1/3 bigrams, all unique

    def test_fully_repeated_doc(self, spark):
        out = repetition_signals(_docs(spark, ["spam spam spam spam"]))
        r = out.collect()[0]
        assert r.distinct_bp == 2500  # 1 distinct / 4 tokens
        assert r.top_unigram_bp == 10000
        assert r.top_bigram_bp == 10000  # "spam spam" x3

    def test_single_token_doc_has_null_bigram(self, spark):
        r = repetition_signals(_docs(spark, ["lonely"])).collect()[0]
        assert r.n_tokens == 1
        assert r.top_bigram_bp is None

    def test_tokenization_is_engine_standard(self, spark):
        # non-letter runs split; case folded — same rule as tokenize()
        r = repetition_signals(_docs(spark, ["Foo-BAR!! foo?bar"])).collect()[0]
        assert r.n_tokens == 4
        assert r.distinct_bp == 5000  # {foo, bar} / 4


class TestPiiRedact:
    def test_patterns_redacted_and_counted(self, spark):
        df = _docs(
            spark,
            [
                "mail a.user@site.org now tel +1-555-0199 host 10.1.0.200 end",
                "no pii here at all",
            ],
        )
        out = {r.doc_id: r for r in pii_redact(df).collect()}
        assert out[0].n_email == 1
        assert out[0].n_phone == 1
        assert out[0].n_ip == 1
        assert (
            out[0].text_redacted
            == "mail <EMAIL> now tel <PHONE> host <IP> end"
        )
        assert out[1].n_email == out[1].n_phone == out[1].n_ip == 0
        assert out[1].text_redacted == "no pii here at all"

    def test_multiple_matches_counted(self, spark):
        df = _docs(spark, ["a@b.com c@d.net +1-555-0000 +1-555-9999"])
        r = pii_redact(df).collect()[0]
        assert r.n_email == 2 and r.n_phone == 2

    def test_no_shuffle_in_plan(self, spark):
        df = pii_redact(_docs(spark, ["x"]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure projection


class TestDecontaminate:
    def test_shared_shingle_flags_doc(self, spark):
        bench = _docs(spark, ["the quick brown fox jumps over the lazy dog"])
        docs = spark.createDataFrame(
            [
                Row(doc_id=10, text="prefix quick brown fox jumps suffix"),
                Row(doc_id=11, text="totally different words entirely here"),
            ]
        )
        flags = {
            r.doc_id: r.contaminated
            for r in decontaminate(docs, bench, k=4).collect()
        }
        assert flags == {10: 1, 11: 0}

    def test_short_docs_never_match(self, spark):
        bench = _docs(spark, ["one two three four five"])
        docs = spark.createDataFrame([Row(doc_id=5, text="one two three")])
        assert decontaminate(docs, bench, k=4).collect()[0].contaminated == 0

    def test_doc_shingles_distinct_and_ordered_words(self, spark):
        df = _docs(spark, ["a b c a b c a b"])
        shs = {r.sh for r in doc_shingles(df, k=3).collect()}
        assert shs == {"a b c", "b c a", "c a b"}

    def test_benchmark_side_is_broadcast(self, spark):
        bench = _docs(spark, ["w x y z w x y z"])
        docs = _docs(spark, ["w x y z q r s t"])
        plan = (
            decontaminate(docs, bench, k=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestStreamingTwin:
    def test_pii_redaction_streams_identically(self, spark, sf_dir, tmp_path):
        """The quality family is pure projection, so the SAME function
        body runs unchanged on a streaming DataFrame — batch/stream
        unification the reference's imperative loop cannot offer."""
        from bigdataminingproject_spark.sources.tables import load_table
        from bigdataminingproject_spark.streaming.replay import (
            file_replay_source,
        )

        docs = load_table(spark, sf_dir, "documents").limit(40)
        batch = {
            r.doc_id: (r.n_email, r.text_redacted)
            for r in pii_redact(
                docs.select(
                    "doc_id",
                    F.concat(
                        F.col("text"), F.lit(" ping x@y.org")
                    ).alias("text"),
                )
            ).collect()
        }

        stream = file_replay_source(
            spark, docs, str(tmp_path / "stage"), chunks=4
        )
        redacted = pii_redact(
            stream.select(
                "doc_id",
                F.concat(F.col("text"), F.lit(" ping x@y.org")).alias("text"),
            )
        )
        q = (
            redacted.writeStream.format("memory")
            .queryName("pii_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.doc_id: (r.n_email, r.text_redacted)
            for r in spark.sql("SELECT * FROM pii_stream").collect()
        }
        assert got == batch
        assert all(v[0] == 1 for v in got.values())


def test_unigram_nll_orders_surprisal(spark):
    """Rare-token docs must score higher nll than common-token docs."""
    from bigdataminingproject_spark.operators.quality import unigram_logprob

    rows = [(i, "src", "common words appear here") for i in range(9)]
    rows.append((9, "src", "zyzzyva quokka axolotl tarsier"))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {r["doc_id"]: r["nll"] for r in unigram_logprob(docs).collect()}
    assert out[9] > out[0]
    # identical docs score identically
    assert len({out[i] for i in range(9)}) == 1


def test_winnow_shared_run_shares_fingerprint(spark):
    """Winnowing guarantee: two docs sharing a run of >= w+k-1 tokens
    (7 here) share at least one fingerprint; disjoint docs share none."""
    from bigdataminingproject_spark.operators.quality import (
        winnow_fingerprints,
    )
    from bigdataminingproject_spark.functions.text import (
        shingles,
        tokenize,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    shared = "one two three four five six seven"
    rows = [
        (1, "s", f"prefix alpha {shared} beta suffix tail"),
        (2, "s", f"totally other start {shared} closing words"),
        (3, "s", "completely disjoint vocabulary nothing matching at all"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    # recompute the distinct fingerprint SETS via the same internals
    grams = docs.select(
        "doc_id", F.posexplode(shingles(tokenize(F.col("text")), 3))
        .alias("pos0", "gram")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    h = F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10).cast("bigint")
    hashed = grams.select("doc_id", "pos", h.alias("h"))
    frame = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 4)
    fps = (
        hashed.withColumn(
            "n", F.max("pos").over(W.partitionBy("doc_id"))
        )
        .withColumn("m", F.min("h").over(frame))
        .filter(F.col("pos") <= F.col("n") - 4)
        .select("doc_id", "m")
        .distinct()
        .collect()
    )
    sets: dict[int, set] = {}
    for r in fps:
        sets.setdefault(r["doc_id"], set()).add(r["m"])
    assert sets[1] & sets[2], "shared 7-token run must share a fingerprint"
    assert not (sets[1] & sets[3])
    # and the manifest agrees with the recomputed sets
    man = {r["doc_id"]: r["n_fingerprints"]
           for r in winnow_fingerprints(docs).collect()}
    assert man == {d: len(s) for d, s in sets.items()}


def test_source_contamination_matrix_exact(spark):
    """Hand-checked overlap: sources A and B share exactly one
    3-shingle; C shares nothing. Jaccard_bp = 10000*1/(2+2-1)."""
    from bigdataminingproject_spark.operators.quality import (
        source_contamination_matrix,
    )

    rows = [
        (1, "A", "one two three four"),      # shingles {1-2-3, 2-3-4}
        (2, "B", "zero one two three"),      # {0-1-2, 1-2-3}
        (3, "C", "five six seven eight"),    # disjoint
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {
        (r["source_a"], r["source_b"]): (r["shared_shingles"], r["jaccard_bp"])
        for r in source_contamination_matrix(docs).collect()
    }
    assert out == {("A", "B"): (1, 3333)}


def test_source_contamination_fanout_bounded_by_sources(spark):
    """A shingle present in MANY docs of the same source pair must fan
    out once per source pair, not per doc pair (the dedup-first design):
    shared count stays 1 regardless of replication."""
    from bigdataminingproject_spark.operators.quality import (
        source_contamination_matrix,
    )

    rows = [(i, "A", "common text here now") for i in range(50)]
    rows += [(100 + i, "B", "common text here now") for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = source_contamination_matrix(docs).collect()
    assert len(out) == 1
    assert out[0]["jaccard_bp"] == 10000  # identical sets


def test_new_ops_edge_cases_empty_and_short_docs(spark):
    """Degenerate corpora must not crash or mis-count: empty text,
    sub-k-token docs, unicode tokens."""
    from bigdataminingproject_spark.operators.frequency import tfidf_topk
    from bigdataminingproject_spark.operators.quality import (
        source_contamination_matrix,
        unigram_logprob,
        winnow_fingerprints,
    )
    from bigdataminingproject_spark.operators.sampling import (
        doc_shards,
        domain_cap,
        token_budget_sample,
    )

    rows = [
        (1, "a", ""),                       # empty
        (2, "a", "solo"),                   # single token
        (3, "a", "two tokens"),             # < k for 3-shingles
        (4, "b", "héllo wörld naïve café"),  # unicode letters
        (5, "b", "one two three four five six seven eight"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    # tokenize is \p{L}-based: unicode letters survive as tokens
    tf = tfidf_topk(docs, k=2).collect()
    assert {r["doc_id"] for r in tf} == {2, 3, 4, 5}  # doc 1 has no tokens
    assert any(r["token"] == "héllo" for r in tf)

    nll = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert 1 not in nll and nll[2]["n_tokens"] == 1

    # winnowing needs >= w+k-1 = 7 tokens for a full window: only doc 5
    wf = winnow_fingerprints(docs).collect()
    assert [r["doc_id"] for r in wf] == [5]

    # empty docs still count for caps/shards (0 tokens, length 0)
    assert domain_cap(docs, cap=10).count() == 5
    sh = doc_shards(docs, n_shards=4).collect()
    assert sum(r["n_docs"] for r in sh) == 5
    # budget smaller than every doc's token count -> only 0-token and
    # within-budget docs survive the cumsum filter
    tb = token_budget_sample(docs, budget=2).collect()
    assert all(r["cum_tokens"] <= 2 for r in tb)

    # contamination matrix: sources share nothing at 3-gram level except
    # possibly none at all -> must not error on empty shingle sets
    assert source_contamination_matrix(docs).count() == 0


def test_winnow_pairs_detects_partial_clone(spark):
    """A copied 8-token run inside otherwise-different docs must be a
    clone candidate; boilerplate fingerprints above max_df are dropped."""
    from bigdataminingproject_spark.operators.quality import winnow_pairs

    run = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "s", f"first document opening words {run} first closing"),
        (2, "s", f"second totally different intro {run} second ending"),
        (3, "s", "unrelated content with no copied paragraph present"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = winnow_pairs(docs, min_shared=1).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
    # with max_df=1 every shared fingerprint is "boilerplate": no pairs
    assert winnow_pairs(docs, min_shared=1, max_df=1).count() == 0


def test_bigram_logprob_matches_python_recompute(spark):
    """Exact recompute of the interpolated bigram LM on a 4-doc corpus
    (one doc has a single token and must be excluded: no transitions)."""
    import math
    from collections import Counter

    from bigdataminingproject_spark.operators.quality import bigram_logprob

    texts = {
        1: "the cat sat on the mat",
        2: "the cat ran",
        3: "mat the cat",
        4: "solo",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    toks = {i: t.split() for i, t in texts.items()}
    uni = Counter(w for ws in toks.values() for w in ws)
    total = sum(uni.values())
    big = Counter(
        (ws[j], ws[j + 1])
        for ws in toks.values()
        for j in range(len(ws) - 1)
    )

    def nll(ws):
        s = sum(
            math.log(
                0.7 * big[(ws[j], ws[j + 1])] / uni[ws[j]]
                + 0.3 * uni[ws[j + 1]] / total
            )
            for j in range(len(ws) - 1)
        )
        return round(-s / (len(ws) - 1), 4)

    got = {
        r["doc_id"]: (r["n_tokens"], r["bigram_nll"])
        for r in bigram_logprob(docs).collect()
    }
    assert set(got) == {1, 2, 3}  # doc 4 has no transitions
    for d in (1, 2, 3):
        assert got[d] == (len(toks[d]), nll(toks[d])), d


def test_bigram_nll_flags_word_salad(spark):
    """Docs made of common words in never-seen transitions must score
    worse than docs repeating common transitions."""
    from bigdataminingproject_spark.operators.quality import bigram_logprob

    fluent = "the cat sat on the mat and the cat sat on the mat again"
    rows = [(i, fluent) for i in range(8)]
    # word salad: same vocabulary, shuffled transitions
    rows.append((99, "mat the on sat cat the again and mat on the"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["bigram_nll"] for r in bigram_logprob(docs).collect()}
    assert out[99] > out[0]


def test_gopher_gate_rules_fire_individually(spark):
    """Each rule kills exactly its violator; a normal doc passes."""
    from bigdataminingproject_spark.operators.quality import gopher_gate

    good = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "through the quiet field while birds watch from tall trees"
    )
    rows = [
        (0, good, "s"),                              # passes all rules
        (1, "short text here", "s"),                  # R1: < 10 tokens
        (2, "the " + "word " * 30, "s"),              # R4: top unigram mass
        (3, " ".join("xz" for _ in range(40)), "s"),  # R3+R6: 1 distinct, no stopwords
        # R2: twelve distinct 14-char words -> mean token length 14 > 10
        (4, " ".join("pneumonoultram"[:13] + chr(97 + i) for i in range(12)), "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {r["doc_id"]: r for r in gopher_gate(docs).collect()}
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["n_tokens"] < 10
    assert out[2]["keep"] is False and out[2]["top_unigram_bp"] > 3000
    assert out[3]["keep"] is False
    assert out[3]["distinct_bp"] < 2000 or out[3]["n_stopword_hits"] < 2
    assert out[4]["keep"] is False
    assert out[4]["sum_token_chars"] > 10 * out[4]["n_tokens"]
