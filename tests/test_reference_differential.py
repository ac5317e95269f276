"""Differential parity against the ACTUAL reference implementation.

Every other parity check in this repo compares against semantics
derived by reading the reference (SURVEY.md) or against DuckDB SQL.
This module closes the loop: it imports the reference's own
dependency-free detector layer (`streaming/` — CountMinSketch, Bloom,
DGIM, the three detectors; the nltk/sklearn-bound data loader is NOT
needed) from /root/reference, drives it with the same preprocessed
message stream our Spark pipeline consumes, and asserts the summary
fields the SURVEY declared exact-parity are EQUAL:

- processed / excluded counts
- the duplicates block (total, rate, avg_score) — our exact
  check-then-insert dedup vs the reference's Bloom path (identical on
  this fixture: no Bloom false positives fire, which is deterministic
  for a fixed corpus and seed)
- per-snapshot message_count / duplicates_so_far / top_10_tokens — our
  exact cumulative counts vs the reference's CMS estimates (identical
  here: the fixture vocabulary is far below the CMS width, so no
  counter collisions; also deterministic for the fixed seed)
- final frequency estimates for a query list

The burst block is deliberately OUT of scope: the reference reports
per-CMS-column DGIM bins with reservoir representatives (a different
output domain than exact per-token windows); that surface is covered
by the dedicated parity mode + golden DGIM tests
(tests/test_streaming_burst.py), per the SURVEY §2 W2-W4 decision.

Reference drive loop mirrors run_detectors.py:159-224 (the public CLI
semantics), via the reference's public API only.
"""

from __future__ import annotations

import os
import sys

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "streaming")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def corpus() -> list[str]:
    """~110 preprocessed messages built as a token-frequency STAIRCASE:
    message i carries the prefix w01..w0k (k cycling 1..15) plus a
    unique alphabetic marker, so every top-10 token has a strictly
    distinct cumulative count at every snapshot boundary (the two
    engines order equal counts differently — reference: insertion
    order; ours: deterministic tiebreak — so ties would compare dict
    MEMBERSHIP, not semantics). Messages with k >= 8 are near-dups of
    their earlier same-k twin (prefix shingles repeat; only the two
    marker-bearing shingles are fresh), giving a healthy duplicate mix
    both engines must flag identically."""
    # strictly alphabetic staircase words (digits would be
    # loader-dropped in real preprocessed text)
    words = ["w" + chr(97 + j) * 2 for j in range(15)]

    def marker(i: int) -> str:
        return "mk" + chr(97 + i % 26) + chr(97 + (i // 26) % 26)

    msgs = []
    for i in range(110):
        k = 1 + (i % 15)
        msgs.append(" ".join(words[:k] + [marker(i)]))
    return msgs


def _run_reference(corpus, update_interval, freq_queries, exclude):
    sys.path.insert(0, REF)
    try:
        from streaming.streaming_pipeline import StreamingPipeline
        from streaming.utils.token_handler import (
            split_preprocessed_tokens,
        )

        pipe = StreamingPipeline()
        processed = excluded = dup_count = 0
        score_sum = 0.0
        snapshots = []
        recent: set[str] = set()
        for text in corpus:
            out = pipe.process_message(text)
            dup = out.get("duplicate") or {}
            is_dup = dup.get("is_duplicate", False)
            if exclude and is_dup:
                excluded += 1
                continue
            if is_dup:
                dup_count += 1
            score_sum += float(dup.get("duplicate_score", 0.0))
            recent.update(split_preprocessed_tokens(text))
            processed += 1
            if processed % update_interval == 0:
                pipe.frequency_detector.periodic_update(recent)
                snapshots.append(
                    {
                        "message_count": processed,
                        "top_10_tokens": (
                            pipe.frequency_detector.get_frequency_analysis(
                                top_n=10
                            )
                        ),
                        "duplicates_so_far": dup_count,
                    }
                )
                recent.clear()
        if recent:
            pipe.frequency_detector.periodic_update(recent)
        return {
            "processed": processed,
            "excluded": excluded,
            "duplicates": {
                "total": dup_count,
                "rate": (dup_count / processed) if processed else 0.0,
                "avg_score": (score_sum / processed) if processed else 0.0,
            },
            "snapshots": snapshots,
            "frequency_estimates": (
                pipe.frequency_detector.estimate_batch(freq_queries)
            ),
            "final_top": pipe.frequency_detector.get_frequency_analysis(
                top_n=10
            ),
        }
    finally:
        sys.path.remove(REF)
        # drop the reference modules so they can't shadow anything later
        for mod in [m for m in sys.modules if m.startswith("streaming")]:
            del sys.modules[mod]


def _run_ours(spark, corpus, update_interval, freq_queries, exclude):
    from bigdataminingproject_spark.plans.pipeline import (
        run_detector_pipeline,
    )

    stream = spark.createDataFrame(
        list(enumerate(corpus)), "stream_pos long, body string"
    )
    return run_detector_pipeline(
        stream,
        update_interval=update_interval,
        top_frequency=10,
        freq_queries=freq_queries,
        exclude_duplicates=exclude,
    )


def test_summary_matches_reference_engine(spark, corpus):
    queries = ["waa", "wll", "mkba", "absent"]
    ref = _run_reference(corpus, 50, queries, exclude=False)
    ours = _run_ours(spark, corpus, 50, queries, exclude=False)

    assert ours["processed"] == ref["processed"]
    assert ours["duplicates"]["total"] == ref["duplicates"]["total"]
    assert ours["duplicates"]["rate"] == pytest.approx(
        ref["duplicates"]["rate"]
    )
    # our per-message score carries the oracle-attested 4dp half-up
    # quantization (q_dup_scores); the reference keeps the raw ratio —
    # the averages agree within half a quantum
    assert ours["duplicates"]["avg_score"] == pytest.approx(
        ref["duplicates"]["avg_score"], abs=5e-5
    )
    assert ours["frequency_estimates"] == ref["frequency_estimates"]

    # our pipeline emits one EXTRA trailing snapshot for the final
    # partial bucket (a documented improvement — the reference leaves
    # the tail only in final_top_tokens); every shared boundary must
    # match exactly
    assert len(ours["periodic_snapshots"]) == len(ref["snapshots"]) + 1
    for got, exp in zip(ours["periodic_snapshots"], ref["snapshots"]):
        assert got["message_count"] == exp["message_count"]
        assert got["duplicates_so_far"] == exp["duplicates_so_far"]
        assert got["top_10_tokens"] == exp["top_10_tokens"]
    tail = ours["periodic_snapshots"][-1]
    assert tail["message_count"] == ref["processed"]
    assert ours["final_top_tokens"] == ref["final_top"]


def test_exclude_mode_counts_match_reference(spark, corpus):
    """Exclusion bookkeeping (processed/excluded totals) matches the
    reference CLI loop. Token-count comparisons are scoped OUT here by
    design: after an exclusion the reference's CMS has already
    absorbed the duplicate's tokens (observe-before-exclude,
    run_detectors.py:161-170) while our pipeline analyzes kept
    messages only — a documented semantic divergence where ours is the
    conservative choice (excluded text contributes nothing
    downstream)."""
    ref = _run_reference(corpus, 50, [], exclude=True)
    ours = _run_ours(spark, corpus, 50, [], exclude=True)
    assert ours["processed"] == ref["processed"]
    assert ours["excluded_duplicates"] == ref["excluded"]


def test_burst_parity_mode_matches_reference_detector(spark, tmp_path):
    """End-of-stream spike sets from our per-token DGIM parity operator
    equal the reference BurstDetector's per-CMS-column output, deduped
    by representative token. Scoped to the regime where the two are
    EXACTLY comparable: a fixture vocabulary with no CMS column
    collisions (asserted below via the reference's own hash) and every
    spiking token's occurrences inside the DGIM-exact window (no
    bucket merges: at most TWO ones per token in the window, so both
    implementations hold singleton buckets and their deliberately
    different merged-bucket estimators — ours subtracts half the
    oldest counted bucket, the reference adds half the straddler —
    never engage; that divergence is covered by the golden DGIM
    tests)."""
    sys.path.insert(0, REF)
    try:
        from streaming.detectors.burst_detector import BurstDetector

        msgs = []
        for i in range(1, 61):
            body = "steady filler"
            if i > 58:
                body += " spikea"     # 2 hits in the last 2 positions
            if i in (52, 56):
                body += " calm"       # 2 spread hits, still merge-free
            msgs.append(body)

        det = BurstDetector(window_size=50)
        # collision-free fixture precondition (deterministic for the
        # fixed seed): no two vocabulary tokens share any CMS column
        # ("calm" chosen over e.g. "spikeb", whose columns collide
        #  with "steady" under the fixed seed)
        vocab = ["steady", "filler", "spikea", "calm"]
        cols = {
            t: {det.cms._hash(t, r) % det.cms.width
                for r in range(det.cms.depth)}
            for t in vocab
        }
        for a in vocab:
            for b in vocab:
                if a < b:
                    assert not (cols[a] & cols[b]), "fixture collision"
        for m in msgs:
            det.observe_message(m)
        ref_map = {}
        for row in det.detect_spikes():
            rep = row["representative"]
            ref_map[rep] = (row["recent_count"], row["prev_count"])

        from bigdataminingproject_spark.streaming.pipeline import (
            run_to_memory,
            streaming_burst_parity,
        )
        from bigdataminingproject_spark.streaming.replay import (
            file_replay_source,
        )

        df = spark.createDataFrame(
            list(enumerate(msgs, start=1)), "stream_pos long, body string"
        )
        stream = file_replay_source(
            spark,
            df,
            str(tmp_path / "diffburst"),
            chunks=4,
            files_per_trigger=1,
            order_col="stream_pos",
        )
        out = streaming_burst_parity(stream, window=50)
        run_to_memory(out, "diff_burst_parity", output_mode="append")
        ours = {
            r["token"]: (r["recent_count"], r["prev_count"])
            for r in spark.table("diff_burst_parity").collect()
            if r["boundary"] == 60
        }
        assert ours == ref_map
        assert ours["spikea"] == (2, 0)
        assert ours["calm"] == (2, 0)
    finally:
        sys.path.remove(REF)
        for mod in [m for m in sys.modules if m.startswith("streaming")]:
            del sys.modules[mod]


# ---------------------------------------------------------------------------
# Loader-layer differential (VERDICT r5 #7): drive the reference's
# data_loader/ walk + filters + boilerplate scrub (scc_dataset_loader.py
# process_data / remove_file_description, base_dataset_loader.py
# preprocess_messages) against sources/conversations.py on one fixture
# corpus. The reference module imports nltk AT IMPORT TIME (and
# downloads corpora), so when nltk is absent a minimal import stub is
# installed — and the driven sub-steps are exactly the ones whose code
# paths never touch nltk: an identity-preprocessing subclass isolates
# the os.walk recursion, the medium anti-filter, the inbound filter,
# the empty-body filter, the file-description scrub, and the
# raw_body-after-scrub convention. Full tokenize/lemmatize/stopword
# parity stays behind the real-nltk gate (test_loader_full_preprocess_
# parity below + the golden-file lemmatizer tests).


@pytest.fixture(scope="module")
def ref_loader_cls():
    import importlib
    import types

    # make sure OUR nltk-gated module resolved its real gate first, so
    # the stub below can never flip _HAVE_NLTK
    import bigdataminingproject_spark.functions.nlp  # noqa: F401

    stubbed = []
    try:
        import nltk  # noqa: F401
    except ImportError:
        fake = types.ModuleType("nltk")
        fake.download = lambda *a, **k: None
        fake.word_tokenize = lambda s: s.split()
        corpus_mod = types.ModuleType("nltk.corpus")

        class _SW:
            @staticmethod
            def words(_lang):
                return []

        corpus_mod.stopwords = _SW
        fake.corpus = corpus_mod
        stem_mod = types.ModuleType("nltk.stem")

        class _Lem:
            def lemmatize(self, t):
                return t

        stem_mod.WordNetLemmatizer = _Lem
        fake.stem = stem_mod
        for name, mod in [
            ("nltk", fake),
            ("nltk.corpus", corpus_mod),
            ("nltk.stem", stem_mod),
        ]:
            sys.modules[name] = mod
            stubbed.append(name)
    try:
        import sklearn  # noqa: F401
    except ImportError:
        # data_loader/__init__.py pulls in dataloader.py, which imports
        # sklearn's train_test_split — never executed by these tests
        sk = types.ModuleType("sklearn")
        ms = types.ModuleType("sklearn.model_selection")

        def _tts(*a, **k):  # pragma: no cover - never called
            raise RuntimeError("sklearn stub: not driven by these tests")

        ms.train_test_split = _tts
        sk.model_selection = ms
        for name, mod in [("sklearn", sk), ("sklearn.model_selection", ms)]:
            sys.modules[name] = mod
            stubbed.append(name)
    sys.path.insert(0, REF)
    try:
        scc = importlib.import_module("data_loader.scc_dataset_loader")
        yield scc.SCCDatasetLoader
    finally:
        sys.path.remove(REF)
        for name in list(sys.modules):
            if name == "data_loader" or name.startswith("data_loader."):
                del sys.modules[name]
        for name in stubbed:
            del sys.modules[name]


@pytest.fixture(scope="module")
def loader_corpus(tmp_path_factory):
    """train/test conversation dirs exercising every loader edge:
    nested subdirs (walk recursion), a Telegram conversation (medium
    anti-filter drops the whole conversation), outbound messages
    (inbound filter), empty/None bodies, file-description boilerplate,
    and a non-json file that must be ignored."""
    import json as _json

    root = tmp_path_factory.mktemp("ref_loader_corpus")
    train = root / "train"
    test = root / "test"
    (train / "nested").mkdir(parents=True)
    test.mkdir()

    def conv(msgs):
        return {"messages": msgs}

    def m(body, t, medium="Email", inbound=True):
        return {
            "body": body,
            "time": t,
            "medium": medium,
            "is_inbound": inbound,
        }

    boiler = (
        "This message contains files. If the description for a file "
        "does not make sense, ignore it."
        "Here are descriptions of those files:\nDescription for file 1:"
        " a cat photo"
    )
    (train / "a.json").write_text(
        _json.dumps(
            conv(
                [
                    m("hello there friend", 1),
                    m("wire the funds now", 2),
                    m("thanks", 3, inbound=False),  # outbound: dropped
                    m("", 4),  # empty: dropped
                    m(None, 5),  # null: dropped
                ]
            )
        )
    )
    (train / "nested" / "b.json").write_text(
        _json.dumps(
            conv(
                [
                    m(boiler, 10),
                    m("Description for file 2: another doc attached", 11),
                ]
            )
        )
    )
    # whole conversation dropped: contains a Telegram message
    (train / "c.json").write_text(
        _json.dumps(
            conv([m("secret chat", 20, medium="Telegram"), m("x", 21)])
        )
    )
    (train / "notes.txt").write_text("not a conversation")
    (test / "d.json").write_text(
        _json.dumps(conv([m("send the gift cards", 30)]))
    )
    return root


def _ref_raw_splits(ref_loader_cls, loader_corpus, tmp_path):
    """Run the REFERENCE loader with identity body-preprocessing (the
    non-nltk sub-steps only) and return its split dict."""
    import os as _os

    class _RawLoader(ref_loader_cls):
        def preprocess_message_bodies(self, bodies):
            return list(bodies)  # identity: isolate walk/filter/scrub

    cwd = _os.getcwd()
    _os.chdir(tmp_path)  # the loader mkdirs ./data_loading_cache
    try:
        loader = _RawLoader(
            data_dir=str(loader_corpus),
            train_data_dir="train",
            test_data_dir="test",
        )
        return loader.process_data()
    finally:
        _os.chdir(cwd)


def test_loader_walk_filter_scrub_parity(
    spark, ref_loader_cls, loader_corpus, tmp_path
):
    """The reference loader's kept-message structure — which
    conversations survive the medium anti-filter, which messages the
    inbound/empty filters keep, what the file-description scrub leaves
    in body, and raw_body == post-scrub body — must match
    sources/conversations.py message-for-message."""
    from bigdataminingproject_spark.sources.conversations import (
        filter_conversations,
        messages_table,
        read_conversation_dir,
    )

    data = _ref_raw_splits(ref_loader_cls, loader_corpus, tmp_path)
    ref_msgs = {}
    for split in ("train", "test"):
        for c in data[split]:
            # key by (split, sorted message times) — file paths aren't
            # carried by the reference conversation dict
            key = (split, tuple(m["time"] for m in c["messages"]))
            ref_msgs[key] = [
                (m["raw_body"], m["body"], m["medium"]) for m in c["messages"]
            ]

    ours = {}
    for split in ("train", "test"):
        conv = read_conversation_dir(
            spark, str(loader_corpus / split), split=split
        )
        msg = messages_table(filter_conversations(conv))
        rows = msg.orderBy("conv_id", "msg_index").collect()
        by_conv = {}
        for r in rows:
            by_conv.setdefault(r["conv_id"], []).append(r)
        for rs in by_conv.values():
            key = (split, tuple(r["time"] for r in rs))
            # our raw_body IS the scrubbed body (reference convention:
            # raw_body is set after remove_file_description)
            ours[key] = [(r["raw_body"], r["raw_body"], r["medium"]) for r in rs]

    assert set(ref_msgs) == set(ours)
    for key in ref_msgs:
        ref_list = [(raw, med) for raw, _b, med in ref_msgs[key]]
        our_list = [(raw, med) for raw, _b, med in ours[key]]
        assert ref_list == our_list, key
    # scenario sanity: the Telegram conversation is gone on both sides,
    # and the boilerplate scrub actually fired
    assert all(len(k[1]) != 2 or k[0] != "train" or 20 not in k[1]
               for k in ref_msgs)
    scrubbed = [
        raw
        for msgs in ref_msgs.values()
        for raw, _b, _m in msgs
        if "cat photo" in raw
    ]
    assert scrubbed and all(
        "Description for file" not in raw and "contains files" not in raw
        for raw in scrubbed
    )


@pytest.mark.skipif(
    "nltk" not in sys.modules
    and not __import__("importlib").util.find_spec("nltk"),
    reason="nltk absent: full tokenize/lemmatize/stopword loader parity "
    "is env-gated (COVERAGE.md); non-nltk sub-steps covered above",
)
def test_loader_full_preprocess_parity(
    spark, ref_loader_cls, loader_corpus, tmp_path
):
    """With real nltk present: the reference loader's fully preprocessed
    bodies (word_tokenize -> isalpha -> WordNet lemmatize -> SKIPWORDS)
    must equal our messages_table body + nlp.lemmatize chain on the
    same corpus."""
    import os as _os

    from pyspark.sql import functions as F

    from bigdataminingproject_spark.functions.nlp import lemmatize
    from bigdataminingproject_spark.functions.text import tokenize
    from bigdataminingproject_spark.sources.conversations import (
        filter_conversations,
        messages_table,
        read_conversation_dir,
    )

    cwd = _os.getcwd()
    _os.chdir(tmp_path)
    try:
        loader = ref_loader_cls(
            data_dir=str(loader_corpus),
            train_data_dir="train",
            test_data_dir="test",
        )
        data = loader.process_data()
    finally:
        _os.chdir(cwd)
    ref_bodies = {
        (split, m["time"]): m["body"]
        for split in ("train", "test")
        for c in data[split]
        for m in c["messages"]
    }
    ours = {}
    for split in ("train", "test"):
        conv = read_conversation_dir(
            spark, str(loader_corpus / split), split=split
        )
        msg = messages_table(filter_conversations(conv))
        # reference order: tokenize -> alpha -> lemmatize -> stopwords;
        # our preprocess_expr defers lemmatization, so rebuild the exact
        # chain from raw_body for the parity check
        from bigdataminingproject_spark.functions.text import (
            SKIPWORDS as _SKIP,
        )
        from bigdataminingproject_spark.functions.text import alpha_tokens

        stop_arr = F.array(*[F.lit(w) for w in sorted(_SKIP)])
        toks = lemmatize(alpha_tokens(tokenize(F.col("raw_body"))))
        body = F.array_join(
            F.filter(toks, lambda t: ~F.array_contains(stop_arr, t)), " "
        )
        for r in msg.withColumn("pbody", body).collect():
            ours[(split, r["time"])] = r["pbody"]
    assert ref_bodies == ours
