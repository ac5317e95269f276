"""BPE tokenizer merge-training as an iterative relational loop.

``q_doc_bpe_pairs`` (operators/textstats.py) computes the statistic the
FIRST merge of byte-pair-encoding training maximizes; this module runs
the actual training loop (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): repeatedly merge the
globally most frequent adjacent symbol pair, re-count, repeat.

Reference scope: the reference engine has no tokenizer-training surface
(SURVEY.md §2.9) — this is north-star LLM-data-pipeline infrastructure,
the step that turns a curated corpus into a trained subword vocabulary.

Scale design (the part that matters at 100 TB):

* The corpus contributes exactly ONE scan — a hash-aggregated
  ``(word, count)`` vocabulary (map-side combine). Every merge round
  runs on the vocabulary-sized relation (millions of rows at web scale,
  ~10^4 here), never on the corpus.
* A word's symbol sequence is encoded as a DOUBLE-delimited string
  ``§§a§§b§§c§§`` so applying a merge is a single built-in ``replace``
  (whole-stage codegen, no Python): the pattern ``§x§§y§`` -> ``§xy§``
  is anchored on full symbols by the delimiters, and both Spark's and
  DuckDB's ``replace`` scan left-to-right non-overlapping — exactly
  BPE's merge semantics (``aaa`` + merge(a,a) -> ``[aa, a]``). The
  delimiter is DOUBLED between symbols so back-to-back occurrences
  don't share pattern text: each match consumes one ``§`` of each
  neighboring pair, leaving the other for the next match — with single
  delimiters ``aaaa`` would mis-merge to ``[aa, a, a]`` instead of
  ``[aa, aa]`` (caught by tests/test_bpe.py).
* Pair counting explodes adjacent symbol pairs of each DISTINCT word
  (weighted by corpus frequency) into a hash aggregation; the global
  argmax is an ``orderBy().limit(1)`` on the pair relation — a bounded
  total-order over |vocab|·avg_len rows, NOT over the corpus.
* The winning pair (one row) is broadcast back onto the vocabulary via
  a left join on TRUE, so an exhausted pair table (every word a single
  symbol) degrades to a no-op round instead of annihilating the state.
* Each round's state is ``localCheckpoint``-ed — the iterative-lineage
  rule (memory: spark-graft-conventions): without the cut, round k
  re-plans rounds 1..k-1 and planning grows exponentially.

A production tokenizer run (32k merges) would batch mutually
non-overlapping merges per round to amortize the per-round job; the
per-round plan here is already that job's shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.sources.tables import load_table

# Symbol delimiter. Vocabulary is restricted to ^[a-z]+$ (tokenize()
# already lowercases and strips non-letters; the explicit filter also
# drops non-ASCII letters) so the delimiter can never collide with
# symbol content on either engine.
SEP = "§"  # '§'


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    from bigdataminingproject_spark.functions.text import tokenize

    return (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over ``docs[text_col]``.

    Returns one row per merge round: ``(merge_round, x, y, pair_count)``
    where ``(x, y)`` is the adjacent symbol pair merged that round and
    ``pair_count`` its corpus-weighted frequency at merge time. Ties
    break deterministically on ``(x, y)`` ascending, matching the SQL
    oracle's ORDER BY.
    """
    words = _word_counts(docs, text_col)
    # '§§' + regexp_replace(word, '(.)', '$1§§'): 'abc' -> '§§a§§b§§c§§'
    state = words.select(
        F.concat(
            F.lit(SEP + SEP),
            F.regexp_replace("word", "(.)", f"$1{SEP}{SEP}"),
        ).alias("syms"),
        "cnt",
    ).localCheckpoint()

    merges: list[DataFrame] = []
    for rnd in range(1, n_merges + 1):
        # size(l) >= 2: Spark's sequence(1, 0) DESCENDS instead of
        # returning empty, so fully-merged words must be filtered out
        # before the pair transform.
        toks = state.select(
            F.split(
                F.expr(f"trim(BOTH '{SEP}' FROM syms)"), SEP + SEP
            ).alias("l"),
            "cnt",
        ).filter(F.size("l") >= 2)
        pairs = (
            toks.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(l) - 1),"
                        " i -> struct(l[i-1] AS x, l[i] AS y))"
                    )
                ).alias("p"),
                "cnt",
            )
            .select("p.x", "p.y", "cnt")
            .groupBy("x", "y")
            .agg(F.sum("cnt").cast("long").alias("pair_count"))
        )
        best = (
            pairs.orderBy(F.desc("pair_count"), "x", "y")
            .limit(1)
            .withColumn("merge_round", F.lit(rnd).cast("long"))
            .localCheckpoint()  # one action per round: BPE's global argmax
        )
        merges.append(best)
        state = (
            state.join(F.broadcast(best.select("x", "y")), F.lit(True), "left")
            .select(
                F.when(F.col("x").isNull(), F.col("syms"))
                .otherwise(
                    F.replace(
                        F.col("syms"),
                        F.concat(
                            F.lit(SEP), "x", F.lit(SEP + SEP), "y", F.lit(SEP)
                        ),
                        F.concat(F.lit(SEP), "x", "y", F.lit(SEP)),
                    )
                )
                .alias("syms"),
                "cnt",
            )
            .localCheckpoint()
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.select("merge_round", "x", "y", "pair_count").orderBy(
        "merge_round"
    )


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list: per-document subword counts.

    Re-encodes the DISTINCT vocabulary with every merge applied in
    training order (the merge list is tiny — collect is bounded by
    ``n_merges`` rows), then joins the segmented vocabulary back to the
    corpus token stream. Output: ``(doc_id, n_tokens, n_subwords)``.
    """
    from bigdataminingproject_spark.functions.text import tokenize

    merge_rows = [
        (r["x"], r["y"])
        for r in merges.orderBy("merge_round").collect()  # n_merges rows
    ]
    tokens = docs.select(
        "doc_id", F.explode(tokenize(F.col(text_col))).alias("word")
    ).filter(F.col("word").rlike("^[a-z]+$"))
    vocab = tokens.select("word").distinct()
    syms = F.concat(
        F.lit(SEP + SEP), F.regexp_replace("word", "(.)", f"$1{SEP}{SEP}")
    )
    for x, y in merge_rows:
        syms = F.replace(
            syms,
            F.lit(f"{SEP}{x}{SEP}{SEP}{y}{SEP}"),
            F.lit(f"{SEP}{x}{y}{SEP}"),
        )
    seg = vocab.withColumn("syms", syms).select(
        "word",
        F.size(
            F.split(F.expr(f"trim(BOTH '{SEP}' FROM syms)"), SEP + SEP)
        ).alias("n_sub"),
    )
    return (
        tokens.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
        .orderBy("doc_id")
    )


def _oracle_merge_ctes(n_merges: int) -> str:
    """The shared unrolled merge-round CTE chain (p_k, b_k, s_k)."""
    parts = []
    for r in range(1, n_merges + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"""
        p{r} AS (
            SELECT l[CAST(i AS INT)] AS x, l[CAST(i AS INT) + 1] AS y,
                   CAST(sum(cnt) AS BIGINT) AS pair_count
            FROM (SELECT string_split(trim(syms, '§'), '§§') AS l, cnt
                  FROM {prev}),
                 unnest(range(1, len(l))) AS t(i)
            GROUP BY 1, 2
        ),
        b{r} AS (
            SELECT CAST({r} AS BIGINT) AS merge_round, x, y, pair_count
            FROM p{r} ORDER BY pair_count DESC, x, y LIMIT 1
        ),
        s{r} AS (
            SELECT s.word,
                   CASE WHEN b.x IS NULL THEN s.syms
                        ELSE replace(s.syms,
                                     '§' || b.x || '§§' || b.y || '§',
                                     '§' || b.x || b.y || '§')
                   END AS syms,
                   s.cnt
            FROM {prev} s LEFT JOIN b{r} b ON TRUE
        )"""
        )
    return ",".join(parts)


def bpe_train_oracle_sql(toks_cte: str, n_merges: int = 8) -> str:
    """DuckDB twin of :func:`bpe_train`: the same delimiter-string
    encoding, the same left-to-right non-overlapping ``replace`` merge,
    unrolled to ``n_merges`` CTE stages (the MMR/unrolled-greedy oracle
    pattern). ``toks_cte`` is the registry's shared tokenizer CTE
    (must define ``tok_base(doc_id, raw_toks)``)."""
    unions = " UNION ALL ".join(
        f"SELECT * FROM b{r}" for r in range(1, n_merges + 1)
    )
    return f"""
        WITH {toks_cte},
        bpe_words AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(raw_toks) AS word FROM tok_base)
            WHERE regexp_matches(word, '^[a-z]+$')
            GROUP BY word
        ),
        s0 AS (
            SELECT word,
                   '§§' || regexp_replace(word, '(.)', '\\1§§', 'g') AS syms,
                   cnt
            FROM bpe_words
        ),{_oracle_merge_ctes(n_merges)}
        SELECT merge_round, x, y, pair_count FROM ({unions})
        ORDER BY merge_round
    """


def bpe_segment_oracle_sql(toks_cte: str, n_merges: int = 8) -> str:
    """DuckDB twin of :func:`bpe_segment` over the trained merges: the
    final merge state ``s{n}`` already holds each word's segmented
    symbol string, so per-doc subword counts are one vocabulary join."""
    return f"""
        WITH {toks_cte},
        bpe_words AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(raw_toks) AS word FROM tok_base)
            WHERE regexp_matches(word, '^[a-z]+$')
            GROUP BY word
        ),
        s0 AS (
            SELECT word,
                   '§§' || regexp_replace(word, '(.)', '\\1§§', 'g') AS syms,
                   cnt
            FROM bpe_words
        ),{_oracle_merge_ctes(n_merges)},
        seg AS (
            SELECT word,
                   CAST(len(string_split(trim(syms, '§'), '§§')) AS INT)
                       AS n_sub
            FROM s{n_merges}
        ),
        doc_toks AS (
            SELECT doc_id, word
            FROM (SELECT doc_id, unnest(raw_toks) AS word FROM tok_base)
            WHERE regexp_matches(word, '^[a-z]+$')
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(n_sub) AS BIGINT) AS n_subwords
        FROM doc_toks JOIN seg USING (word)
        GROUP BY doc_id
        ORDER BY doc_id
    """


def q_doc_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merges learned from the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=8)


def q_doc_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document subword counts under the 8-merge BPE vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=8)
    return bpe_segment(docs, merges)
