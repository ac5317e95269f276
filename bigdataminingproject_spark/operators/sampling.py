"""Deterministic corpus sampling / data-mixing operators (north-star).

Training-data pipelines mix sources with per-source rates ("sample 10%
of web, 100% of books"). Doing that with ``DataFrame.sample`` ties the
result to partition layout and RNG state; at 100 TB reproducibility
matters more than true randomness. These operators derive a uniform
[0,1) variate from md5 of the row id — a pure column expression, so the
sample is a deterministic function of the DATA for any layout, any
executor count, any retry. DuckDB computes the identical md5, making
the registry query exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.sources.tables import load_table


def hash_uniform(col: Column) -> Column:
    """Deterministic uniform [0,1) from md5 of a column's string form.

    First 8 hex chars → 32-bit int → /2^32. DuckDB twin:
    ``CAST('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8) AS BIGINT)
    / 4294967296.0``.
    """
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return h.cast("double") / F.lit(4294967296.0)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff hash_uniform(id) < its stratum's rate.

    One scan, no shuffle, no state — the sampling decision is embedded
    in the row itself, so the same doc is kept or dropped identically on
    every cluster and every rerun (what makes ablations comparable).
    """
    rate = F.lit(default_rate)
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(r)).otherwise(rate)
    return df.filter(hash_uniform(F.col(id_col)) < rate)


def sample_summary(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum sampling report in ONE scan: total rows, kept rows,
    and an id checksum of the kept set (so an oracle verifies membership
    exactly, not just counts)."""
    rate = F.lit(default_rate)
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(r)).otherwise(rate)
    kept = hash_uniform(F.col(id_col)) < rate
    return (
        df.groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col(id_col)).otherwise(F.lit(0))).alias(
                "kept_id_checksum"
            ),
        )
        .orderBy(strata_col)
    )


def mixture_plan(
    docs: DataFrame,
    weight: Column,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source epoch plan for a target data mixture: token mass per
    source plus the sampling rate that hits the target share.

    ``weight`` is a per-source target-weight expression. Output per
    source: doc/token counts, the integer weight, ``target_bp`` (the
    target share of the mixed corpus, basis points) and ``rate_bp``
    (the per-source sampling rate achieving it — values over 10000 mean
    the source must be up-sampled/repeated). One corpus scan, one
    shuffle on the source key, and a broadcast of the 1-row totals —
    the shape survives any corpus size.

    Parity: weights and token counts are integers, so every ratio is
    an integer-valued-double expression evaluated identically on both
    engines before the midpoint-safe round-to-integer quantization.
    """
    from bigdataminingproject_spark.functions.text import tokenize

    per = (
        docs.select(
            F.col(strata_col).alias("source"),
            weight.alias("w"),
            F.size(tokenize(F.col(text_col))).alias("_nt"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.max("w").alias("weight"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_tt"), F.sum("weight").alias("_tw")
    )
    return (
        per.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight",
            F.round(F.lit(10000.0) * F.col("weight") / F.col("_tw"))
            .cast("bigint")
            .alias("target_bp"),
            F.round(
                F.lit(10000.0)
                * F.col("weight")
                * F.col("_tt")
                / (F.col("_tw") * F.col("n_tokens"))
            )
            .cast("bigint")
            .alias("rate_bp"),
        )
        .orderBy("source")
    )


def _cap_rank(
    scored: DataFrame, cap: int, strata_col: str, id_col: str
) -> DataFrame:
    """Rank rows within each stratum by (_score desc, id asc), keep the
    top ``cap``. Shared by the direct and hot-stratum domain_cap paths."""
    w = Window.partitionBy(strata_col).orderBy(
        F.desc("_score"), F.asc(id_col)
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= cap
    )


def domain_cap(
    docs: DataFrame,
    cap: int = 50,
    strata_col: str = "source",
    id_col: str = "doc_id",
    score: Column | None = None,
    hot_threshold: int | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-domain document cap (RefinedWeb/C4-style host balancing).

    Web corpora are dominated by a few giant hosts; capping documents
    per domain keeps any single source from owning the mixture. Keeps
    the ``cap`` best documents per stratum ranked by ``score`` (default:
    text length — swap in a model-based quality column in production),
    ties broken by id so the kept set is unique and reproducible.

    Scale: ONE shuffle on the stratum key + a partitioned rank window —
    never a global window. Catalyst's InferWindowGroupLimit (Spark
    3.5+) inserts a PARTIAL group-limit before the exchange for this
    row_number-filter shape, so even a pathologically hot stratum (one
    host = half the corpus) ships at most cap rows per map partition to
    its final window task — measured flat (0.4 s) from 50k to 500k rows
    with a 50%-hot distribution (tools/skew_probe.py; the Partial/Final
    WindowGroupLimit pair is pinned by tests/test_plan_quality.py).

    ``hot_threshold`` routes oversized strata through an explicit
    salted two-phase top-k instead — for rank shapes the group-limit
    rule cannot infer (a non-rank score filter, an engine without the
    rule). Per-stratum counts (map-side combined — the shuffled
    relation is one row per stratum) are broadcast to split the input:
    strata over the threshold rank within ``salt_buckets`` md5-derived
    sub-groups first (each task bounded at stratum_rows/salt_buckets,
    keeping ≤ cap per bucket), then the ≤ salt_buckets·cap survivors
    take the exact final rank — identical output to the direct window,
    because every row of the true per-stratum top-cap is also in its
    own bucket's top-cap (pinned by tests/test_skew.py). Cold strata
    pay the single window they always did.
    """
    if score is None:
        score = F.length(F.col("text"))
    scored = docs.withColumn("_score", score)
    if hot_threshold is None:
        ranked = _cap_rank(scored, cap, strata_col, id_col)
    else:
        counts = scored.groupBy(strata_col).agg(
            F.count(F.lit(1)).alias("_n")
        )
        hot = counts.filter(F.col("_n") > hot_threshold).select(strata_col)
        cold_ranked = _cap_rank(
            scored.join(F.broadcast(hot), strata_col, "left_anti"),
            cap,
            strata_col,
            id_col,
        )
        salt = (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % salt_buckets
        )
        ws = Window.partitionBy(strata_col, "_salt").orderBy(
            F.desc("_score"), F.asc(id_col)
        )
        candidates = (
            scored.join(F.broadcast(hot), strata_col, "left_semi")
            .withColumn("_salt", salt)
            .withColumn("_srnk", F.row_number().over(ws))
            .filter(F.col("_srnk") <= cap)
            .drop("_salt", "_srnk")
        )
        ranked = cold_ranked.unionByName(
            _cap_rank(candidates, cap, strata_col, id_col)
        )
    return ranked.select(
        F.col(strata_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.col("_score").cast("bigint").alias("score"),
        "rnk",
    ).orderBy("source", "rnk")


def token_budget_sample(
    docs: DataFrame,
    budget: int = 10_000,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fill a per-source token budget in deterministic pseudo-random
    order: docs are taken in md5(id) order, accumulating token counts,
    until the next doc would stay within ``budget``.

    The standard "give me ~N tokens per source" primitive for mixture
    construction. md5 order makes the scan order — and therefore the
    kept set — a pure function of the data (same result on any layout,
    any retry); the cumulative sum is a window partitioned by source,
    so no global ordering exists anywhere in the plan.

    Integer-exact end to end: token counts and cumsums are BIGINTs.
    """
    from bigdataminingproject_spark.functions.text import tokenize

    n_tok = F.size(tokenize(F.col(text_col))).cast("bigint")
    order_key = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(strata_col)
        .orderBy(order_key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        docs.select(
            F.col(strata_col).alias("source"),
            F.col(id_col).alias("doc_id"),
            n_tok.alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        # doc_id tiebreak: zero-token docs share a cum_tokens value, so
        # (source, cum_tokens) alone is not a total order.
        .orderBy("source", "cum_tokens", "doc_id")
    )


def doc_shards(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic shard assignment + per-shard manifest.

    Training jobs want the corpus cut into a fixed number of shards with
    stable membership (md5(id) mod n — layout-independent, rerun-safe).
    Emits one manifest row per shard: doc count, token mass, and an
    id-sum checksum so an oracle verifies exact membership, not just
    counts. One scan, one shuffle on the shard key.
    """
    from bigdataminingproject_spark.functions.text import tokenize

    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % n_shards
    )
    return (
        docs.select(
            shard.alias("shard"),
            F.col(id_col).alias("_id"),
            F.size(tokenize(F.col(text_col))).cast("bigint").alias("_nt"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.sum("_id").alias("id_checksum"),
        )
        .orderBy("shard")
    )


TRAIN_FRAC = 0.9


def leakage_safe_split(
    docs: DataFrame,
    train_frac: float = TRAIN_FRAC,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/validation split whose unit is the EXACT-DUPLICATE GROUP,
    not the document: the split variate is ``hash_uniform(md5(text))``,
    so byte-identical documents land on the same side by construction
    and a val doc can never be a verbatim copy of a train doc — the
    leak a naive split-by-doc-id commits on any corpus with duplicates
    (Lee et al. 2021 measured ~1% verbatim train/test overlap in C4 from
    exactly this).

    The decision is embedded in the row (one scan, ZERO shuffles for
    the assignment itself — same property as ``stratified_sample``);
    near-dup-group splitting composes by substituting the
    ``dedup.dedup_clusters`` representative for the md5 key. Emits a
    per-split manifest (docs, distinct groups, id checksum) — the
    distinct-count is the only shuffle.
    """
    group_key = F.md5(F.col(text_col))
    side = F.when(
        hash_uniform(group_key) < F.lit(train_frac), F.lit("train")
    ).otherwise(F.lit("val"))
    return (
        docs.select(
            side.alias("split"),
            group_key.alias("_g"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("_g").alias("n_groups"),
            F.sum("_id").alias("id_checksum"),
        )
        .orderBy("split")
    )


def q_doc_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group-keyed 90/10 split manifest of the documents."""
    docs = load_table(spark, sf_dir, "documents")
    return leakage_safe_split(docs)


def dsir_logweights(
    docs: DataFrame,
    target_sources: list[str],
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance log-weights (Xie et al. 2023, reduced to
    unigram features): score every document by how much more likely its
    tokens are under a TARGET distribution (docs from
    ``target_sources`` — the high-quality slice you want more of) than
    under the raw-corpus distribution.

    logw(d) = (1/n) sum_w [ln p_t(w) - ln p_r(w)], with add-1
    smoothing over the corpus vocabulary on both LMs so target-unseen
    tokens stay finite: p(w) = (cnt+1)/(total+V). Resampling the
    corpus proportionally to exp(logw) tilts the mixture toward the
    target domain — the standard importance-resampling step between
    "have a small clean corpus" and "select from a 100 TB raw one".

    Scale: one token explode; corpus counts [hash-agg], target counts
    [hash-agg over the filtered slice], a vocabulary-sized left join of
    the token stream to both count relations, a 1-row broadcast of
    (totals, V), and one doc-keyed aggregate. Integer counts
    end-to-end; the single float sum is rounded to 4 dp on both
    engines.
    """
    from bigdataminingproject_spark.functions.text import tokenize

    toks = tokenize(F.col(text_col))
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).alias("source"),
        F.explode(toks).alias("token"),
    )
    corpus = tok.groupBy("token").agg(F.count(F.lit(1)).alias("rc"))
    target = (
        tok.filter(F.col("source").isin(target_sources))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    totals = corpus.agg(
        F.sum("rc").alias("r_total"),
        F.count(F.lit(1)).alias("vocab"),
    ).join(target.agg(F.sum("tc").alias("t_total")))
    log_ratio = F.log(
        (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1.0))
        / (F.col("t_total") + F.col("vocab"))
    ) - F.log(
        (F.col("rc") + F.lit(1.0)) / (F.col("r_total") + F.col("vocab"))
    )
    return (
        tok.join(corpus, "token")
        .join(target, "token", "left")
        .join(F.broadcast(totals))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # + 0.0 canonicalizes IEEE -0.0 (a doc whose ratio rounds
            # to zero from below) to +0.0 on both engines
            (F.round(F.sum(log_ratio) / F.count(F.lit(1)), 4) + F.lit(0.0))
            .alias("logw"),
        )
        .orderBy("doc_id")
    )


# --- query registry entry ---------------------------------------------------

# Per-source mixing rates for the registry query: a "books-heavy" mix —
# keep everything from src0/src1, 30% default, 5% of src19.
MIX_RATES = {"src0": 1.0, "src1": 1.0, "src19": 0.05}
MIX_DEFAULT = 0.3


def q_doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source mixture sampling with exact membership
    checksum; DuckDB recomputes the identical md5-derived variates."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_summary(docs, MIX_RATES, MIX_DEFAULT)


def q_doc_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch mixture plan with a deterministic per-source target weight
    (1 + source_index mod 3 — cycles the 20 sources through weights
    1/2/3, exercising both up- and down-sampling rates)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.expr("CAST(substring(source, 4) AS INT) % 3 + 1")
    return mixture_plan(docs, w)


def q_doc_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 docs per source by text length (host-balancing cap)."""
    docs = load_table(spark, sf_dir, "documents")
    return domain_cap(docs, cap=10)


def q_doc_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a 400-token budget per source in deterministic md5 order."""
    docs = load_table(spark, sf_dir, "documents")
    return token_budget_sample(docs, budget=400)


def q_doc_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-way deterministic shard manifest with membership checksums."""
    docs = load_table(spark, sf_dir, "documents")
    return doc_shards(docs, n_shards=8)


DSIR_TARGET_SOURCES = ["src0", "src1"]


def q_doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights with src0/src1 as the target slice."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_logweights(docs, DSIR_TARGET_SOURCES)


def apply_mixture(
    docs: DataFrame,
    weight: Column,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Execute the epoch plan ``mixture_plan`` only describes: a per-doc
    copy-count manifest realizing each source's sampling rate.

    rate_bp <= 10000 (down-sample): keep the doc iff its deterministic
    md5 variate falls under the rate. rate_bp > 10000 (up-sample): every
    doc gets ``rate_bp // 10000`` full copies plus one more iff the
    variate falls under the fractional remainder — in expectation (and
    deterministically per doc) the source's token mass hits its target
    share. Docs with zero copies are dropped.

    The plan is a #sources-row broadcast joined onto one corpus scan;
    the manifest adds no explosion (copies stay a count — the trainer's
    data loader repeats by ``n_copies``, the engine never materializes
    duplicates). Same variate convention as ``stratified_sample``, so
    membership is layout/retry-invariant.
    """
    plan = mixture_plan(
        docs, weight, strata_col=strata_col, text_col=text_col
    ).select("source", "rate_bp")
    variate_bp = F.floor(
        hash_uniform(F.col(id_col)) * F.lit(10000.0)
    ).cast("long")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(strata_col).alias("source"),
        )
        .join(F.broadcast(plan), "source")
        .select(
            "doc_id",
            "source",
            (
                # floor of the double quotient == true integer division
                # here (exact-integer quotients are exactly representable);
                # explicit floor because CAST(double AS BIGINT) truncates
                # in Spark but ROUNDS in DuckDB.
                F.floor(F.col("rate_bp") / F.lit(10000.0)).cast("long")
                + (
                    variate_bp < F.col("rate_bp") % F.lit(10000)
                ).cast("long")
            ).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 0)
        .orderBy("doc_id")
    )


def q_doc_apply_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-copy manifest realizing the q_doc_mixture_plan rates (the
    same cycling 1/2/3 source weights)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.expr("CAST(substring(source, 4) AS INT) % 3 + 1")
    return apply_mixture(docs, w)


# --- weighted sampling without replacement ----------------------------------

def exp_sort_key(u: Column, weight: Column) -> Column:
    """Efraimidis–Spirakis (IPL 2006) sort key: ranking rows by
    ``u^(1/w)`` descending draws a weighted sample WITHOUT replacement —
    the top-k under this key has exactly the distribution of k
    successive draws proportional to ``w``. We rank by the monotone
    transform ``ln(u)/w`` (same order, one transcendental instead of a
    pow) with ``u`` the deterministic md5 uniform shifted to (0,1) so
    the log is finite. Deterministic like every sampler here: the key
    is a pure function of the row, so the sample is identical on any
    cluster layout, any retry — and DuckDB derives the same key."""
    return F.log(u) / weight


def weighted_sample_wor(
    df: DataFrame,
    k: int,
    weight: Column,
    group_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` rows (overall, or per ``group_col``) under the
    Efraimidis–Spirakis key — a weighted sample without replacement.

    Scale shape: the key is a map-side column expression; the global
    variant is a TakeOrdered (per-partition top-k, then a k-sized
    merge — no global sort), the grouped variant a partitioned
    row_number window that Catalyst rewrites with a partial
    WindowGroupLimit before the exchange (same plan family as
    domain_cap, which carries the skew-hardened variant if a group is
    pathologically hot)."""
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    scored = df.withColumn("_w", weight).withColumn(
        "_key", exp_sort_key(u, F.col("_w"))
    )
    if group_col is None:
        top = scored.orderBy(F.desc("_key"), F.asc(id_col)).limit(k)
        w = Window.orderBy(F.desc("_key"), F.asc(id_col))
    else:
        w = Window.partitionBy(group_col).orderBy(
            F.desc("_key"), F.asc(id_col)
        )
        top = scored.withColumn("rnk", F.row_number().over(w)).filter(
            F.col("rnk") <= k
        )
        return top
    return top.withColumn("rnk", F.row_number().over(w))


def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sample without replacement: 20 docs per
    source, inclusion probability proportional to document length —
    the length-debiased spot-check sample a curation pipeline pulls
    for review (uniform sampling over-represents the short tail)."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = weighted_sample_wor(
        docs,
        k=20,
        weight=F.greatest(F.lit(1), F.length("text")).cast("double"),
        group_col="source",
    )
    return sampled.select(
        "source",
        "doc_id",
        F.col("_w").cast("bigint").alias("weight"),
        "rnk",
    ).orderBy("source", "rnk")


def weighted_sample_partial(
    df: DataFrame,
    weight: Column,
    k: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group top-``k`` ES-key survivors of ONE corpus slice — the
    mergeable partial of ``weighted_sample_wor``. The key rides along
    so partials can be re-ranked against later slices; because the key
    is a deterministic function of the row, a partial computed at
    arrival time stays valid forever (no rescoring on merge)."""
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    scored = df.select(
        F.col(group_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        weight.alias("_w"),
        exp_sort_key(u, weight).alias("_key"),
    )
    return fold_sample_partials(scored, k)


def fold_sample_partials(parts: DataFrame, k: int = 20) -> DataFrame:
    """N-ary merge of weighted-sample partials: per-group top-``k`` by
    (key desc, id asc) over the stacked rows. Exact by top-k closure
    under disjoint union — the true top-k of A ∪ B is contained in
    top-k(A) ∪ top-k(B) — and associative/commutative, so it serves as
    the LSM state store's ``merge_transform``: compaction folds sample
    parts instead of stacking them, every level stays ≤ groups × k
    rows."""
    w = Window.partitionBy("source").orderBy(
        F.desc("_key"), F.asc("doc_id")
    )
    return (
        parts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def finish_weighted_sample(state: DataFrame, k: int = 20) -> DataFrame:
    """Publish pass: fold once more and attach the final per-group
    rank — lands exactly on ``q_doc_weighted_sample``'s output."""
    folded = fold_sample_partials(state, k)
    w = Window.partitionBy("source").orderBy(
        F.desc("_key"), F.asc("doc_id")
    )
    return (
        folded.withColumn("rnk", F.row_number().over(w))
        .select(
            "source",
            "doc_id",
            F.col("_w").cast("bigint").alias("weight"),
            "rnk",
        )
    )


def q_doc_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved curriculum schedule: docs rank easiest-first WITHIN
    each source (difficulty = token count, ties by id), and the global
    schedule runs step 1 of every source before step 2 of any — the
    round-robin difficulty ramp curriculum-training data loaders
    consume. The per-source rank is a FULL ranking of a scaling
    relation, computed by ``plans/ordering.grouped_position`` (one
    bucketed global position + broadcast offsets) instead of a
    per-source window — a handful of sources over a 100 TB corpus
    would otherwise serialize through a handful of window tasks.
    Output: the schedule's first 500 slots."""
    from bigdataminingproject_spark.functions.text import tokenize
    from bigdataminingproject_spark.plans.ordering import grouped_position

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.size(tokenize(F.col("text"))).alias("ntok"),
    )
    ranked = grouped_position(
        base,
        "source",
        "ntok",
        tiebreakers=[F.col("doc_id")],
        pos_col="step",
    )
    return (
        ranked.select("step", "source", "doc_id", "ntok")
        .orderBy("step", "source")
        .limit(500)
    )
