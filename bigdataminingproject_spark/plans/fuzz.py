"""Randomized differential query fuzzer (VERDICT r5 #2).

Every registry oracle was hand-written alongside its Spark query, so a
systematic convention bug (rounding, type widening, null grouping,
negative-zero) could slip through both sides of a paired authorship.
This module closes that gap: a seeded generator draws a random query
spec — base table, FK join chain, filter conjunction, projection or
grouped aggregation — and renders THE SAME spec to (a) an idiomatic
DataFrame plan and (b) an ANSI/DuckDB SQL string. The two renderings
share nothing but the spec, so any divergence is a real cross-engine
semantics bug in how we express plans, not a transcription artifact.

The spec space deliberately sticks to the repo's parity conventions
(memory: spark-graft-conventions):

* integer sums are CAST to BIGINT on the SQL side (DuckDB widens to
  HUGEINT);
* double sums go through exact integer cents — ``floor(x*100 + 0.5)``
  per row, summed as BIGINT — so no floating-point summation-order
  noise can distinguish the engines;
* ``events.ts`` never appears (TIMESTAMP(NANOS) parquet; see
  ``sources/tables.py``);
* every computed column carries the same alias on both sides; matrices
  are compared order-insensitively, so ORDER BY/LIMIT appears only in
  the top-k shape, where the order key is the base table's unique id —
  a total order, so the selected k-set is deterministic cross-engine;
* existential FK filters render as left_semi/left_anti joins on the
  Spark side and correlated [NOT] EXISTS subqueries on the SQL side —
  exercising DuckDB's decorrelation against Spark's dedicated join
  types (ADVICE r6: previously drawn but never rendered);
* ROLLUP aggregations (subtotal + grand-total grouping sets) render as
  ``DataFrame.rollup`` vs ``GROUP BY ROLLUP`` — the null-extension
  convention for rolled-up keys must agree across engines. One REAL
  upstream divergence, found by this fuzzer's first rollup run (seed
  289): on an EMPTY input the SQL standard (and DuckDB) emits the
  grand-total grouping-set row — ``(NULL, …, count=0)`` — while Spark's
  ``rollup`` emits zero rows. The SQL rendering encodes Spark's
  documented behavior with an ``EXISTS`` guard over the filtered input
  so the comparison tests OUR rendering conventions, not that known
  engine difference.

Scale note: the generated plans are the shapes the engine runs at
100 TB — FK equi-joins with broadcast dims, predicate-first filters,
hash aggregations with map-side combine — so the fuzzer also acts as a
plan-shape regression net: a spec that suddenly produces a cartesian
or a global window would fail loudly at test scale.

Reference scope: the reference has no relational surface
(SURVEY.md §2.9) — this is north-star infrastructure for the Spark
engine itself.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Catalog: fuzzable columns per table (events.ts excluded by design).
# Literal pools come from the sf0.001 fixture value domains; literals
# slightly outside the domain are fine (empty results are comparable).


@dataclass(frozen=True)
class Col:
    name: str
    kind: str  # int | double | string | date
    pool: tuple = ()  # string values / (lo, hi) numeric range


TABLES: dict[str, list[Col]] = {
    "region": [
        Col("r_regionkey", "int", (0, 4)),
        Col("r_name", "string", ("AFRICA", "AMERICA", "ASIA", "EUROPE")),
    ],
    "nation": [
        Col("n_nationkey", "int", (0, 24)),
        Col("n_name", "string", ("NATION_0", "NATION_7", "NATION_13")),
        Col("n_regionkey", "int", (0, 4)),
    ],
    "customer": [
        Col("c_custkey", "int", (1, 1500)),
        Col("c_nationkey", "int", (0, 24)),
        Col("c_acctbal", "double", (-900.0, 9900.0)),
        Col(
            "c_mktsegment",
            "string",
            ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
        ),
    ],
    "supplier": [
        Col("s_suppkey", "int", (1, 100)),
        Col("s_nationkey", "int", (0, 24)),
        Col("s_acctbal", "double", (500.0, 6100.0)),
    ],
    "part": [
        Col("p_partkey", "int", (1, 2000)),
        Col("p_brand", "string", ("Brand#1", "Brand#13", "Brand#22")),
        Col(
            "p_type",
            "string",
            ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"),
        ),
        Col("p_size", "int", (1, 50)),
        Col("p_retailprice", "double", (900.0, 920.0)),
    ],
    "orders": [
        Col("o_orderkey", "int", (1, 60000)),
        Col("o_custkey", "int", (1, 1500)),
        Col("o_orderstatus", "string", ("F", "O", "P")),
        Col("o_totalprice", "double", (1300.0, 500000.0)),
        Col("o_orderdate", "date", ("1995-01-01", "2001-08-01")),
        Col(
            "o_orderpriority",
            "string",
            ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        ),
    ],
    "lineitem": [
        Col("l_orderkey", "int", (1, 60000)),
        Col("l_partkey", "int", (1, 2000)),
        Col("l_suppkey", "int", (1, 100)),
        Col("l_linenumber", "int", (1, 7)),
        Col("l_quantity", "double", (1.0, 50.0)),
        Col("l_extendedprice", "double", (900.0, 105000.0)),
        Col("l_discount", "double", (0.0, 0.1)),
        Col("l_tax", "double", (0.0, 0.08)),
        Col("l_returnflag", "string", ("A", "N", "R")),
        Col("l_linestatus", "string", ("F", "O")),
        Col("l_shipdate", "date", ("1995-01-02", "2001-11-04")),
    ],
    "events": [
        Col("event_id", "int", (0, 100000)),
        Col("user_id", "int", (0, 14)),
        Col(
            "event_type",
            "string",
            ("click", "error", "purchase", "signup", "view"),
        ),
        Col("value", "double", (0.0, 330.0)),
    ],
    "documents": [
        Col("doc_id", "int", (0, 5000)),
        Col("lang", "string", ("de", "en", "es", "fr", "zh")),
        Col("source", "string", ("src0", "src5", "src12", "src19")),
        Col("n_chars", "int", (40, 560)),
    ],
}

# per-table unique id EXPRESSION (SQL text; identical in Spark via
# F.expr) — the deterministic window order key. Every FK edge joins TO
# a primary key, so the base uid stays unique through any join chain.
UID_EXPR = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey * 10 + l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
}

# FK edges (left_table, right_table, left_col, right_col); a chain only
# adds a table not already in the relation, so names never collide.
FK_EDGES = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
    ("nation", "region", "n_regionkey", "r_regionkey"),
]


@dataclass
class Atom:
    col: Col
    op: str  # lt le gt ge eq ne in like mod
    lit: object = None
    lit2: object = None  # modulus remainder


@dataclass
class Pred:
    atoms: list  # 1 atom = plain, 2 atoms = OR pair


@dataclass
class Agg:
    kind: str  # count | sum_int | sum_cents | min | max | nuniq
    col: Col | None
    alias: str


@dataclass
class Spec:
    seed: int
    base: str
    joins: list = field(default_factory=list)  # (edge, how)
    # existential FK filter instead of a join: (edge, 'semi'|'anti',
    # Atom-on-right-table | None). Spark: left_semi/left_anti join;
    # SQL: correlated [NOT] EXISTS — exercises DuckDB's decorrelation
    # against Spark's dedicated join types.
    exists_edge: tuple | None = None
    preds: list = field(default_factory=list)
    shape: str = "project"  # project | agg | window
    # project
    proj_cols: list = field(default_factory=list)
    computed: tuple | None = None  # (kind, Col, alias)
    distinct: bool = False
    # deterministic top-k: ORDER BY base uid LIMIT k (uid in output)
    topk: int | None = None
    # agg
    keys: list = field(default_factory=list)
    key_mod: tuple | None = None  # (Col, k, alias) bucketed int key
    key_case: tuple | None = None  # (Col, threshold, alias) lo/hi bucket
    rollup: bool = False  # GROUP BY ROLLUP over plain keys
    aggs: list = field(default_factory=list)
    having_count: int | None = None
    # union: a second filter branch of the same projection, UNION ALL
    union_pred: Pred | None = None
    # window: (partition Col, [(fn, value Col|None, alias), ...]);
    # ordered by the base table's unique id, so every window output is
    # deterministic cross-engine
    win_partition: Col | None = None
    win_exprs: list = field(default_factory=list)


# --------------------------------------------------------------------------
# Generation


def _tables_in(spec: Spec) -> list[str]:
    return [spec.base] + [e[1] for e, _how in spec.joins]


def _cols_in(spec: Spec) -> list[Col]:
    out = []
    for t in _tables_in(spec):
        out.extend(TABLES[t])
    return out


def _rand_atom(rng: random.Random, col: Col) -> Atom:
    if col.kind == "string":
        op = rng.choice(["eq", "ne", "in", "like"])
        if op == "in":
            k = rng.randint(1, min(3, len(col.pool)))
            return Atom(col, "in", tuple(rng.sample(list(col.pool), k)))
        if op == "like":
            v = rng.choice(col.pool)
            return Atom(col, "like", v[: rng.randint(1, max(1, len(v) - 1))])
        return Atom(col, op, rng.choice(col.pool))
    if col.kind == "date":
        lo, hi = col.pool
        y = rng.randint(int(lo[:4]), int(hi[:4]))
        m = rng.randint(1, 12)
        d = rng.randint(1, 28)
        return Atom(
            col, rng.choice(["lt", "le", "gt", "ge"]), f"{y:04d}-{m:02d}-{d:02d}"
        )
    if col.kind == "double":
        lo, hi = col.pool
        lit = round(rng.uniform(lo, hi), 2)
        return Atom(col, rng.choice(["lt", "le", "gt", "ge"]), lit)
    lo, hi = col.pool
    op = rng.choice(["lt", "le", "gt", "ge", "eq", "ne", "mod"])
    if op == "mod":
        k = rng.randint(2, 7)
        return Atom(col, "mod", k, rng.randint(0, k - 1))
    return Atom(col, op, rng.randint(lo, hi))


def gen_spec(seed: int) -> Spec:
    rng = random.Random(seed)
    spec = Spec(seed=seed, base=rng.choice(list(TABLES)))
    # FK join chain (0-2 hops)
    for _ in range(rng.choice([0, 0, 0, 1, 1, 2])):
        present = set(_tables_in(spec))
        edges = [
            e for e in FK_EDGES if e[0] in present and e[1] not in present
        ]
        if not edges:
            break
        spec.joins.append(
            (rng.choice(edges), rng.choice(["inner", "inner", "left"]))
        )
    # existential FK filter (only when no join chain was drawn, so the
    # right table's columns never leak into predicates/projections)
    if not spec.joins and rng.random() < 0.3:
        cand = [e for e in FK_EDGES if e[0] == spec.base]
        if cand:
            edge = rng.choice(cand)
            atom = (
                _rand_atom(rng, rng.choice(TABLES[edge[1]]))
                if rng.random() < 0.6
                else None
            )
            spec.exists_edge = (
                edge,
                rng.choice(["semi", "semi", "anti"]),
                atom,
            )
    # filter conjunction (0-2 predicates, each sometimes an OR pair)
    cols = _cols_in(spec)
    for _ in range(rng.choice([0, 1, 1, 2])):
        atoms = [_rand_atom(rng, rng.choice(cols))]
        if rng.random() < 0.25:
            atoms.append(_rand_atom(rng, rng.choice(cols)))
        spec.preds.append(Pred(atoms))
    # shape
    shape_draw = rng.random()
    if shape_draw < 0.2:
        spec.shape = "window"
        keypool = [c for c in cols if c.kind in ("string", "int")]
        spec.win_partition = rng.choice(keypool)
        n_w = rng.randint(1, 2)
        for i in range(n_w):
            fn = rng.choice(["row_number", "lag", "running_sum"])
            if fn == "row_number":
                spec.win_exprs.append(("row_number", None, f"rn_{i}"))
            elif fn == "lag":
                cands = [c for c in cols if c.kind in ("int", "string")]
                c = rng.choice(cands)
                spec.win_exprs.append(("lag", c, f"lag_{c.name}_{i}"))
            else:
                ints = [c for c in cols if c.kind == "int"]
                if not ints:
                    spec.win_exprs.append(("row_number", None, f"rn_{i}"))
                else:
                    c = rng.choice(ints)
                    spec.win_exprs.append(
                        ("running_sum", c, f"rsum_{c.name}_{i}")
                    )
    elif shape_draw < 0.65:
        spec.shape = "agg"
        keypool = [c for c in cols if c.kind in ("string", "int")]
        spec.keys = rng.sample(keypool, rng.randint(1, min(2, len(keypool))))
        if rng.random() < 0.3:
            ints = [c for c in cols if c.kind == "int"]
            if ints:
                c = rng.choice(ints)
                spec.key_mod = (c, rng.randint(2, 9), f"{c.name}_bucket")
        if rng.random() < 0.25:
            ints = [c for c in cols if c.kind == "int"]
            if ints:
                c = rng.choice(ints)
                spec.key_case = (
                    c,
                    rng.randint(c.pool[0], c.pool[1]),
                    f"{c.name}_band",
                )
        # ROLLUP over plain column keys only: a computed bucket/CASE key
        # inside a grouping set would make the "rolled-up NULL vs
        # computed NULL" distinction ambiguous to compare.
        if (
            spec.key_mod is None
            and spec.key_case is None
            and rng.random() < 0.2
        ):
            spec.rollup = True
        n_aggs = rng.randint(1, 3)
        kinds = ["count", "sum_int", "sum_cents", "min", "max", "nuniq"]
        for i in range(n_aggs):
            kind = rng.choice(kinds)
            if kind == "count":
                spec.aggs.append(Agg("count", None, f"cnt_{i}"))
            elif kind == "sum_int":
                ints = [c for c in cols if c.kind == "int"]
                if not ints:
                    continue
                c = rng.choice(ints)
                spec.aggs.append(Agg(kind, c, f"sum_{c.name}_{i}"))
            elif kind == "sum_cents":
                dbls = [c for c in cols if c.kind == "double"]
                if not dbls:
                    continue
                c = rng.choice(dbls)
                spec.aggs.append(Agg(kind, c, f"cents_{c.name}_{i}"))
            elif kind == "nuniq":
                cands = [c for c in cols if c.kind in ("string", "int")]
                c = rng.choice(cands)
                spec.aggs.append(Agg(kind, c, f"nuniq_{c.name}_{i}"))
            else:  # min / max over any kind (raw values are bit-shared)
                c = rng.choice(cols)
                spec.aggs.append(Agg(kind, c, f"{kind}_{c.name}_{i}"))
        if not spec.aggs:
            spec.aggs.append(Agg("count", None, "cnt_0"))
        if rng.random() < 0.25 and any(
            a.kind == "count" for a in spec.aggs
        ):
            spec.having_count = rng.randint(1, 5)
    else:
        spec.shape = "project"
        spec.proj_cols = rng.sample(cols, rng.randint(1, min(4, len(cols))))
        if rng.random() < 0.4:
            cands = [c for c in cols if c.kind in ("int", "string")]
            c = rng.choice(cands)
            kind = (
                rng.choice(["times2", "plus", "mod"])
                if c.kind == "int"
                else rng.choice(["length", "upper", "lower", "substr"])
            )
            spec.computed = (kind, c, f"x_{c.name}")
        spec.distinct = rng.random() < 0.3
        if not spec.distinct and rng.random() < 0.3:
            # UNION ALL with a differently-filtered branch of the same
            # projection (duplicates preserved — the matrix compare is
            # multiset-sensitive, so bag semantics are exercised)
            spec.union_pred = Pred([_rand_atom(rng, rng.choice(cols))])
        if (
            not spec.distinct
            and spec.union_pred is None
            and rng.random() < 0.25
        ):
            # deterministic top-k: ORDER BY the base table's unique id
            # (a total order even post-filter) LIMIT k, uid in output —
            # the one shape where ORDER BY/LIMIT is cross-engine safe
            spec.topk = rng.randint(1, 20)
    return spec


# --------------------------------------------------------------------------
# Rendering: Spark DataFrame


def _atom_col(a: Atom):
    c = F.col(a.col.name)
    if a.op == "lt":
        return c < F.lit(a.lit)
    if a.op == "le":
        return c <= F.lit(a.lit)
    if a.op == "gt":
        return c > F.lit(a.lit)
    if a.op == "ge":
        return c >= F.lit(a.lit)
    if a.op == "eq":
        return c == F.lit(a.lit)
    if a.op == "ne":
        return c != F.lit(a.lit)
    if a.op == "in":
        return c.isin(list(a.lit))
    if a.op == "like":
        return c.like(a.lit + "%")
    if a.op == "mod":
        return (c % F.lit(a.lit)) == F.lit(a.lit2)
    raise ValueError(a.op)


def spec_to_df(spark: SparkSession, sf_dir: str, spec: Spec) -> DataFrame:
    from bigdataminingproject_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, spec.base)
    if spec.exists_edge is not None:
        # Existential FK filter: Spark's dedicated semi/anti join types
        # vs the SQL side's correlated [NOT] EXISTS. Applied before the
        # union-branch capture — the filter is part of the base
        # relation (the SQL renderer wraps it in the FROM subquery).
        (_lt, rt, lc, rc), mode, atom = spec.exists_edge
        right = load_table(spark, sf_dir, rt)
        if atom is not None:
            right = right.filter(_atom_col(atom))
        df = df.join(
            F.broadcast(right.select(rc)),
            F.col(lc) == F.col(rc),
            "left_semi" if mode == "semi" else "left_anti",
        )
    for (lt, rt, lc, rc), how in spec.joins:
        right = load_table(spark, sf_dir, rt)
        # FK targets are dims relative to the fact side: broadcast —
        # the plan shape the engine wants at scale.
        df = df.join(F.broadcast(right), F.col(lc) == F.col(rc), how)
    joined = df  # pre-filter relation (the union branch re-filters it)
    for p in spec.preds:
        cond = _atom_col(p.atoms[0])
        for a in p.atoms[1:]:
            cond = cond | _atom_col(a)
        df = df.filter(cond)
    if spec.shape == "project":

        def _project(dfx: DataFrame) -> DataFrame:
            cols = [F.col(c.name) for c in spec.proj_cols]
            if spec.topk is not None:
                cols.append(F.expr(UID_EXPR[spec.base]).alias("uid"))
            if spec.computed:
                kind, c, alias = spec.computed
                e = F.col(c.name)
                expr = {
                    "times2": e * F.lit(2),
                    "plus": e + F.lit(7),
                    "mod": e % F.lit(5),
                    "length": F.length(e),
                    "upper": F.upper(e),
                    "lower": F.lower(e),
                    "substr": F.substring(e, 1, 3),
                }[kind]
                cols.append(expr.alias(alias))
            out = dfx.select(*cols)
            # date columns surface as DATE on both engines
            for c in spec.proj_cols:
                if c.kind == "date":
                    out = out.withColumn(c.name, F.col(c.name).cast("date"))
            return out

        out = _project(df)
        if spec.union_pred is not None:
            cond = _atom_col(spec.union_pred.atoms[0])
            out = out.unionByName(_project(joined.filter(cond)))
        if spec.topk is not None:  # never combined with distinct/union
            return out.orderBy("uid").limit(spec.topk)
        return out.distinct() if spec.distinct else out
    if spec.shape == "window":
        from pyspark.sql.window import Window as W

        pk = spec.win_partition
        uid = F.expr(UID_EXPR[spec.base])
        value_cols = sorted(
            {c.name for _fn, c, _a in spec.win_exprs if c is not None}
            - {pk.name}
        )
        out = df.select(
            F.col(pk.name),
            uid.alias("uid"),
            *[F.col(v) for v in value_cols],
        )
        w = W.partitionBy(pk.name).orderBy("uid")
        for fn, c, alias in spec.win_exprs:
            if fn == "row_number":
                out = out.withColumn(alias, F.row_number().over(w))
            elif fn == "lag":
                out = out.withColumn(alias, F.lag(F.col(c.name), 1).over(w))
            else:  # running_sum
                out = out.withColumn(
                    alias,
                    F.sum(F.col(c.name))
                    .over(
                        w.rowsBetween(W.unboundedPreceding, W.currentRow)
                    )
                    .cast("long"),
                )
        return out.select(
            pk.name, "uid", *[a for _fn, _c, a in spec.win_exprs]
        )
    # agg shape
    keys = [F.col(c.name).cast("date").alias(c.name)
            if c.kind == "date" else F.col(c.name)
            for c in spec.keys]
    if spec.key_mod:
        c, k, alias = spec.key_mod
        keys.append((F.col(c.name) % F.lit(k)).alias(alias))
    if spec.key_case:
        c, thr, alias = spec.key_case
        keys.append(
            F.when(F.col(c.name) < F.lit(thr), F.lit("lo"))
            .otherwise(F.lit("hi"))
            .alias(alias)
        )
    aggs = []
    for a in spec.aggs:
        if a.kind == "count":
            aggs.append(F.count(F.lit(1)).alias(a.alias))
        elif a.kind == "sum_int":
            aggs.append(F.sum(a.col.name).cast("long").alias(a.alias))
        elif a.kind == "sum_cents":
            aggs.append(
                F.sum(
                    F.floor(F.col(a.col.name) * F.lit(100) + F.lit(0.5))
                    .cast("long")
                )
                .cast("long")
                .alias(a.alias)
            )
        elif a.kind == "nuniq":
            aggs.append(F.countDistinct(a.col.name).alias(a.alias))
        elif a.kind == "min":
            e = F.col(a.col.name)
            if a.col.kind == "date":
                e = e.cast("date")
            aggs.append(F.min(e).alias(a.alias))
        else:
            e = F.col(a.col.name)
            if a.col.kind == "date":
                e = e.cast("date")
            aggs.append(F.max(e).alias(a.alias))
    grouped = df.rollup(*keys) if spec.rollup else df.groupBy(*keys)
    out = grouped.agg(*aggs)
    if spec.having_count is not None:
        cnt = next(a.alias for a in spec.aggs if a.kind == "count")
        out = out.filter(F.col(cnt) >= spec.having_count)
    return out


# --------------------------------------------------------------------------
# Rendering: DuckDB SQL


def _sql_lit(a: Atom) -> str:
    if a.col.kind == "string":
        return f"'{a.lit}'"
    if a.col.kind == "date":
        return f"TIMESTAMP '{a.lit}'"
    if a.col.kind == "double":
        return repr(float(a.lit))
    return str(a.lit)


_OPS = {"lt": "<", "le": "<=", "gt": ">", "ge": ">=", "eq": "=", "ne": "<>"}


def _atom_sql(a: Atom) -> str:
    if a.op in _OPS:
        return f"{a.col.name} {_OPS[a.op]} {_sql_lit(a)}"
    if a.op == "in":
        vals = ", ".join(f"'{v}'" for v in a.lit)
        return f"{a.col.name} IN ({vals})"
    if a.op == "like":
        return f"{a.col.name} LIKE '{a.lit}%'"
    if a.op == "mod":
        return f"({a.col.name} % {a.lit}) = {a.lit2}"
    raise ValueError(a.op)


def spec_to_sql(spec: Spec) -> str:
    frm = spec.base
    if spec.exists_edge is not None:
        # Correlated [NOT] EXISTS wrapped into the FROM subquery so the
        # union branch (which re-filters the same relation) inherits it,
        # mirroring the DF renderer's pre-capture semi/anti join. TPC-H
        # column prefixes make the outer column reference unambiguous.
        (_lt, rt, lc, rc), mode, atom = spec.exists_edge
        neg = "NOT " if mode == "anti" else ""
        cond = f"{rc} = {lc}"
        if atom is not None:
            cond += f" AND {_atom_sql(atom)}"
        frm = (
            f"(SELECT * FROM {spec.base} WHERE {neg}EXISTS "
            f"(SELECT 1 FROM {rt} WHERE {cond})) AS {spec.base}"
        )
    for (lt, rt, lc, rc), how in spec.joins:
        kw = "JOIN" if how == "inner" else "LEFT JOIN"
        frm += f" {kw} {rt} ON {lc} = {rc}"
    where = ""
    if spec.preds:
        parts = []
        for p in spec.preds:
            s = " OR ".join(_atom_sql(a) for a in p.atoms)
            parts.append(f"({s})" if len(p.atoms) > 1 else s)
        where = " WHERE " + " AND ".join(parts)
    if spec.shape == "project":
        cols = [
            f"CAST({c.name} AS DATE) AS {c.name}"
            if c.kind == "date"
            else c.name
            for c in spec.proj_cols
        ]
        if spec.topk is not None:
            cols.append(f"{UID_EXPR[spec.base]} AS uid")
        if spec.computed:
            kind, c, alias = spec.computed
            expr = {
                "times2": f"{c.name} * 2",
                "plus": f"{c.name} + 7",
                "mod": f"{c.name} % 5",
                "length": f"length({c.name})",
                "upper": f"upper({c.name})",
                "lower": f"lower({c.name})",
                "substr": f"substr({c.name}, 1, 3)",
            }[kind]
            cols.append(f"{expr} AS {alias}")
        head = "SELECT DISTINCT" if spec.distinct else "SELECT"
        q = f"{head} {', '.join(cols)} FROM {frm}{where}"
        if spec.union_pred is not None:  # only generated with distinct=False
            w2 = " WHERE " + _atom_sql(spec.union_pred.atoms[0])
            q = f"{q} UNION ALL SELECT {', '.join(cols)} FROM {frm}{w2}"
        if spec.topk is not None:  # never combined with distinct/union
            q = f"{q} ORDER BY uid LIMIT {spec.topk}"
        return q
    if spec.shape == "window":
        pk = spec.win_partition
        uid = UID_EXPR[spec.base]
        over = f"OVER (PARTITION BY {pk.name} ORDER BY {uid})"
        wcols = []
        for fn, c, alias in spec.win_exprs:
            if fn == "row_number":
                wcols.append(f"row_number() {over} AS {alias}")
            elif fn == "lag":
                wcols.append(f"lag({c.name}, 1) {over} AS {alias}")
            else:
                wcols.append(
                    f"CAST(sum({c.name}) OVER (PARTITION BY {pk.name} "
                    f"ORDER BY {uid} ROWS BETWEEN UNBOUNDED PRECEDING "
                    f"AND CURRENT ROW) AS BIGINT) AS {alias}"
                )
        return (
            f"SELECT {pk.name}, {uid} AS uid, {', '.join(wcols)} "
            f"FROM {frm}{where}"
        )
    keycols = [
        f"CAST({c.name} AS DATE) AS {c.name}" if c.kind == "date" else c.name
        for c in spec.keys
    ]
    keyexprs = [
        f"CAST({c.name} AS DATE)" if c.kind == "date" else c.name
        for c in spec.keys
    ]
    if spec.key_mod:
        c, k, alias = spec.key_mod
        keycols.append(f"({c.name} % {k}) AS {alias}")
        keyexprs.append(f"({c.name} % {k})")
    if spec.key_case:
        c, thr, alias = spec.key_case
        case = f"CASE WHEN {c.name} < {thr} THEN 'lo' ELSE 'hi' END"
        keycols.append(f"{case} AS {alias}")
        keyexprs.append(case)
    aggcols = []
    for a in spec.aggs:
        if a.kind == "count":
            aggcols.append(f"CAST(count(*) AS BIGINT) AS {a.alias}")
        elif a.kind == "sum_int":
            aggcols.append(f"CAST(sum({a.col.name}) AS BIGINT) AS {a.alias}")
        elif a.kind == "sum_cents":
            aggcols.append(
                f"CAST(sum(CAST(floor({a.col.name} * 100 + 0.5) AS BIGINT)) "
                f"AS BIGINT) AS {a.alias}"
            )
        elif a.kind == "nuniq":
            aggcols.append(
                f"CAST(count(DISTINCT {a.col.name}) AS BIGINT) AS {a.alias}"
            )
        else:
            fn = a.kind  # min / max
            e = (
                f"CAST({a.col.name} AS DATE)"
                if a.col.kind == "date"
                else a.col.name
            )
            aggcols.append(f"{fn}({e}) AS {a.alias}")
    having = (
        f" HAVING count(*) >= {spec.having_count}"
        if spec.having_count is not None
        else ""
    )
    group = (
        f"ROLLUP ({', '.join(keyexprs)})"
        if spec.rollup
        else ", ".join(keyexprs)
    )
    q = (
        f"SELECT {', '.join(keycols + aggcols)} FROM {frm}{where} "
        f"GROUP BY {group}{having}"
    )
    if spec.rollup:
        # Spark's rollup emits NO grouping-set rows on an empty input;
        # the SQL standard emits the grand-total row. Encode Spark's
        # behavior (see module docstring — real divergence, seed 289).
        q = f"SELECT * FROM ({q}) WHERE EXISTS (SELECT 1 FROM {frm}{where})"
    return q


# --------------------------------------------------------------------------
# Comparison (mirrors tools/check_correctness.py normalization)


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def norm_matrix(cols: list[str], rows) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], mat


def run_case(spark, con, sf_dir: str, seed: int) -> tuple[int, str | None]:
    """Execute one fuzz case; returns (row_count, error-or-None)."""
    spec = gen_spec(seed)
    sdf = spec_to_df(spark, sf_dir, spec)
    s_cols, s_mat = norm_matrix(sdf.columns, sdf.collect())
    cur = con.execute(spec_to_sql(spec))
    o_cols = [d[0] for d in cur.description]
    o_cols, o_mat = norm_matrix(o_cols, cur.fetchall())
    if s_cols != o_cols:
        return len(s_mat), f"seed {seed}: schema {s_cols} vs {o_cols}"
    if s_mat != o_mat:
        only_s = [r for r in s_mat if r not in set(o_mat)][:3]
        only_o = [r for r in o_mat if r not in set(s_mat)][:3]
        return (
            len(s_mat),
            f"seed {seed}: {len(s_mat)} vs {len(o_mat)} rows; "
            f"spark-only={only_s} oracle-only={only_o}; "
            f"sql={spec_to_sql(spec)}",
        )
    return len(s_mat), None


# --------------------------------------------------------------------------
# Text-surface fuzzing (VERDICT r6 #6). The relational spec space above
# covers joins/aggs/windows; the convention bugs that actually bit in
# rounds 1-2 were TEXT-side — tokenizer regex-class semantics, stopword
# filtering, md5-of-joined-tokens attestation, shingle window edges,
# count-vs-distinct-doc aggregation, top-k tie order. One TextSpec
# renders to the engine's tokenize/shingles primitives on the Spark
# side and to the DuckDB string_split_regex/list_* pipeline on the SQL
# side; the only shared text is the stop/skip-word constant (the same
# engine constant the registry oracles interpolate).


@dataclass
class TextSpec:
    seed: int
    stopwords: bool  # drop stop/skip words after tokenizing
    doc_preds: list = field(default_factory=list)  # Atoms on documents
    shape: str = "token_agg"  # token_agg | ngram_agg | doc_stats | token_topk
    tok_pred: tuple | None = None  # (minlen,k)|(maxlen,k)|(prefix,s)
    ngram_k: int = 3
    agg: str = "count"  # count | ndocs (token_agg only)
    min_count: int | None = None  # HAVING on the aggregate
    topk: int = 10  # token_topk only


def gen_text_spec(seed: int) -> TextSpec:
    rng = random.Random(10_000_019 + seed)
    spec = TextSpec(seed=seed, stopwords=rng.random() < 0.5)
    doc_cols = TABLES["documents"]
    for _ in range(rng.choice([0, 1, 1, 2])):
        spec.doc_preds.append(_rand_atom(rng, rng.choice(doc_cols)))
    if rng.random() < 0.6:
        kind = rng.choice(["minlen", "maxlen", "prefix"])
        if kind == "prefix":
            spec.tok_pred = ("prefix", rng.choice("abcdemnpst"))
        else:
            spec.tok_pred = (kind, rng.randint(2, 8))
    draw = rng.random()
    if draw < 0.35:
        spec.shape = "token_agg"
        spec.agg = rng.choice(["count", "ndocs"])
        if rng.random() < 0.5:
            spec.min_count = rng.randint(2, 6)
    elif draw < 0.6:
        spec.shape = "ngram_agg"
        spec.ngram_k = rng.choice([2, 3])
        if rng.random() < 0.5:
            spec.min_count = rng.randint(2, 4)
    elif draw < 0.8:
        spec.shape = "doc_stats"
    else:
        spec.shape = "token_topk"
        spec.topk = rng.randint(3, 25)
    return spec


def _tok_pred_df(spec: TextSpec):
    kind, v = spec.tok_pred
    t = F.col("token")
    if kind == "minlen":
        return F.length(t) >= v
    if kind == "maxlen":
        return F.length(t) <= v
    return t.like(f"{v}%")


def _tok_pred_sql(spec: TextSpec) -> str:
    kind, v = spec.tok_pred
    if kind == "minlen":
        return f"length(token) >= {v}"
    if kind == "maxlen":
        return f"length(token) <= {v}"
    return f"token LIKE '{v}%'"


def text_spec_to_df(spark: SparkSession, sf_dir: str, spec: TextSpec):
    from bigdataminingproject_spark.functions.text import (
        remove_stopwords,
        tokenize,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    for a in spec.doc_preds:
        docs = docs.filter(_atom_col(a))
    toks = tokenize(F.col("text"))
    if spec.stopwords:
        toks = remove_stopwords(toks)
    base = docs.select("doc_id", toks.alias("toks"))
    if spec.shape == "doc_stats":
        return base.select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
            F.md5(F.concat_ws(" ", "toks")).alias("tok_md5"),
        )
    if spec.shape == "ngram_agg":
        from bigdataminingproject_spark.functions.text import shingles

        rel = base.select(
            "doc_id",
            F.explode(shingles(F.col("toks"), spec.ngram_k)).alias(
                "shingle"
            ),
        )
        out = rel.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        if spec.min_count is not None:
            out = out.filter(F.col("cnt") >= spec.min_count)
        return out
    # token_agg / token_topk share the exploded token relation
    rel = base.select("doc_id", F.explode("toks").alias("token"))
    if spec.tok_pred is not None:
        rel = rel.filter(_tok_pred_df(spec))
    if spec.shape == "token_topk":
        return (
            rel.groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("token"))
            .limit(spec.topk)
        )
    agg = (
        F.count(F.lit(1)).alias("cnt")
        if spec.agg == "count"
        else F.countDistinct("doc_id").alias("cnt")
    )
    out = rel.groupBy("token").agg(agg)
    if spec.min_count is not None:
        out = out.filter(F.col("cnt") >= spec.min_count)
    return out


def text_spec_to_sql(spec: TextSpec) -> str:
    from bigdataminingproject_spark.functions.text import (
        ENGLISH_STOPWORDS,
        SKIPWORDS,
    )

    where = ""
    if spec.doc_preds:
        where = " WHERE " + " AND ".join(
            _atom_sql(a) for a in spec.doc_preds
        )
    toks = (
        "list_filter(string_split_regex(lower(text), '[^\\p{L}]+'), "
        "x -> x <> '')"
    )
    if spec.stopwords:
        stoplist = ", ".join(
            f"'{w}'" for w in sorted(set(ENGLISH_STOPWORDS) | set(SKIPWORDS))
        )
        toks = f"list_filter({toks}, x -> x NOT IN ({stoplist}))"
    base = (
        f"SELECT doc_id, {toks} AS toks FROM documents{where}"
    )
    if spec.shape == "doc_stats":
        return (
            "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
            "CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct, "
            "md5(array_to_string(toks, ' ')) AS tok_md5 "
            f"FROM ({base})"
        )
    having = (
        f" HAVING count(*) >= {spec.min_count}"
        if spec.min_count is not None
        else ""
    )
    if spec.shape == "ngram_agg":
        k = spec.ngram_k
        sh = (
            f"SELECT doc_id, unnest(list_transform("
            f"range(1, len(toks) - {k} + 2), "
            f"i -> array_to_string(toks[i : i + {k - 1}], ' '))) AS shingle "
            f"FROM ({base})"
        )
        return (
            f"SELECT shingle, CAST(count(*) AS BIGINT) AS cnt "
            f"FROM ({sh}) GROUP BY shingle{having}"
        )
    rel = f"SELECT doc_id, unnest(toks) AS token FROM ({base})"
    if spec.tok_pred is not None:
        rel = f"SELECT * FROM ({rel}) WHERE {_tok_pred_sql(spec)}"
    if spec.shape == "token_topk":
        return (
            f"SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM ({rel}) "
            f"GROUP BY token ORDER BY cnt DESC, token LIMIT {spec.topk}"
        )
    agg = "count(*)" if spec.agg == "count" else "count(DISTINCT doc_id)"
    # HAVING must gate the SAME aggregate the Spark side filters on
    # (first text-fuzz run caught exactly this: ndocs selected but
    # count(*) in HAVING — seed 77)
    agg_having = (
        f" HAVING {agg} >= {spec.min_count}"
        if spec.min_count is not None
        else ""
    )
    return (
        f"SELECT token, CAST({agg} AS BIGINT) AS cnt FROM ({rel}) "
        f"GROUP BY token{agg_having}"
    )


def run_text_case(spark, con, sf_dir: str, seed: int) -> tuple[int, str | None]:
    """Execute one text-surface fuzz case (same compare as run_case)."""
    spec = gen_text_spec(seed)
    sdf = text_spec_to_df(spark, sf_dir, spec)
    s_cols, s_mat = norm_matrix(sdf.columns, sdf.collect())
    cur = con.execute(text_spec_to_sql(spec))
    o_cols = [d[0] for d in cur.description]
    o_cols, o_mat = norm_matrix(o_cols, cur.fetchall())
    if s_cols != o_cols:
        return len(s_mat), f"text seed {seed}: schema {s_cols} vs {o_cols}"
    if s_mat != o_mat:
        only_s = [r for r in s_mat if r not in set(o_mat)][:3]
        only_o = [r for r in o_mat if r not in set(s_mat)][:3]
        return (
            len(s_mat),
            f"text seed {seed}: {len(s_mat)} vs {len(o_mat)} rows; "
            f"spark-only={only_s} oracle-only={only_o}; "
            f"sql={text_spec_to_sql(spec)}",
        )
    return len(s_mat), None
