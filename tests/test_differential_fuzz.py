"""Property-based DIFFERENTIAL fuzzing: random relational queries executed
by both engines from one AST.

The 237 registered queries each pin one hand-written plan against one
hand-written oracle; this suite closes the gap BETWEEN them — hypothesis
draws a query AST (filters -> optional lineitem⋈orders join -> group-bys
-> aggregates -> optional HAVING), a single renderer lowers it to BOTH a
Spark DataFrame plan and DuckDB SQL, and results must agree row-for-row
(relative float tolerance, order-insensitive). Any divergence hypothesis
finds, it shrinks to a minimal failing AST — a far better bug report than
a failed hash.

Runs at sf0.001 (6k lineitem) so the ~50 drawn examples stay in seconds;
the derandomized profile keeps CI deterministic.
"""

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
O_STR_COLS = ["o_orderstatus", "o_orderpriority"]
DATE_LITS = ["1996-01-01", "1997-06-15", "1998-09-02"]

# -- AST strategies -----------------------------------------------------------

num_pred = st.tuples(
    st.sampled_from(NUM_COLS),
    st.sampled_from(["<", ">", "<=", ">="]),
    st.floats(min_value=0.0, max_value=60.0, allow_nan=False).map(
        lambda x: round(x, 2)
    ),
).map(lambda t: ("num", *t))

str_pred = st.tuples(
    st.sampled_from(STR_COLS), st.sampled_from(["A", "N", "R", "O", "F"])
).map(lambda t: ("str", *t))

date_pred = st.tuples(
    st.sampled_from(["<", ">="]), st.sampled_from(DATE_LITS)
).map(lambda t: ("date", "l_shipdate", *t))

agg = st.tuples(
    st.sampled_from(["count", "sum", "avg", "min", "max"]),
    st.sampled_from(NUM_COLS),
)

ast = st.fixed_dictionaries(
    {
        "filters": st.lists(
            st.one_of(num_pred, str_pred, date_pred), max_size=2
        ),
        "join_orders": st.booleans(),
        "group_by": st.lists(
            st.sampled_from(STR_COLS + ["__okmod"]),
            max_size=2,
            unique=True,
        ),
        "aggs": st.lists(agg, min_size=1, max_size=3, unique=True),
        "having_min_count": st.one_of(
            st.none(), st.integers(min_value=1, max_value=5)
        ),
    }
)


# -- one renderer, two engines ------------------------------------------------


def _spark_query(spark, q):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = li
    if q["join_orders"]:
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        df = df.join(orders, df.l_orderkey == orders.o_orderkey)
    for p in q["filters"]:
        if p[0] == "num":
            _, c, op, v = p
            df = df.filter(F.expr(f"{c} {op} {v!r}"))
        elif p[0] == "str":
            _, c, v = p
            df = df.filter(F.col(c) == v)
        else:
            _, c, op, v = p
            df = df.filter(
                F.expr(f"{c} {op} TIMESTAMP_NTZ '{v} 00:00:00'")
            )
    gcols = [
        (F.pmod(F.col("l_orderkey"), F.lit(7)).alias("__okmod"))
        if g == "__okmod"
        else F.col(g)
        for g in q["group_by"]
    ]
    aggs = []
    for fn, c in q["aggs"]:
        name = f"{fn}_{c}"
        if fn == "count":
            aggs.append(F.count(F.col(c)).cast("long").alias(name))
        else:
            aggs.append(getattr(F, fn)(F.col(c)).cast("double").alias(name))
    if q["having_min_count"] is not None:
        aggs.append(F.count(F.lit(1)).cast("long").alias("__n"))
    out = df.groupBy(*gcols).agg(*aggs) if gcols else df.agg(*aggs)
    if q["having_min_count"] is not None:
        out = out.filter(F.col("__n") >= q["having_min_count"]).drop("__n")
    return out


def _duck_sql(q):
    frm = "lineitem"
    if q["join_orders"]:
        frm = "lineitem JOIN orders ON l_orderkey = o_orderkey"
    wheres = []
    for p in q["filters"]:
        if p[0] == "num":
            _, c, op, v = p
            wheres.append(f"{c} {op} {v!r}")
        elif p[0] == "str":
            _, c, v = p
            wheres.append(f"{c} = '{v}'")
        else:
            _, c, op, v = p
            wheres.append(f"{c} {op} TIMESTAMP '{v} 00:00:00'")
    where = (" WHERE " + " AND ".join(wheres)) if wheres else ""
    gexprs = [
        "CAST(l_orderkey % 7 AS BIGINT) AS __okmod" if g == "__okmod" else g
        for g in q["group_by"]
    ]
    sels = list(gexprs)
    for fn, c in q["aggs"]:
        cast = "BIGINT" if fn == "count" else "DOUBLE"
        sels.append(f"CAST({fn}({c}) AS {cast}) AS {fn}_{c}")
    having = ""
    if q["having_min_count"] is not None:
        having = f" HAVING count(*) >= {q['having_min_count']}"
    group = (
        " GROUP BY " + ", ".join(str(i + 1) for i in range(len(gexprs)))
        if gexprs
        else ""
    )
    return f"SELECT {', '.join(sels)} FROM {frm}{where}{group}{having}"


def _normalize(rows, n_group):
    """(sorted tuples; group keys exact, aggregates kept as floats)."""
    out = []
    for r in rows:
        vals = list(r)
        key = tuple(str(v) for v in vals[:n_group])
        out.append((key, vals[n_group:]))
    return sorted(out, key=lambda kv: kv[0])


def _agree(a, b):
    if len(a) != len(b):
        return False, f"row counts {len(a)} vs {len(b)}"
    for (ka, va), (kb, vb) in zip(a, b):
        if ka != kb:
            return False, f"group keys {ka} vs {kb}"
        for x, y in zip(va, vb):
            if x is None or y is None:
                if x is not y:
                    return False, f"null mismatch {x} vs {y} in {ka}"
            elif not math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9):
                return False, f"{x} vs {y} in group {ka}"
    return True, ""


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    for extra in ("customer", "supplier", "part"):  # grammar 7 dims
        con.execute(
            f"CREATE VIEW {extra} AS SELECT * FROM read_parquet('{SF_DIR}/{extra}.parquet')"
        )
    yield con
    con.close()


@settings(
    max_examples=50,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=ast)
def test_random_relational_queries_agree(spark, duck, q):
    sdf = _spark_query(spark, q)
    srows = [tuple(r) for r in sdf.collect()]
    drows = [tuple(r) for r in duck.execute(_duck_sql(q)).fetchall()]
    ok, why = _agree(
        _normalize(srows, len(q["group_by"])),
        _normalize(drows, len(q["group_by"])),
    )
    assert ok, f"{why}\nAST: {q}\nSQL: {_duck_sql(q)}"


# -- property 2: window functions ---------------------------------------------

WIN_FUNCS = [
    "row_number", "rank", "dense_rank", "lag", "lead", "sum", "avg", "min",
    "max", "count",
]

win_ast = st.fixed_dictionaries(
    {
        "partition": st.sampled_from(
            ["o_orderstatus", "o_orderpriority", "__ckmod", None]
        ),
        "order_col": st.sampled_from(["o_totalprice", "o_orderdate"]),
        "desc": st.booleans(),
        "func": st.sampled_from(WIN_FUNCS),
        "frame_preceding": st.integers(min_value=0, max_value=5),
        "filter_status": st.sampled_from([None, "O", "F"]),
    }
)


def _spark_win(spark, q):
    from pyspark.sql.window import Window

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "__ckmod", F.pmod(F.col("o_custkey"), F.lit(5))
    )
    if q["filter_status"]:
        df = df.filter(F.col("o_orderstatus") == q["filter_status"])
    order = [
        F.desc(q["order_col"]) if q["desc"] else F.asc(q["order_col"]),
        F.asc("o_orderkey"),  # total order: deterministic across engines
    ]
    w = (
        Window.partitionBy(q["partition"]) if q["partition"] else Window.partitionBy()
    ).orderBy(*order)
    fn = q["func"]
    if fn in ("row_number", "rank", "dense_rank"):
        expr = getattr(F, fn)().over(w).cast("long")
    elif fn in ("lag", "lead"):
        expr = getattr(F, fn)(F.col("o_totalprice"), 1).over(w).cast("double")
    else:
        wf = w.rowsBetween(-q["frame_preceding"], Window.currentRow)
        col = F.col("o_totalprice")
        expr = (
            F.count(col).over(wf).cast("long")
            if fn == "count"
            else getattr(F, fn)(col).over(wf).cast("double")
        )
    return df.select(
        "o_orderkey", expr.alias("w")
    )


def _duck_win_sql(q):
    where = (
        f"WHERE o_orderstatus = '{q['filter_status']}'"
        if q["filter_status"]
        else ""
    )
    part = (
        "PARTITION BY "
        + (
            "CAST(o_custkey % 5 AS BIGINT)"
            if q["partition"] == "__ckmod"
            else q["partition"]
        )
        if q["partition"]
        else ""
    )
    order = f"ORDER BY {q['order_col']} {'DESC' if q['desc'] else 'ASC'}, o_orderkey ASC"
    fn = q["func"]
    if fn in ("row_number", "rank", "dense_rank"):
        call, cast = f"{fn}()", "BIGINT"
        frame = ""
    elif fn in ("lag", "lead"):
        call, cast = f"{fn}(o_totalprice, 1)", "DOUBLE"
        frame = ""
    else:
        call = f"{fn}(o_totalprice)"
        cast = "BIGINT" if fn == "count" else "DOUBLE"
        frame = f" ROWS BETWEEN {q['frame_preceding']} PRECEDING AND CURRENT ROW"
    return (
        f"SELECT o_orderkey, CAST({call} OVER ({part} {order}{frame}) AS {cast}) AS w "
        f"FROM orders {where}"
    )


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=win_ast)
def test_random_window_functions_agree(spark, duck, q):
    srows = {r[0]: r[1] for r in _spark_win(spark, q).collect()}
    drows = {r[0]: r[1] for r in duck.execute(_duck_win_sql(q)).fetchall()}
    assert len(srows) == len(drows), (len(srows), len(drows), q)
    bad = []
    for k, sv in srows.items():
        dv = drows.get(k)
        if sv is None or dv is None:
            if sv is not dv:
                bad.append((k, sv, dv))
        elif not math.isclose(float(sv), float(dv), rel_tol=1e-9, abs_tol=1e-9):
            bad.append((k, sv, dv))
    assert not bad, f"{bad[:5]}\nAST: {q}\nSQL: {_duck_win_sql(q)}"


# -- property 3: join + window + aggregate COMPOSITIONS over two tables --------
# (round-6 verdict #7: the grammar above is single-table heavy; this one
# composes the three operator families the registry exercises separately:
# a lineitem⋈orders join — LEFT against a filtered right side, so null
# keys flow through —, a window over the joined frame with a total
# tie-broken order, an optional rank cap, then a grouped aggregate that
# consumes both base and window columns.)

jwa_ast = st.fixed_dictionaries(
    {
        "right_filter": st.sampled_from([None, "O", "F", "P"]),
        "join_type": st.sampled_from(["inner", "left"]),
        "win_func": st.sampled_from(["row_number", "rank", "sum", "lag"]),
        "win_part": st.sampled_from(
            ["l_returnflag", "o_orderstatus", "__okmod"]
        ),
        "desc": st.booleans(),
        "rank_cap": st.one_of(
            st.none(), st.integers(min_value=1, max_value=20)
        ),
        "group_by": st.sampled_from(
            ["l_linestatus", "o_orderpriority", "l_returnflag", None]
        ),
        "agg": st.sampled_from(["count", "sum", "avg", "max"]),
    }
)

_JW_ORDER = ["l_extendedprice", "l_orderkey", "l_linenumber"]  # total order


def _spark_jwa(spark, q):
    from pyspark.sql.window import Window

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    if q["right_filter"]:
        orders = orders.filter(F.col("o_orderstatus") == q["right_filter"])
    df = li.join(orders, li.l_orderkey == orders.o_orderkey, q["join_type"])
    df = df.withColumn("__okmod", F.pmod(F.col("l_orderkey"), F.lit(7)))
    order = [
        F.desc("l_extendedprice") if q["desc"] else F.asc("l_extendedprice"),
        F.asc("l_orderkey"),
        F.asc("l_linenumber"),
    ]
    w = Window.partitionBy(q["win_part"]).orderBy(*order)
    fn = q["win_func"]
    if fn in ("row_number", "rank"):
        wcol = getattr(F, fn)().over(w).cast("double")
    elif fn == "lag":
        wcol = F.lag(F.col("l_extendedprice"), 1).over(w).cast("double")
    else:
        wcol = (
            F.sum("l_extendedprice")
            .over(w.rowsBetween(-2, 0))
            .cast("double")
        )
    df = df.withColumn("w", wcol)
    if q["rank_cap"] is not None and fn in ("row_number", "rank"):
        df = df.filter(F.col("w") <= q["rank_cap"])
    a = q["agg"]
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.count(F.col("l_quantity")).cast("long")
            if a == "count"
            else getattr(F, a)(F.col("l_quantity")).cast("double")
        ).alias("a_q"),
        F.sum("w").cast("double").alias("sw"),
    ]
    g = q["group_by"]
    return df.groupBy(F.col(g)).agg(*aggs) if g else df.agg(*aggs)


def _duck_jwa_sql(q):
    right = "SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders"
    if q["right_filter"]:
        right += f" WHERE o_orderstatus = '{q['right_filter']}'"
    jt = "JOIN" if q["join_type"] == "inner" else "LEFT JOIN"
    part = (
        "CAST(l_orderkey % 7 AS BIGINT)"
        if q["win_part"] == "__okmod"
        else q["win_part"]
    )
    order = (
        f"l_extendedprice {'DESC' if q['desc'] else 'ASC'},"
        " l_orderkey ASC, l_linenumber ASC"
    )
    fn = q["win_func"]
    if fn in ("row_number", "rank"):
        call, frame = f"{fn}()", ""
    elif fn == "lag":
        call, frame = "lag(l_extendedprice, 1)", ""
    else:
        call = "sum(l_extendedprice)"
        frame = " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"
    wd = (
        f"SELECT l.*, o_orderstatus, o_orderpriority, "
        f"CAST({call} OVER (PARTITION BY {part} ORDER BY {order}{frame})"
        f" AS DOUBLE) AS w "
        f"FROM lineitem l {jt} ({right}) o ON l_orderkey = o_orderkey"
    )
    where = ""
    if q["rank_cap"] is not None and fn in ("row_number", "rank"):
        where = f" WHERE w <= {q['rank_cap']}"
    a = q["agg"]
    a_q = (
        "CAST(count(l_quantity) AS BIGINT)"
        if a == "count"
        else f"CAST({a}(l_quantity) AS DOUBLE)"
    )
    g = q["group_by"]
    sels = ([g] if g else []) + [
        "CAST(count(*) AS BIGINT) AS n",
        f"{a_q} AS a_q",
        "CAST(sum(w) AS DOUBLE) AS sw",
    ]
    group = " GROUP BY 1" if g else ""
    return f"SELECT {', '.join(sels)} FROM ({wd}){where}{group}"


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=jwa_ast)
def test_join_window_agg_compositions_agree(spark, duck, q):
    sdf = _spark_jwa(spark, q)
    srows = [tuple(r) for r in sdf.collect()]
    drows = [tuple(r) for r in duck.execute(_duck_jwa_sql(q)).fetchall()]
    n_group = 1 if q["group_by"] else 0
    ok, why = _agree(
        _normalize(srows, n_group), _normalize(drows, n_group)
    )
    assert ok, f"{why}\nAST: {q}\nSQL: {_duck_jwa_sql(q)}"


# -- property 4: set operations with duplicate semantics ------------------------
# (round-6 verdict #7: UNION/INTERSECT/EXCEPT x {ALL, DISTINCT} over two or
# three branches — lineitem projected to a deliberately low-cardinality
# (string, bigint) shape so INTERSECT/EXCEPT overlap is dense and ALL-vs-
# DISTINCT multiplicities actually differ; the optional orders branch
# overlaps on l_linestatus/o_orderstatus = {O, F} and a shared mod-40 id.
# Spark's DataFrame names are a known trap this property pins down:
# union() IS union-all, subtract() is EXCEPT DISTINCT, exceptAll/
# intersectAll carry SQL's ALL bag semantics.)

SET_OPS = [
    "union_all", "union", "intersect", "intersect_all", "except",
    "except_all",
]

_branch = st.fixed_dictionaries(
    {
        "source": st.sampled_from(["lineitem", "orders"]),
        "c1": st.sampled_from(["flag", "status"]),  # lineitem only
        "qty_max": st.integers(min_value=1, max_value=50),
    }
)

setop_ast = st.fixed_dictionaries(
    {
        "left": _branch,
        "right": _branch,
        "op": st.sampled_from(SET_OPS),
        "chain": st.one_of(
            st.none(),
            st.tuples(st.sampled_from(SET_OPS), _branch),
        ),
    }
)


def _spark_setop_branch(spark, b):
    if b["source"] == "orders":
        df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        return df.select(
            F.col("o_orderstatus").alias("c1"),
            (F.pmod(F.col("o_orderkey"), F.lit(40)) + F.lit(1))
            .cast("long")
            .alias("c2"),
        ).filter(F.col("c2") <= b["qty_max"])
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    c1 = "l_returnflag" if b["c1"] == "flag" else "l_linestatus"
    return df.filter(F.col("l_quantity") <= b["qty_max"]).select(
        F.col(c1).alias("c1"),
        F.col("l_quantity").cast("long").alias("c2"),
    )


def _spark_setop_apply(a, b, op):
    if op == "union_all":
        return a.unionAll(b)
    if op == "union":
        return a.union(b).distinct()
    if op == "intersect":
        return a.intersect(b)
    if op == "intersect_all":
        return a.intersectAll(b)
    if op == "except":
        return a.subtract(b)
    return a.exceptAll(b)


def _spark_setop(spark, q):
    out = _spark_setop_apply(
        _spark_setop_branch(spark, q["left"]),
        _spark_setop_branch(spark, q["right"]),
        q["op"],
    )
    if q["chain"] is not None:
        op2, third = q["chain"]
        out = _spark_setop_apply(
            out, _spark_setop_branch(spark, third), op2
        )
    return out


_SETOP_SQL = {
    "union_all": "UNION ALL",
    "union": "UNION",
    "intersect": "INTERSECT",
    "intersect_all": "INTERSECT ALL",
    "except": "EXCEPT",
    "except_all": "EXCEPT ALL",
}


def _duck_setop_branch(b):
    if b["source"] == "orders":
        return (
            "SELECT o_orderstatus AS c1, "
            "CAST(o_orderkey % 40 + 1 AS BIGINT) AS c2 FROM orders "
            f"WHERE o_orderkey % 40 + 1 <= {b['qty_max']}"
        )
    c1 = "l_returnflag" if b["c1"] == "flag" else "l_linestatus"
    return (
        f"SELECT {c1} AS c1, CAST(l_quantity AS BIGINT) AS c2 "
        f"FROM lineitem WHERE l_quantity <= {b['qty_max']}"
    )


def _duck_setop_sql(q):
    sql = (
        f"({_duck_setop_branch(q['left'])}) {_SETOP_SQL[q['op']]} "
        f"({_duck_setop_branch(q['right'])})"
    )
    if q["chain"] is not None:
        op2, third = q["chain"]
        sql = f"({sql}) {_SETOP_SQL[op2]} ({_duck_setop_branch(third)})"
    return sql


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=setop_ast)
def test_set_operations_agree(spark, duck, q):
    srows = sorted(tuple(r) for r in _spark_setop(spark, q).collect())
    drows = sorted(
        tuple(r) for r in duck.execute(_duck_setop_sql(q)).fetchall()
    )
    assert srows == drows, (
        f"multiset mismatch ({len(srows)} vs {len(drows)} rows; first "
        f"delta {next((p for p in zip(srows, drows) if p[0] != p[1]), None)})"
        f"\nAST: {q}\nSQL: {_duck_setop_sql(q)}"
    )


# -- property 5: correlated EXISTS / NOT EXISTS / IN / NOT IN subqueries --------
# (round-6 verdict #7, second family: three-valued NOT IN logic is where
# engines diverge most, so the key expressions inject NULLs via
# nullif(key % P, v) on BOTH sides. EXISTS/NOT EXISTS lower to DataFrame
# semi/anti joins with an optional extra correlated predicate; IN lowers to
# an equality semi join (identical semantics — NULL never equals); NOT IN
# deliberately goes through spark.sql so Catalyst's null-aware anti-join
# planning is what's differentially tested against DuckDB.)

SUBQ_MOD = 11

subq_ast = st.fixed_dictionaries(
    {
        "flavor": st.sampled_from(["exists", "not_exists", "in", "not_in"]),
        "outer_status": st.sampled_from([None, "O", "F", "P"]),
        "outer_null": st.sampled_from([None, 0, 3, 7]),
        "inner_null": st.sampled_from([None, 0, 3, 7]),
        "inner_qty": st.sampled_from([0, 10, 30, 49, 999]),  # 999 => empty
        "corr_pred": st.booleans(),  # exists flavors only
    }
)


def _subq_views(spark):
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView(
        "fuzz_orders"
    )
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView(
        "fuzz_lineitem"
    )


def _key_expr(col, null_at, dialect):
    mod = f"{col} % {SUBQ_MOD}" if dialect == "duck" else None
    if dialect == "duck":
        base = f"CAST({mod} AS BIGINT)"
        return base if null_at is None else f"nullif({base}, {null_at})"
    e = F.pmod(F.col(col), F.lit(SUBQ_MOD)).cast("long")
    if null_at is not None:
        e = F.when(e == null_at, F.lit(None).cast("long")).otherwise(e)
    return e


def _spark_subq(spark, q):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F.col("l_quantity") > q["inner_qty"]
    )
    if q["outer_status"]:
        orders = orders.filter(F.col("o_orderstatus") == q["outer_status"])
    out_cols = [
        F.col("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    ]
    if q["flavor"] in ("exists", "not_exists"):
        cond = li.l_orderkey == orders.o_orderkey
        if q["corr_pred"]:
            cond = cond & (li.l_extendedprice < orders.o_totalprice * 0.5)
        jt = "left_semi" if q["flavor"] == "exists" else "left_anti"
        return orders.join(li, cond, jt).select(*out_cols)
    outer = orders.withColumn(
        "__ok", _key_expr("o_orderkey", q["outer_null"], "spark")
    )
    if q["flavor"] == "in":
        inner = li.select(
            _key_expr("l_orderkey", q["inner_null"], "spark").alias("__ik")
        )
        return outer.join(
            inner, outer["__ok"] == inner["__ik"], "left_semi"
        ).select(*out_cols)
    # NOT IN: spark.sql => Catalyst null-aware anti join
    _subq_views(spark)
    ok_sql = _key_expr("o_orderkey", q["outer_null"], "duck")
    ik_sql = _key_expr("l_orderkey", q["inner_null"], "duck")
    where = [
        f"{ok_sql} NOT IN (SELECT {ik_sql} FROM fuzz_lineitem "
        f"WHERE l_quantity > {q['inner_qty']})"
    ]
    if q["outer_status"]:
        where.append(f"o_orderstatus = '{q['outer_status']}'")
    return spark.sql(
        "SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice "
        f"FROM fuzz_orders WHERE {' AND '.join(where)}"
    )


def _duck_subq_sql(q):
    inner_from = f"lineitem WHERE l_quantity > {q['inner_qty']}"
    if q["flavor"] in ("exists", "not_exists"):
        corr = ["l_orderkey = o_orderkey"]
        if q["corr_pred"]:
            corr.append("l_extendedprice < o_totalprice * 0.5")
        sub = f"SELECT 1 FROM {inner_from} AND {' AND '.join(corr)}"
        neg = "NOT " if q["flavor"] == "not_exists" else ""
        pred = f"{neg}EXISTS ({sub})"
    else:
        ok_sql = _key_expr("o_orderkey", q["outer_null"], "duck")
        ik_sql = _key_expr("l_orderkey", q["inner_null"], "duck")
        neg = "NOT " if q["flavor"] == "not_in" else ""
        pred = f"{ok_sql} {neg}IN (SELECT {ik_sql} FROM {inner_from})"
    where = [pred]
    if q["outer_status"]:
        where.append(f"o_orderstatus = '{q['outer_status']}'")
    return (
        "SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice "
        f"FROM orders WHERE {' AND '.join(where)}"
    )


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=subq_ast)
def test_subquery_predicates_agree(spark, duck, q):
    srows = sorted(tuple(r) for r in _spark_subq(spark, q).collect())
    drows = sorted(
        tuple(r) for r in duck.execute(_duck_subq_sql(q)).fetchall()
    )
    assert srows == drows, (
        f"row sets differ ({len(srows)} vs {len(drows)})"
        f"\nAST: {q}\nSQL: {_duck_subq_sql(q)}"
    )


# -- property 6: DISTINCT aggregates x FILTER x ROLLUP/CUBE ---------------------
# (Spark plans multi-DISTINCT aggregates through an Expand rewrite — one
# projected copy of the input per distinct group — and ROLLUP/CUBE through a
# second Expand with grouping-id bits; conditional aggregates lower FILTER to
# CASE inputs. Three pieces of genuinely different machinery from DuckDB's
# direct hash aggregation, composed randomly here. A nullable group key
# (nullif) forces the grouping(expr) disambiguation between "NULL because
# rolled up" and "NULL because the key is NULL".)

GROUP_EXPRS = ["flag", "status", "nullable_key"]

AGG6 = [
    "count_star",
    "count_distinct_supp",
    "count_distinct_part",
    "sum_distinct_qty",
    "count_filter_r",
    "sum_filter_price",
    "avg_disc",
]

agg6_ast = st.fixed_dictionaries(
    {
        "groups": st.lists(
            st.sampled_from(GROUP_EXPRS), min_size=1, max_size=2, unique=True
        ),
        "mode": st.sampled_from(["plain", "rollup", "cube"]),
        "aggs": st.lists(
            st.sampled_from(AGG6), min_size=1, max_size=4, unique=True
        ),
        "qty_cap": st.sampled_from([None, 10, 30, 49]),
    }
)


def _g6_spark_expr(name):
    if name == "flag":
        return F.col("l_returnflag")
    if name == "status":
        return F.col("l_linestatus")
    e = F.pmod(F.col("l_suppkey"), F.lit(7)).cast("long")
    return F.when(e == 3, F.lit(None).cast("long")).otherwise(e)


def _g6_duck_expr(name):
    if name == "flag":
        return "l_returnflag"
    if name == "status":
        return "l_linestatus"
    return "nullif(CAST(l_suppkey % 7 AS BIGINT), 3)"


_AGG6_SPARK = {
    "count_star": lambda: F.count(F.lit(1)),
    "count_distinct_supp": lambda: F.countDistinct("l_suppkey"),
    "count_distinct_part": lambda: F.countDistinct("l_partkey"),
    "sum_distinct_qty": lambda: F.sum_distinct(F.col("l_quantity")),
    "count_filter_r": lambda: F.count(
        F.when(F.col("l_returnflag") == "R", F.lit(1))
    ),
    "sum_filter_price": lambda: F.sum(
        F.when(F.col("l_quantity") < 25, F.col("l_extendedprice"))
    ),
    "avg_disc": lambda: F.avg("l_discount"),
}

_AGG6_DUCK = {
    "count_star": "count(*)",
    "count_distinct_supp": "count(DISTINCT l_suppkey)",
    "count_distinct_part": "count(DISTINCT l_partkey)",
    "sum_distinct_qty": "sum(DISTINCT l_quantity)",
    "count_filter_r": "count(*) FILTER (l_returnflag = 'R')",
    "sum_filter_price": "sum(l_extendedprice) FILTER (l_quantity < 25)",
    "avg_disc": "avg(l_discount)",
}


def _spark_agg6(spark, q):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    if q["qty_cap"] is not None:
        df = df.filter(F.col("l_quantity") <= q["qty_cap"])
    gcols = [_g6_spark_expr(g).alias(f"g_{g}") for g in q["groups"]]
    base = df.select(
        *gcols, "l_suppkey", "l_partkey", "l_quantity", "l_returnflag",
        "l_extendedprice", "l_discount",
    )
    names = [f"g_{g}" for g in q["groups"]]
    if q["mode"] == "rollup":
        grouped = base.rollup(*names)
    elif q["mode"] == "cube":
        grouped = base.cube(*names)
    else:
        grouped = base.groupBy(*names)
    sels = [_AGG6_SPARK[a]().alias(a) for a in q["aggs"]]
    if q["mode"] != "plain":
        # grouping() bits disambiguate rolled-up NULLs from NULL keys;
        # they are part of the row identity, so they sit with the keys.
        sels = [
            F.grouping(n).cast("long").alias(f"is_rollup_{n}") for n in names
        ] + sels
    return grouped.agg(*sels)


def _duck_agg6_sql(q):
    exprs = [_g6_duck_expr(g) for g in q["groups"]]
    names = [f"g_{g}" for g in q["groups"]]
    sels = [f"{e} AS {n}" for e, n in zip(exprs, names)]
    if q["mode"] != "plain":
        # GROUPING needs the raw grouping expression (aliases don't bind)
        sels += [
            f"CAST(GROUPING({e}) AS BIGINT) AS is_rollup_{n}"
            for e, n in zip(exprs, names)
        ]
    sels += [f"{_AGG6_DUCK[a]} AS {a}" for a in q["aggs"]]
    where = (
        f" WHERE l_quantity <= {q['qty_cap']}" if q["qty_cap"] is not None else ""
    )
    by = ", ".join(exprs)
    group = {
        "plain": f" GROUP BY {by}",
        "rollup": f" GROUP BY ROLLUP ({by})",
        "cube": f" GROUP BY CUBE ({by})",
    }[q["mode"]]
    return f"SELECT {', '.join(sels)} FROM lineitem{where}{group}"


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=agg6_ast)
def test_distinct_filter_rollup_aggregates_agree(spark, duck, q):
    n_key = len(q["groups"]) * (2 if q["mode"] != "plain" else 1)
    sdf = _spark_agg6(spark, q)
    # align column order: spark emits keys implicitly first
    srows = [tuple(r) for r in sdf.collect()]
    drows = [tuple(r) for r in duck.execute(_duck_agg6_sql(q)).fetchall()]
    ok, why = _agree(_normalize(srows, n_key), _normalize(drows, n_key))
    assert ok, f"{why}\nAST: {q}\nSQL: {_duck_agg6_sql(q)}"


# -- grammar 7: same-TEXT SQL (correlated LATERAL top-k / recursive CTE) ------
#
# Grammars 1-6 lower one AST through TWO renderers (DataFrame + SQL); this
# one exercises the SQL FRONT ENDS on identical text — any disagreement is
# an engine-semantics divergence in decorrelation (LATERAL + ORDER BY +
# LIMIT) or fixpoint iteration (WITH RECURSIVE), the two surfaces pinned by
# the sql_interface_* registry queries.

_LAT_PAIRS = [
    # (dim table, dim key, fact table, fk, value cols, unique tie-break cols)
    ("customer", "c_custkey", "orders", "o_custkey",
     ["o_totalprice"], ["o_orderkey"]),
    ("supplier", "s_suppkey", "lineitem", "l_suppkey",
     ["l_extendedprice", "l_quantity"], ["l_orderkey", "l_linenumber"]),
]

_TREE_TABS = [("part", "p_partkey"), ("customer", "c_custkey")]

sql7_ast = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["lateral", "recursive"]),
        "pair": st.integers(min_value=0, max_value=1),
        "val_idx": st.integers(min_value=0, max_value=1),
        "desc": st.booleans(),
        "k": st.integers(min_value=1, max_value=3),
        "dim_mod": st.one_of(st.none(), st.integers(min_value=2, max_value=7)),
        "fanout": st.integers(min_value=2, max_value=4),
        "depth_cap": st.integers(min_value=2, max_value=7),
        "tree_tab": st.integers(min_value=0, max_value=1),
    }
)


def _sql7(q) -> str:
    if q["kind"] == "lateral":
        dim, dk, fact, fk, vals, ties = _LAT_PAIRS[q["pair"]]
        val = vals[q["val_idx"] % len(vals)]
        direction = "DESC" if q["desc"] else "ASC"
        tie = ", ".join(f"f.{c}" for c in ties)
        tie_sel = ", ".join(f"f.{c} AS {c}" for c in ties)
        flt = f" WHERE {dk} % {q['dim_mod']} = 1" if q["dim_mod"] else ""
        return f"""
        WITH cs AS (SELECT {dk} FROM {dim}{flt})
        SELECT cs.{dk} AS dim_key, l.*
        FROM cs, LATERAL (
          SELECT f.{val} AS v, {tie_sel}
          FROM {fact} f WHERE f.{fk} = cs.{dk}
          ORDER BY f.{val} {direction}, {tie}
          LIMIT {q['k']}
        ) l
        """
    tab, key = _TREE_TABS[q["tree_tab"]]
    return f"""
    WITH RECURSIVE walk AS (
      SELECT CAST(1 AS BIGINT) AS nodekey, 0 AS depth
      UNION ALL
      SELECT t.{key} AS nodekey, w.depth + 1 AS depth
      FROM walk w
      JOIN {tab} t ON CAST(floor(t.{key} / {q['fanout']}.0) AS BIGINT) = w.nodekey
      WHERE t.{key} > 1 AND w.depth < {q['depth_cap']}
    )
    SELECT depth, count(*) AS n_nodes, min(nodekey) AS min_key, max(nodekey) AS max_key
    FROM walk GROUP BY depth
    """


def _t7_agree(srows, drows):
    if len(srows) != len(drows):
        return False, f"row-count {len(srows)} vs {len(drows)}"
    for a, b in zip(sorted(srows), sorted(drows)):
        for x, y in zip(a, b):
            if isinstance(x, float) or isinstance(y, float):
                if not math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9):
                    return False, f"value {x} vs {y} in {a} / {b}"
            elif x != y:
                return False, f"value {x} vs {y} in {a} / {b}"
    return True, ""


def _check_sql7(spark, duck, q):
    from healthcare_etl_pipeline_spark.catalog import register_views

    register_views(spark, SF_DIR)
    sql = _sql7(q)
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    drows = [tuple(r) for r in duck.execute(sql).fetchall()]
    return _t7_agree(srows, drows)


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=sql7_ast)
def test_same_text_lateral_recursive_agree(spark, duck, q):
    ok, why = _check_sql7(spark, duck, q)
    assert ok, f"{why}\nAST: {q}\nSQL: {_sql7(q)}"
