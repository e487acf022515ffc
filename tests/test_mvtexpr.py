"""mvtexpr: the mapnik filter-expression compiler.

Three implementations of one pinned semantics (module doc of
functions/mvtexpr.py): the Spark render, the DuckDB render (exercised
by the q_mapnik_expr oracle pair), and the pure-Python spec evaluator.
Here the Python evaluator is the ground truth against the Spark render
row-by-row on a corpus with NULLs, and the parser/semantic edges are
pinned directly.
"""

import duckdb
import pytest

from mapnik_vector_tile_spark.functions import mvtexpr as X


# --------------------------------------------------------------- parser


def test_parse_precedence_arith():
    # * binds over +, % at * level, comparison above and/or
    ast = X.parse("[a] + 2 * 3 % 4 = 5 and [b] < 1 or not [c] > 2")
    assert ast == (
        "bin", "or",
        ("bin", "and",
         ("bin", "=",
          ("bin", "+", ("attr", "a"),
           ("bin", "%", ("bin", "*", ("int", 2), ("int", 3)), ("int", 4))),
          ("int", 5)),
         ("bin", "<", ("attr", "b"), ("int", 1))),
        ("not", ("bin", ">", ("attr", "c"), ("int", 2))),
    )


def test_parse_word_operators_and_symbols():
    # mapnik word forms are aliases of the symbol forms
    assert X.parse("[a] eq 1") == X.parse("[a] = 1")
    assert X.parse("[a] is 1") == X.parse("[a] = 1")
    assert X.parse("[a] neq 1") == X.parse("[a] != 1")
    assert X.parse("[a] <> 1") == X.parse("[a] != 1")
    assert X.parse("[a] gt 1 && [b] le 2") == X.parse("[a] > 1 and [b] <= 2")
    assert X.parse("![a] = 1 || [b] ge 2") == X.parse(
        "not [a] = 1 or [b] >= 2"
    )


def test_parse_literals_and_match():
    ast = X.parse("[name].match('San.*') and [x] = 2.5 and [ok] = true "
                  "and [gone] = null and [s] = 'it''s not' ")
    # note: backslash escape form also supported
    assert X.parse(r"[s] = 'it\'s not'") == X.parse("[s] = 'it''s not'")
    kinds = []

    def walk(a):
        kinds.append(a[0])
        for c in a[1:]:
            if isinstance(c, tuple):
                walk(c)

    walk(ast)
    assert "match" in kinds and "float" in kinds and "null" in kinds


def test_parse_errors():
    for bad in ("[a] = ", "= 1", "[a] blah 1", "[a", "(1 + 2", "1 2",
                "[a].match(1)", "[a] = 'x"):
        with pytest.raises(ValueError):
            X.parse(bad)


def test_cmp_non_associative():
    # mapnik comparisons do not chain: a = b = c is a parse error
    with pytest.raises(ValueError):
        X.parse("[a] = [b] = [c]")


# ------------------------------------------------- semantics (3 impls)

CORPUS = [
    {"a": 7, "b": "JUMBO PKG", "c": 2.5, "d": None},
    {"a": -7, "b": "jumbo pkg", "c": 0.0, "d": 1},
    {"a": 45, "b": None, "c": -1.25, "d": 0},
    {"a": 0, "b": "WRAP CASE", "c": 11.5, "d": None},
    {"a": None, "b": "JUMBO CAN", "c": None, "d": 3},
]

EXPRS = [
    "[a] = 45",
    "[a] = null",
    "not [a] = null",
    "[a] != null",
    "not [a] > 5",              # null a -> cmp FALSE -> not -> TRUE
    "[a] < 0 or [a] >= 45",
    "[b].match('JUMBO .*')",
    "not [b].match('JUMBO .*')",
    "([a] + 3) * 7 % 5 < 3",
    "(-[a]) % 5 = -2",          # signed remainder, dividend sign
    "[a] / 4 > 11.0",           # true division
    "[c] <= 2.5 and [d] != null",
    "[a] = 45 or [b] = null and [d] = 3",  # and binds over or
]


def _duck_eval(src: str, rows: list[dict]) -> list[bool]:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%s, %s, %s, %s)" % (
                "NULL" if r["a"] is None else r["a"],
                "NULL" if r["b"] is None else "'%s'" % r["b"],
                "NULL" if r["c"] is None else repr(r["c"]),
                "NULL" if r["d"] is None else r["d"],
            )
            for r in rows
        )
        + ') AS v("a", "b", "c", "d")'
    )
    sql = X.predicate_sql(src, "duckdb")
    out = con.execute(f"SELECT {sql} FROM t").fetchall()
    con.close()
    return [bool(v[0]) for v in out]


def test_python_vs_duckdb_eval():
    # the spec evaluator and the DuckDB render agree on every corpus
    # row for every expression (the Spark render is gated against the
    # same corpus shape by q_mapnik_expr's oracle at driver scale)
    for src in EXPRS:
        ast = X.parse(src)
        py = [bool(X.evaluate(ast, r) or False) for r in CORPUS]
        dk = _duck_eval(src, CORPUS)
        assert py == dk, f"{src}: python={py} duckdb={dk}"


def test_spark_render_matches_python(spark):
    sdf = spark.createDataFrame(
        [(r["a"], r["b"], r["c"], r["d"]) for r in CORPUS],
        "a int, b string, c double, d int",
    )
    from pyspark.sql import functions as F

    sel = [
        F.expr(X.predicate_sql(src, "spark")).alias(f"e{i}")
        for i, src in enumerate(EXPRS)
    ]
    got = sdf.select(*sel).collect()
    for i, src in enumerate(EXPRS):
        ast = X.parse(src)
        want = [bool(X.evaluate(ast, r) or False) for r in CORPUS]
        have = [bool(row[f"e{i}"]) for row in got]
        assert want == have, f"{src}: python={want} spark={have}"


def test_feature_filter_is_pushdown_eligible(spark, tmp_path):
    # the compiled predicate is a plain Catalyst filter: on a parquet
    # scan a comparison on a plain column must reach PushedFilters
    p = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr(
        "id", "CAST(id % 10 AS INT) AS sz"
    ).write.parquet(p)
    df = X.feature_filter(
        spark.read.parquet(p), "[sz] > 7 and not [sz] = 9"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(sz)" in plan or "GreaterThan(sz,7)" in plan
    assert df.count() == 10  # sz == 8 rows only


def test_match_is_full_string(spark):
    # boost::regex_match semantics, not search: 'BRASS' must not match
    # inside a longer string
    rows = [{"t": "BRASS"}, {"t": "XBRASSY"}, {"t": None}]
    ast = X.parse("[t].match('BRASS')")
    assert [X.evaluate(ast, r) for r in rows] == [True, False, False]
    sdf = spark.createDataFrame([(r["t"],) for r in rows], "t string")
    from pyspark.sql import functions as F

    got = [
        bool(r[0])
        for r in sdf.select(
            F.expr(X.predicate_sql("[t].match('BRASS')", "spark"))
        ).collect()
    ]
    assert got == [True, False, False]


def test_colmap_and_identifier_quoting():
    sql = X.to_sql(X.parse("[weird name] = 1"), "spark")
    assert "`weird name`" in sql
    sql = X.to_sql(X.parse("[weird name] = 1"), "duckdb")
    assert '"weird name"' in sql
    sql = X.predicate_sql("[sz] = null", "duckdb", {"sz": "NULLIF(x, 4)"})
    assert "NULLIF(x, 4)" in sql


def test_style_stops_linear_and_step():
    import duckdb

    from mapnik_vector_tile_spark.functions.stylestops import (
        style_stops_sql,
    )

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE f AS SELECT CAST(i AS BIGINT) AS fid,"
        " CAST(i AS BIGINT) AS z FROM"
        " (SELECT unnest(generate_series(0, 15)) AS i)"
    )
    rows = con.sql(style_stops_sql("f", "duckdb")).df()
    w = {r.z: r.v for r in rows[rows.prop == "width"].itertuples()}
    o = {r.z: r.v for r in rows[rows.prop == "opacity"].itertuples()}
    # linear: stop anchors exact, midpoints floor-interpolated
    assert w[0] == 100 and w[5] == 400 and w[10] == 2000 and w[14] == 6000
    assert w[2] == 100 + (2 * 300) // 5  # 220
    assert w[7] == 400 + (2 * 1600) // 5  # 1040
    assert w[15] == 6000  # clamp above last stop
    # step: greatest stop <= z
    assert o[0] == 10 and o[7] == 10 and o[8] == 60 and o[12] == 100
    assert o[15] == 100
    # exponential base 7/4: anchors exact, interior points follow the
    # integer-exact t = ((p^d - q^d) q^(D-d)) / (p^D - q^D) curve
    e = {r.z: r.v for r in rows[rows.prop == "width_exp"].itertuples()}
    assert e[0] == 100 and e[5] == 400 and e[10] == 2000 and e[14] == 6000
    den = 7**5 - 4**5
    assert e[1] == 100 + (300 * (7 - 4) * 4**4) // den  # 114
    assert e[2] == 100 + (300 * (49 - 16) * 4**3) // den  # 140
    assert e[4] == 100 + (300 * (7**4 - 4**4) * 4) // den  # 263
    assert e[15] == 6000  # clamp
    # convexity: the exponential curve lags the linear one mid-bracket
    assert e[2] < w[2]
