#!/usr/bin/env python3
"""Generate the TestDuckDifferential golden suite: seeded random SQL over
the sf0.001 tables, with DuckDB (NOT our engine) producing every .result
file — an independent oracle, unlike GoldenGen which records our own
output. GoldenSuite then replays each .sql through GraftEngine and must
match DuckDB line-for-line.

Query shapes stay inside the subset both engines render identically:
integer/string/date columns (no doubles — float formatting differs),
aliased computed columns, a total ORDER BY over every output column with
explicit NULLS FIRST (Spark's ASC default; DuckDB defaults NULLS LAST).

Usage: python3 tools/duckfuzz_gen.py   (idempotent, fixed seed)
"""
import duckdb
import os
import random

SF = "/root/testdata/sf0.001"
SUITE = "TestDuckDifferential"
QDIR = f"src/test/resources/golden/queries/{SUITE}"
RDIR = f"src/test/resources/golden/results/{SUITE}"
N_CASES = 36

TABLES = {
    "nation": {"ints": ["n_nationkey", "n_regionkey"], "strs": ["n_name"]},
    "region": {"ints": ["r_regionkey"], "strs": ["r_name"]},
    "customer": {"ints": ["c_custkey", "c_nationkey"],
                 "strs": ["c_name", "c_mktsegment"]},
    "orders": {"ints": ["o_orderkey", "o_custkey"],
               "strs": ["o_orderstatus", "o_orderpriority"]},
}


def int_pred(r, col):
    k = r.randint(0, 400)
    return r.choice([
        f"{col} > {k}",
        f"{col} <= {k + 50}",
        f"{col} BETWEEN {k} AND {k + r.randint(10, 200)}",
        f"{col} IN ({k}, {k + 3}, {k + 17})",
        f"{col} % {r.randint(2, 7)} = {r.randint(0, 1)}",
    ])


def str_pred(r, col):
    return r.choice([
        f"{col} LIKE '%{r.choice('aeiou')}%'",
        f"{col} >= '{r.choice('ABCDEFP')}'",
        f"LENGTH({col}) > {r.randint(4, 10)}",
        f"SUBSTR({col}, 1, 1) <> '{r.choice('qzx')}'",
    ])


def pred(r, t):
    ps = [int_pred(r, r.choice(TABLES[t]["ints"])),
          str_pred(r, r.choice(TABLES[t]["strs"]))]
    r.shuffle(ps)
    return f"({ps[0]} {r.choice(['AND', 'OR'])} {ps[1]})"


def order_by(cols):
    return "ORDER BY " + ", ".join(f"{c} NULLS FIRST" for c in cols)


def gen_case(r, i):
    shape = i % 9
    if shape == 0:  # filter + project (+ scalar exprs)
        t = r.choice(list(TABLES))
        ic, sc = r.choice(TABLES[t]["ints"]), r.choice(TABLES[t]["strs"])
        cols = [ic, sc, f"{ic} + {r.randint(1, 9)} AS bumped",
                f"LENGTH({sc}) AS slen"]
        names = [ic, sc, "bumped", "slen"]
        return (f"SELECT {', '.join(cols)} FROM {t}\n"
                f"WHERE {pred(r, t)}\n{order_by(names)} LIMIT 50;")
    if shape == 1:  # inner join
        return (f"SELECT c.c_custkey, n.n_name FROM customer c\n"
                f"JOIN nation n ON c.c_nationkey = n.n_nationkey\n"
                f"WHERE {int_pred(r, 'c.c_custkey')}\n"
                f"{order_by(['c.c_custkey', 'n.n_name'])} LIMIT 60;")
    if shape == 2:  # group by + aggregates
        t = r.choice(["customer", "orders"])
        key = r.choice(TABLES[t]["strs"])
        ic = r.choice(TABLES[t]["ints"])
        return (f"SELECT {key}, COUNT(*) AS cnt, SUM({ic}) AS total,"
                f" MIN({ic}) AS lo, MAX({ic}) AS hi\n"
                f"FROM {t} WHERE {int_pred(r, ic)}\n"
                f"GROUP BY {key} {order_by([key])};")
    if shape == 3:  # left join producing NULLs
        k = r.randint(1, 4)
        return (f"SELECT n.n_nationkey, r.r_name FROM nation n\n"
                f"LEFT JOIN region r ON n.n_regionkey = r.r_regionkey"
                f" AND r.r_regionkey >= {k}\n"
                f"{order_by(['n.n_nationkey', 'r.r_name'])};")
    if shape == 4:  # union all
        t = r.choice(list(TABLES))
        ic = r.choice(TABLES[t]["ints"])
        return (f"SELECT {ic} AS v, 'a' AS tag FROM {t} WHERE {int_pred(r, ic)}\n"
                f"UNION ALL\n"
                f"SELECT {ic} AS v, 'b' AS tag FROM {t} WHERE {int_pred(r, ic)}\n"
                f"{order_by(['v', 'tag'])} LIMIT 80;")
    if shape == 5:  # case classification + date cast
        return (f"SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,\n"
                f"  CASE WHEN o_orderkey % 3 = 0 THEN 'tri'"
                f" WHEN o_orderkey % {r.randint(4, 6)} = 1 THEN 'mod'"
                f" ELSE 'rest' END AS cls\n"
                f"FROM orders WHERE {int_pred(r, 'o_orderkey')}\n"
                f"{order_by(['o_orderkey'])} LIMIT 70;")
    if shape == 6:  # IN subquery
        return (f"SELECT c_custkey, c_mktsegment FROM customer\n"
                f"WHERE c_nationkey IN (SELECT n_nationkey FROM nation"
                f" WHERE {int_pred(r, 'n_nationkey')})\n"
                f"AND {str_pred(r, 'c_name')}\n"
                f"{order_by(['c_custkey'])} LIMIT 60;")
    if shape == 7:  # having
        return (f"SELECT o_orderpriority, COUNT(*) AS cnt FROM orders\n"
                f"WHERE {int_pred(r, 'o_custkey')}\n"
                f"GROUP BY o_orderpriority HAVING COUNT(*) > {r.randint(1, 5)}\n"
                f"{order_by(['o_orderpriority'])};")
    # distinct
    t = r.choice(["customer", "orders"])
    a, b = r.choice(TABLES[t]["strs"]), r.choice(TABLES[t]["ints"])
    return (f"SELECT DISTINCT {a}, {b} % {r.randint(3, 9)} AS bucket FROM {t}\n"
            f"WHERE {str_pred(r, a)}\n{order_by([a, 'bucket'])} LIMIT 40;")


def render(con, sql):
    cur = con.execute(sql.rstrip(";"))
    cols = [d[0] for d in cur.description]
    lines = [",".join(cols), "-" * 31]
    for row in cur.fetchall():
        cells = []
        for v in row:
            if v is None:
                cells.append("null")
            elif isinstance(v, bool):
                cells.append("t" if v else "f")
            else:
                cells.append(str(v))
        lines.append(",".join(cells))
    return "\n".join(lines) + "\n"


def main():
    con = duckdb.connect()
    for t in list(TABLES) + ["orders"]:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    os.makedirs(QDIR, exist_ok=True)
    os.makedirs(RDIR, exist_ok=True)
    r = random.Random(20260814)
    rows_total = 0
    for i in range(N_CASES):
        sql = gen_case(r, i)
        result = render(con, sql)
        nrows = len(result.strip().split("\n")) - 2
        rows_total += nrows
        name = f"diff{i:02d}"
        open(f"{QDIR}/{name}.sql", "w").write(sql + "\n")
        open(f"{RDIR}/{name}.result", "w").write(result)
        print(f"{name}: {nrows} rows")
    print(f"{N_CASES} cases, {rows_total} result rows")


if __name__ == "__main__":
    main()
