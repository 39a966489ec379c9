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
N_CASES = 240

TABLES = {
    "nation": {"ints": ["n_nationkey", "n_regionkey"], "strs": ["n_name"]},
    "region": {"ints": ["r_regionkey"], "strs": ["r_name"]},
    "customer": {"ints": ["c_custkey", "c_nationkey"],
                 "strs": ["c_name", "c_mktsegment"]},
    "orders": {"ints": ["o_orderkey", "o_custkey"],
               "strs": ["o_orderstatus", "o_orderpriority"]},
}


# sf0.001 key domains — constants must land inside them or most predicates
# come back empty
RANGES = {"n_nationkey": 24, "n_regionkey": 4, "r_regionkey": 4,
          "c_custkey": 149, "c_nationkey": 24,
          "o_orderkey": 1499, "o_custkey": 149}


def int_pred(r, col):
    hi = RANGES.get(col.split(".")[-1], 150)
    k = r.randint(0, max(1, (hi * 7) // 10))
    return r.choice([
        f"{col} > {k}",
        f"{col} <= {k + max(2, hi // 8)}",
        f"{col} BETWEEN {k} AND {k + r.randint(2, max(3, hi // 3))}",
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
    # cases 0-119 keep their original shape mapping AND their position in
    # the shared RNG stream, so regeneration is byte-stable; 120-159
    # rotate through the appended shapes 24-31, 160-199 through 32-39,
    # 200+ through 40-47
    shape = (i % 24 if i < 120
             else 24 + (i - 120) % 8 if i < 160
             else 32 + (i - 160) % 8 if i < 200
             else 40 + (i - 200) % 8)
    if shape == 40:  # date arithmetic bucketing
        d = r.randint(1, 90)
        return (f"SELECT CAST(CAST(o_orderdate AS DATE)"
                f" + INTERVAL '{d}' DAY AS DATE) AS shifted,\n"
                f"  COUNT(*) AS cnt, MIN(o_orderkey) AS lo\n"
                f"FROM orders WHERE {int_pred(r, 'o_orderkey')}\n"
                f"GROUP BY 1 {order_by(['shifted'])} LIMIT 60;")
    if shape == 41:  # nested CASE classification
        a, b = r.randint(5, 15), r.randint(30, 80)
        return (f"SELECT CASE WHEN c_custkey < {a} THEN 'lo'\n"
                f"  WHEN c_custkey < {b} THEN CASE WHEN c_nationkey % 2 = 0"
                f" THEN 'mid-even' ELSE 'mid-odd' END\n"
                f"  ELSE 'hi' END AS cls, COUNT(*) AS cnt\n"
                f"FROM customer WHERE {str_pred(r, 'c_name')}\n"
                f"GROUP BY 1 {order_by(['cls'])};")
    if shape == 42:  # IN over a grouped-HAVING subquery
        t = r.randint(2, 10)
        return (f"SELECT c_custkey, c_nationkey FROM customer\n"
                f"WHERE c_nationkey IN (\n"
                f"  SELECT n_nationkey FROM nation JOIN customer"
                f" ON c_nationkey = n_nationkey\n"
                f"  GROUP BY n_nationkey HAVING COUNT(*) > {t}\n"
                f") AND {int_pred(r, 'c_custkey')}\n"
                f"{order_by(['c_custkey'])} LIMIT 70;")
    if shape == 43:  # UNION ALL of two aggregates
        m = r.randint(2, 6)
        return (f"SELECT 'by_nation' AS src, CAST(c_nationkey AS BIGINT) AS g,"
                f" COUNT(*) AS cnt FROM customer GROUP BY c_nationkey\n"
                f"UNION ALL\n"
                f"SELECT 'by_mod', CAST(o_custkey % {m} AS BIGINT), COUNT(*)\n"
                f"FROM orders WHERE {int_pred(r, 'o_orderkey')}"
                f" GROUP BY o_custkey % {m}\n"
                f"{order_by(['src', 'g'])};")
    if shape == 44:  # small cross join + filter
        k = r.randint(1, 3)
        return (f"SELECT n.n_nationkey, r.r_regionkey FROM nation n\n"
                f"CROSS JOIN region r\n"
                f"WHERE n.n_regionkey <> r.r_regionkey"
                f" AND r.r_regionkey >= {k}\n"
                f"{order_by(['n.n_nationkey', 'r.r_regionkey'])};")
    if shape == 45:  # COALESCE/NULLIF integer arithmetic
        m = r.randint(2, 5)
        return (f"SELECT o_orderkey,"
                f" COALESCE(NULLIF(o_custkey % {m}, 0), -1) AS bucket\n"
                f"FROM orders WHERE {int_pred(r, 'o_orderkey')}\n"
                f"{order_by(['o_orderkey'])} LIMIT 80;")
    if shape == 46:  # MIN/MAX window frame over a unique order
        t = r.choice(["customer", "orders"])
        ic = TABLES[t]["ints"][0]
        w = r.randint(1, 4)
        return (f"SELECT {ic},\n"
                f"  MIN({ic}) OVER (ORDER BY {ic}"
                f" ROWS BETWEEN {w} PRECEDING AND CURRENT ROW) AS lo,\n"
                f"  MAX({ic}) OVER (ORDER BY {ic}"
                f" ROWS BETWEEN CURRENT ROW AND {w} FOLLOWING) AS hi\n"
                f"FROM {t} WHERE {int_pred(r, ic)}\n"
                f"{order_by([ic])} LIMIT 70;")
    if shape == 47:  # EXISTS + NOT EXISTS combined
        a, b = r.randint(2, 8), r.randint(400, 1400)
        return (f"SELECT n_nationkey, n_name FROM nation n\n"
                f"WHERE EXISTS (SELECT 1 FROM customer c"
                f" WHERE c.c_nationkey = n.n_nationkey"
                f" AND c.c_custkey % {a} = 0)\n"
                f"  AND NOT EXISTS (SELECT 1 FROM customer c2\n"
                f"    JOIN orders o ON o.o_custkey = c2.c_custkey\n"
                f"    WHERE c2.c_nationkey = n.n_nationkey"
                f" AND o.o_orderkey > {b})\n"
                f"{order_by(['n_nationkey'])};")
    if shape == 32:  # INTERSECT of two key projections
        m, k = r.randint(2, 6), r.randint(0, 60)
        return (f"SELECT c_custkey % 50 AS v FROM customer"
                f" WHERE c_custkey > {k}\n"
                f"INTERSECT\n"
                f"SELECT o_custkey % 50 AS v FROM orders"
                f" WHERE o_orderkey % {m} = 0\n"
                f"{order_by(['v'])};")
    if shape == 33:  # EXCEPT with a narrowing predicate
        k = r.randint(5, 100)
        return (f"SELECT c_nationkey AS v FROM customer WHERE c_custkey < {k + 40}\n"
                f"EXCEPT\n"
                f"SELECT n_nationkey AS v FROM nation"
                f" WHERE {int_pred(r, 'n_nationkey')}\n"
                f"{order_by(['v'])};")
    if shape == 34:  # GROUPING SETS incl. the grand total
        m = r.randint(2, 5)
        return (f"SELECT o_orderstatus, o_custkey % {m} AS b, COUNT(*) AS cnt\n"
                f"FROM orders WHERE {int_pred(r, 'o_orderkey')}\n"
                f"GROUP BY GROUPING SETS ((o_orderstatus), (o_custkey % {m}), ())\n"
                f"{order_by(['o_orderstatus', 'b', 'cnt'])};")
    if shape == 35:  # correlated EXISTS
        k = r.randint(2, 12)
        return (f"SELECT n_nationkey, n_name FROM nation n\n"
                f"WHERE EXISTS (SELECT 1 FROM customer c"
                f" WHERE c.c_nationkey = n.n_nationkey"
                f" AND c.c_custkey % {k} = 0)\n"
                f"{order_by(['n_nationkey'])};")
    if shape == 36:  # NTILE over a unique order
        b = r.randint(2, 7)
        return (f"SELECT c_custkey, NTILE({b}) OVER (ORDER BY c_custkey) AS tile\n"
                f"FROM customer WHERE {int_pred(r, 'c_custkey')}\n"
                f"{order_by(['c_custkey'])} LIMIT 80;")
    if shape == 37:  # self-join pairs within a region
        k = r.randint(0, 12)
        return (f"SELECT a.n_name AS n1, b.n_name AS n2\n"
                f"FROM nation a JOIN nation b\n"
                f"  ON a.n_regionkey = b.n_regionkey"
                f" AND a.n_nationkey < b.n_nationkey\n"
                f"WHERE a.n_nationkey > {k}\n"
                f"{order_by(['n1', 'n2'])};")
    if shape == 38:  # string expression chain
        c = r.choice(["c_name", "c_mktsegment"])
        return (f"SELECT c_custkey,"
                f" UPPER(SUBSTR({c}, 1, {r.randint(3, 6)})) AS pre,\n"
                f"  LENGTH(REPLACE({c}, '{r.choice('aeo')}', '')) AS shrunk\n"
                f"FROM customer WHERE {str_pred(r, c)}\n"
                f"{order_by(['c_custkey'])} LIMIT 70;")
    if shape == 39:  # HAVING with two aggregate predicates
        m = r.randint(2, 6)
        return (f"SELECT o_custkey % {m} AS b, COUNT(*) AS cnt,"
                f" MAX(o_orderkey) AS hi\n"
                f"FROM orders WHERE {int_pred(r, 'o_orderkey')}\n"
                f"GROUP BY o_custkey % {m}\n"
                f"HAVING COUNT(*) > {r.randint(1, 5)}"
                f" AND MIN(o_orderkey) < {r.randint(200, 1200)}\n"
                f"{order_by(['b'])};")
    if shape == 24:  # ROLLUP with null super-aggregate rows
        m = r.randint(2, 5)
        return (f"SELECT o_orderpriority, o_custkey % {m} AS b,"
                f" COUNT(*) AS cnt, SUM(o_orderkey) AS s\n"
                f"FROM orders WHERE {int_pred(r, 'o_orderkey')}\n"
                f"GROUP BY ROLLUP (o_orderpriority, o_custkey % {m})\n"
                f"{order_by(['o_orderpriority', 'b', 'cnt'])};")
    if shape == 25:  # FULL OUTER JOIN with coalesced key
        k1, k2 = r.randint(0, 12), r.randint(1, 4)
        return (f"SELECT COALESCE(n.n_regionkey, -1) AS nk,"
                f" COALESCE(r.r_regionkey, -1) AS rk, n.n_name, r.r_name\n"
                f"FROM (SELECT * FROM nation WHERE n_nationkey > {k1}) n\n"
                f"FULL OUTER JOIN (SELECT * FROM region WHERE r_regionkey >= {k2}) r\n"
                f"ON n.n_regionkey = r.r_regionkey\n"
                f"{order_by(['nk', 'rk', 'n.n_name', 'r.r_name'])};")
    if shape == 26:  # running-frame window sum over a unique order
        t = r.choice(["customer", "orders"])
        ic = TABLES[t]["ints"][0]
        part = r.choice(TABLES[t]["strs"])
        return (f"SELECT {ic}, {part},\n"
                f"  SUM({ic}) OVER (PARTITION BY {part} ORDER BY {ic}\n"
                f"    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run\n"
                f"FROM {t} WHERE {int_pred(r, ic)}\n"
                f"{order_by([ic])} LIMIT 70;")
    if shape == 27:  # left join + IS NULL (manual anti join)
        k = r.randint(3, 20)
        return (f"SELECT c.c_custkey, c.c_nationkey FROM customer c\n"
                f"LEFT JOIN orders o ON c.c_custkey = o.o_custkey"
                f" AND o.o_orderkey < {k * 10}\n"
                f"WHERE o.o_orderkey IS NULL AND {int_pred(r, 'c.c_custkey')}\n"
                f"{order_by(['c.c_custkey'])} LIMIT 60;")
    if shape == 28:  # 3-branch UNION ALL re-aggregated
        a, b, c = r.randint(0, 8), r.randint(3, 12), r.randint(1, 3)
        return (f"SELECT v, COUNT(*) AS cnt FROM (\n"
                f"  SELECT n_regionkey AS v FROM nation WHERE n_nationkey > {a}\n"
                f"  UNION ALL SELECT r_regionkey AS v FROM region\n"
                f"  UNION ALL SELECT c_nationkey % 5 AS v FROM customer"
                f" WHERE c_custkey < {b * 10}\n"
                f") u WHERE v >= {c - 1}\nGROUP BY v {order_by(['v'])};")
    if shape == 29:  # lag/lead with defaults over a unique order
        t = r.choice(["customer", "orders"])
        ic = TABLES[t]["ints"][0]
        d = r.randint(1, 3)
        return (f"SELECT {ic},\n"
                f"  LAG({ic}, {d}, -1) OVER (ORDER BY {ic}) AS prev,\n"
                f"  LEAD({ic}, 1, -2) OVER (ORDER BY {ic}) AS nxt\n"
                f"FROM {t} WHERE {int_pred(r, ic)}\n"
                f"{order_by([ic])} LIMIT 60;")
    if shape == 30:  # arithmetic over two scalar subqueries + CASE
        k = r.randint(2, 9)
        return (f"SELECT n_nationkey, n_name,\n"
                f"  CASE WHEN n_nationkey * {k} >\n"
                f"    (SELECT COUNT(*) FROM customer WHERE {int_pred(r, 'c_custkey')})\n"
                f"    - (SELECT MIN(r_regionkey) FROM region)\n"
                f"  THEN 'big' ELSE 'small' END AS cls\n"
                f"FROM nation\n{order_by(['n_nationkey'])};")
    if shape == 31:  # window over a joined derived table
        m = r.randint(2, 5)
        return (f"SELECT x.nk, x.cnt,\n"
                f"  RANK() OVER (ORDER BY x.cnt DESC, x.nk) AS rk\n"
                f"FROM (\n"
                f"  SELECT c.c_nationkey AS nk, COUNT(*) AS cnt\n"
                f"  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey\n"
                f"  WHERE c.c_custkey % {m} = 0\n"
                f"  GROUP BY c.c_nationkey\n"
                f") x {order_by(['x.nk'])};")
    if shape == 18:  # date part extraction + group
        part = r.choice(["YEAR", "MONTH"])
        return (f"SELECT EXTRACT({part} FROM CAST(o_orderdate AS DATE)) AS p,"
                f" COUNT(*) AS cnt, MIN(o_orderkey) AS lo\n"
                f"FROM orders WHERE {int_pred(r, 'o_orderkey')}\n"
                f"GROUP BY EXTRACT({part} FROM CAST(o_orderdate AS DATE))"
                f" {order_by(['p'])};")
    if shape == 19:  # scalar aggregate subquery comparison
        m = r.randint(2, 9)
        return (f"SELECT c_custkey, c_nationkey FROM customer\n"
                f"WHERE c_custkey * {m} > (SELECT COUNT(*) FROM orders"
                f" WHERE {int_pred(r, 'o_orderkey')})\n"
                f"{order_by(['c_custkey'])} LIMIT 50;")
    if shape == 20:  # join with an extra non-equi residual
        k = r.randint(1, 20)
        return (f"SELECT c.c_custkey, o.o_orderkey FROM customer c\n"
                f"JOIN orders o ON c.c_custkey = o.o_custkey"
                f" AND o.o_orderkey > c.c_custkey + {k}\n"
                f"WHERE {int_pred(r, 'c.c_custkey')}\n"
                f"{order_by(['c.c_custkey', 'o.o_orderkey'])} LIMIT 80;")
    if shape == 21:  # min/max over strings + length arithmetic
        t = r.choice(list(TABLES))
        sc = r.choice(TABLES[t]["strs"])
        ic = TABLES[t]["ints"][0]
        m = r.randint(2, 6)
        return (f"SELECT {ic} % {m} AS g, MIN({sc}) AS lo,"
                f" MAX({sc}) AS hi, SUM(LENGTH({sc})) AS lensum\n"
                f"FROM {t} WHERE {str_pred(r, sc)}\n"
                f"GROUP BY {ic} % {m} {order_by(['g'])};")
    if shape == 22:  # CASE expression as the grouping key
        m = r.randint(3, 5)
        return (f"SELECT CASE WHEN o_custkey % {m} = 0 THEN 'z'"
                f" WHEN o_custkey % {m} = 1 THEN 'o' ELSE 'r' END AS cls,\n"
                f"  COUNT(*) AS cnt, SUM(o_orderkey) AS s\n"
                f"FROM orders WHERE {int_pred(r, 'o_orderkey')}\n"
                f"GROUP BY CASE WHEN o_custkey % {m} = 0 THEN 'z'"
                f" WHEN o_custkey % {m} = 1 THEN 'o' ELSE 'r' END"
                f" {order_by(['cls'])};")
    if shape == 23:  # LIMIT + OFFSET over a total order
        t = r.choice(list(TABLES))
        ic = TABLES[t]["ints"][0]
        return (f"SELECT {ic} FROM {t} WHERE {int_pred(r, ic)}\n"
                f"{order_by([ic])} LIMIT {r.randint(5, 25)} OFFSET {r.randint(1, 15)};")
    if shape == 9:  # window rank family over a unique order -> deterministic
        t = r.choice(["customer", "orders"])
        key = TABLES[t]["ints"][0]
        part = r.choice(TABLES[t]["strs"])
        return (f"SELECT {key}, {part},\n"
                f"  ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {key}) AS rn,\n"
                f"  RANK() OVER (ORDER BY {key} % {r.randint(3, 7)}, {key}) AS rk\n"
                f"FROM {t} WHERE {int_pred(r, key)}\n"
                f"{order_by([key])} LIMIT 60;")
    if shape == 10:  # set ops beyond UNION ALL
        op = r.choice(["EXCEPT", "INTERSECT", "UNION"])
        k = r.randint(1, 3)
        return (f"SELECT n_regionkey AS v FROM nation WHERE n_nationkey > {r.randint(0, 12)}\n"
                f"{op}\n"
                f"SELECT r_regionkey AS v FROM region WHERE r_regionkey >= {k}\n"
                f"{order_by(['v'])};")
    if shape == 11:  # correlated EXISTS / NOT EXISTS
        neg = r.choice(["", "NOT "])
        return (f"SELECT n_nationkey, n_name FROM nation n\n"
                f"WHERE {neg}EXISTS (SELECT 1 FROM customer c"
                f" WHERE c.c_nationkey = n.n_nationkey"
                f" AND {int_pred(r, 'c.c_custkey')})\n"
                f"{order_by(['n_nationkey'])};")
    if shape == 12:  # three-way join
        return (f"SELECT c.c_custkey, n.n_name, rg.r_name FROM customer c\n"
                f"JOIN nation n ON c.c_nationkey = n.n_nationkey\n"
                f"JOIN region rg ON n.n_regionkey = rg.r_regionkey\n"
                f"WHERE {int_pred(r, 'c.c_custkey')} AND {str_pred(r, 'rg.r_name')}\n"
                f"{order_by(['c.c_custkey'])} LIMIT 70;")
    if shape == 13:  # string expression gauntlet
        t = r.choice(list(TABLES))
        sc = r.choice(TABLES[t]["strs"])
        ic = TABLES[t]["ints"][0]
        a, b = r.choice('aeio'), r.choice('nrs')
        return (f"SELECT {ic}, UPPER({sc}) AS up, SUBSTR({sc}, 2, {r.randint(2, 5)}) AS mid,\n"
                f"  REPLACE({sc}, '{a}', '_') AS rep, {sc} || '#' || '{b}' AS glued\n"
                f"FROM {t} WHERE {int_pred(r, ic)}\n"
                f"{order_by([ic])} LIMIT 50;")
    if shape == 14:  # conditional aggregation + count distinct
        t = r.choice(["customer", "orders"])
        key = r.choice(TABLES[t]["strs"])
        ic = TABLES[t]["ints"][0]
        m = r.randint(2, 5)
        return (f"SELECT {key}, COUNT(DISTINCT {ic} % {m}) AS ndist,\n"
                f"  SUM(CASE WHEN {ic} % {m} = 0 THEN 1 ELSE 0 END) AS hits,\n"
                f"  COUNT(*) AS cnt\n"
                f"FROM {t} WHERE {int_pred(r, ic)}\n"
                f"GROUP BY {key} {order_by([key])};")
    if shape == 15:  # correlated scalar subquery in the select list
        return (f"SELECT n_nationkey, n_name,\n"
                f"  (SELECT COUNT(*) FROM customer c"
                f" WHERE c.c_nationkey = n.n_nationkey"
                f" AND {int_pred(r, 'c.c_custkey')}) AS n_cust\n"
                f"FROM nation n\n{order_by(['n_nationkey'])};")
    if shape == 16:  # NOT IN over a non-null key subquery
        return (f"SELECT c_custkey, c_nationkey FROM customer\n"
                f"WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation"
                f" WHERE {int_pred(r, 'n_nationkey')})\n"
                f"AND {int_pred(r, 'c_custkey')}\n"
                f"{order_by(['c_custkey'])} LIMIT 60;")
    if shape == 17:  # aggregate-in-FROM subquery joined back
        m = r.randint(2, 6)
        return (f"SELECT a.bucket, a.cnt, a.total FROM (\n"
                f"  SELECT o_custkey % {m} AS bucket, COUNT(*) AS cnt,"
                f" SUM(o_orderkey) AS total\n"
                f"  FROM orders WHERE {int_pred(r, 'o_orderkey')}\n"
                f"  GROUP BY o_custkey % {m}\n"
                f") a WHERE a.cnt > {r.randint(1, 4)}\n"
                f"{order_by(['a.bucket'])};")
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
