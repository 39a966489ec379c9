DROP TABLE IF EXISTS golden_nation_parts2;
CREATE TABLE golden_nation_parts2 PARTITION BY COLUMN(n_regionkey INT4) AS SELECT n_nationkey, n_name, n_regionkey FROM nation;
SELECT b.o_orderkey, b.o_custkey, a.c_custkey, a.c_name, c.n_nationkey, c.n_name
FROM customer a
LEFT OUTER JOIN orders b ON a.c_custkey = b.o_custkey
LEFT OUTER JOIN golden_nation_parts2 c ON a.c_nationkey = c.n_nationkey
WHERE c.n_nationkey IS NOT NULL AND a.c_custkey < 5
ORDER BY b.o_orderkey, a.c_custkey;
