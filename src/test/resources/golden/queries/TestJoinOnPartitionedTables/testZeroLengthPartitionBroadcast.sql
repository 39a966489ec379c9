DROP TABLE IF EXISTS golden_nation_parts;
CREATE TABLE golden_nation_parts PARTITION BY COLUMN(n_regionkey INT4) AS SELECT n_nationkey, n_name, n_regionkey FROM nation;
SELECT a.c_custkey, a.c_nationkey, b.n_nationkey, b.n_name
FROM customer a
LEFT OUTER JOIN golden_nation_parts b ON a.c_nationkey = b.n_nationkey
WHERE b.n_nationkey IS NOT NULL
ORDER BY a.c_custkey
LIMIT 25;
