-- reference: TestLogicalPlanner/window1.sql — empty OVER () on lineitem
-- (bounded and ordered for a stable small replay result)
SELECT l_orderkey, l_linenumber, sum(l_partkey) OVER () AS total
FROM lineitem WHERE l_orderkey < 3 ORDER BY l_orderkey, l_linenumber;
