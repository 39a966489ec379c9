SELECT l_returnflag AS flag FROM lineitem WHERE l_orderkey < 100
INTERSECT
SELECT l_returnflag FROM lineitem WHERE l_orderkey >= 100 AND l_orderkey < 200
ORDER BY flag;
