SELECT c_custkey, eo.o_orderkey
FROM (SELECT * FROM orders WHERE o_orderkey > 999999) eo
RIGHT OUTER JOIN customer ON c_custkey = eo.o_orderkey
WHERE c_custkey < 30
ORDER BY c_custkey, eo.o_orderkey;
