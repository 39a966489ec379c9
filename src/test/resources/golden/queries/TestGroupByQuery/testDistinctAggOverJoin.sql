SELECT n.n_regionkey, COUNT(DISTINCT c.c_mktsegment) AS d_segments
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_regionkey
ORDER BY n.n_regionkey;
