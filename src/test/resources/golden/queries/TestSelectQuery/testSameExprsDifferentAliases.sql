SELECT n_nationkey * 2 AS d1, n_nationkey * 2 AS d2 FROM nation ORDER BY d1 LIMIT 5;
