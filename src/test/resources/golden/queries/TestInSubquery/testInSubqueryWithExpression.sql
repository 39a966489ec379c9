SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey * 2 IN (SELECT p_partkey FROM part WHERE p_size < 10)
ORDER BY s_suppkey;
