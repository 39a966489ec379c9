SELECT * FROM (
  SELECT a.id, a.code AS code, b.name, b.code AS code2 FROM (
    SELECT l_orderkey AS id, 'lineitem' AS code FROM lineitem WHERE l_orderkey < 10
    UNION ALL
    SELECT o_orderkey AS id, 'order' AS code FROM orders WHERE o_orderkey < 10
  ) a
  JOIN (
    SELECT c_custkey AS id, c_name AS name, 'customer' AS code FROM customer
    UNION ALL
    SELECT p_partkey AS id, p_name AS name, 'part' AS code FROM part
  ) b ON a.id = b.id
) c ORDER BY id, code, code2, name;
