SELECT a.id, a.code, b.name, b.code AS code2 FROM (
  SELECT o_orderkey AS id, 'ord' AS code FROM orders WHERE o_orderkey < 5
  UNION ALL
  SELECT c_custkey AS id, 'cust' AS code FROM customer WHERE c_custkey < 5
) a JOIN (
  SELECT c_custkey AS id, c_name AS name, 'customer' AS code FROM customer
  UNION ALL
  SELECT p_partkey AS id, p_name AS name, 'part' AS code FROM part
) b ON a.id = b.id
ORDER BY a.id, a.code, code2;
