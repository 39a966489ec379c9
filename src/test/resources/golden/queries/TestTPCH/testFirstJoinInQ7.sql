SELECT supp_nation, cust_nation, s_nationkey, c_nationkey FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         n1.n_nationkey AS s_nationkey, n2.n_nationkey AS c_nationkey
  FROM nation n1 JOIN nation n2
    ON n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7'
  UNION ALL
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         n1.n_nationkey AS s_nationkey, n2.n_nationkey AS c_nationkey
  FROM nation n1 JOIN nation n2
    ON n2.n_name = 'NATION_3' AND n1.n_name = 'NATION_7'
) u ORDER BY supp_nation;
