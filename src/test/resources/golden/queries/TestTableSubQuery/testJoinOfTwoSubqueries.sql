SELECT a.n_regionkey, a.nations, b.suppliers
FROM (SELECT n_regionkey, COUNT(*) AS nations FROM nation GROUP BY n_regionkey) a
JOIN (SELECT n.n_regionkey, COUNT(*) AS suppliers
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey) b
  ON a.n_regionkey = b.n_regionkey
ORDER BY a.n_regionkey;
