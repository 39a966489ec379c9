SELECT nation.n_nationkey AS n_nationkey, nation.n_name AS n_name
FROM nation
INNER JOIN (SELECT c_nationkey AS n_nationkey FROM customer) a
ON nation.n_nationkey = a.n_nationkey
ORDER BY n_nationkey
LIMIT 30;
