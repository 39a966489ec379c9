SELECT n_nationkey,
       NULLIF(n_regionkey, 2) + 1 AS null_plus,
       CONCAT(CAST(NULLIF(n_regionkey, 2) AS TEXT), '-tag') AS null_concat,
       NULLIF(n_regionkey, 2) = n_regionkey AS null_eq
FROM nation
WHERE n_nationkey < 6
ORDER BY n_nationkey;
