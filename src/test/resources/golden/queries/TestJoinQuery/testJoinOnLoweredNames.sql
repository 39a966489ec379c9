SELECT a.n_nationkey, b.n_nationkey AS other_key
FROM nation a JOIN nation b ON LOWER(a.n_name) = LOWER(b.n_name)
WHERE a.n_nationkey < 5
ORDER BY a.n_nationkey;
