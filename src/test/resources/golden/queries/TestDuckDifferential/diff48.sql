SELECT n_regionkey, n_name, n_regionkey + 5 AS bumped, LENGTH(n_name) AS slen FROM nation
WHERE (LENGTH(n_name) > 5 OR n_nationkey IN (5, 8, 22))
ORDER BY n_regionkey NULLS FIRST, n_name NULLS FIRST, bumped NULLS FIRST, slen NULLS FIRST LIMIT 50;
