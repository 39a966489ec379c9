SELECT n_nationkey, n_name, n_nationkey + 9 AS bumped, LENGTH(n_name) AS slen FROM nation
WHERE (n_nationkey % 4 = 1 AND SUBSTR(n_name, 1, 1) <> 'x')
ORDER BY n_nationkey NULLS FIRST, n_name NULLS FIRST, bumped NULLS FIRST, slen NULLS FIRST LIMIT 50;
