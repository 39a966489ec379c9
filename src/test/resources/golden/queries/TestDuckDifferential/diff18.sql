SELECT r_regionkey, r_name, r_regionkey + 5 AS bumped, LENGTH(r_name) AS slen FROM region
WHERE (r_regionkey BETWEEN 2 AND 4 AND r_name >= 'E')
ORDER BY r_regionkey NULLS FIRST, r_name NULLS FIRST, bumped NULLS FIRST, slen NULLS FIRST LIMIT 50;
