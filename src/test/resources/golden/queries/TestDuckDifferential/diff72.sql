SELECT r_regionkey, r_name, r_regionkey + 8 AS bumped, LENGTH(r_name) AS slen FROM region
WHERE (r_regionkey <= 3 OR r_name LIKE '%i%')
ORDER BY r_regionkey NULLS FIRST, r_name NULLS FIRST, bumped NULLS FIRST, slen NULLS FIRST LIMIT 50;
