SELECT c_nationkey, c_mktsegment, c_nationkey + 3 AS bumped, LENGTH(c_mktsegment) AS slen FROM customer
WHERE (c_nationkey BETWEEN 115 AND 144 AND c_name LIKE '%i%')
ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST, bumped NULLS FIRST, slen NULLS FIRST LIMIT 50;
