SELECT c_custkey, c_mktsegment, c_custkey + 9 AS bumped, LENGTH(c_mktsegment) AS slen FROM customer
WHERE (c_name LIKE '%i%' AND c_custkey > 102)
ORDER BY c_custkey NULLS FIRST, c_mktsegment NULLS FIRST, bumped NULLS FIRST, slen NULLS FIRST LIMIT 50;
