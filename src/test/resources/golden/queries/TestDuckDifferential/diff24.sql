SELECT c_custkey, c_mktsegment, c_custkey + 2 AS bumped, LENGTH(c_mktsegment) AS slen FROM customer
WHERE (c_custkey % 7 = 1 AND LENGTH(c_mktsegment) > 4)
ORDER BY c_custkey NULLS FIRST, c_mktsegment NULLS FIRST, bumped NULLS FIRST, slen NULLS FIRST LIMIT 50;
