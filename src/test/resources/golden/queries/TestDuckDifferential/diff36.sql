SELECT c_custkey, c_mktsegment, c_custkey + 3 AS bumped, LENGTH(c_mktsegment) AS slen FROM customer
WHERE (c_custkey BETWEEN 103 AND 108 AND LENGTH(c_name) > 8)
ORDER BY c_custkey NULLS FIRST, c_mktsegment NULLS FIRST, bumped NULLS FIRST, slen NULLS FIRST LIMIT 50;
