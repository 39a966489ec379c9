SELECT c_nationkey, c_mktsegment, c_nationkey + 1 AS bumped, LENGTH(c_mktsegment) AS slen FROM customer
WHERE (SUBSTR(c_name, 1, 1) <> 'x' OR c_custkey IN (92, 95, 109))
ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST, bumped NULLS FIRST, slen NULLS FIRST LIMIT 50;
