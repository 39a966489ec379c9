SELECT c_custkey, coalesce(o.o_orderstatus, 'N/A') AS status
FROM customer LEFT OUTER JOIN orders o ON c_custkey = o_custkey AND o_totalprice > 1e9
WHERE o.o_orderkey IS NULL
ORDER BY c_custkey LIMIT 15;
