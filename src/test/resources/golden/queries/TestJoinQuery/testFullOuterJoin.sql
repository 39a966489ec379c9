SELECT r_regionkey, n_nationkey FROM region
FULL OUTER JOIN nation ON r_regionkey = n_nationkey
ORDER BY n_nationkey NULLS LAST, r_regionkey NULLS LAST;
