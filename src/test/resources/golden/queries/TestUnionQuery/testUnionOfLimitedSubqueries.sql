SELECT k FROM (SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey LIMIT 3) a
UNION ALL
SELECT k FROM (SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey DESC LIMIT 3) b
ORDER BY k;
