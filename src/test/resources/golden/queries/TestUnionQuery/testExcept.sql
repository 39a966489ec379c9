SELECT n_nationkey AS k FROM nation
EXCEPT
SELECT n_nationkey FROM nation WHERE n_nationkey < 20
ORDER BY k;
