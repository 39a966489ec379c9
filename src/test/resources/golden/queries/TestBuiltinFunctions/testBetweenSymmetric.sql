SELECT n_nationkey FROM nation
WHERE n_nationkey BETWEEN 5 AND 10 AND n_nationkey NOT BETWEEN 7 AND 8
ORDER BY n_nationkey;
