SELECT n_nationkey, n_name FROM nation
WHERE n_name SIMILAR TO 'NATION[_](1|2)(0|5)?'
ORDER BY n_nationkey;
