SELECT n_nationkey,
       ROW_NUMBER() OVER (ORDER BY n_name) AS by_name,
       ROW_NUMBER() OVER (ORDER BY n_nationkey DESC) AS by_key_desc
FROM nation
WHERE n_regionkey < 2
ORDER BY n_nationkey;
