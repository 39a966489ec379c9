SET SESSION tajo.function.python.code-dir TO 'src/test/resources/golden/pyudf';
SELECT n_nationkey, add_py(n_nationkey, n_regionkey) AS ks, concat_py(n_name) AS dbl
FROM nation ORDER BY n_nationkey LIMIT 5
