SET SESSION tajo.function.python.code-dir TO 'src/test/resources/golden/pyudf';
SELECT * FROM nation WHERE add_py(n_regionkey, return_one()) < 2 ORDER BY n_nationkey
