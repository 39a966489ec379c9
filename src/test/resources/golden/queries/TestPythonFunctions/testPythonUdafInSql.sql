-- aggregate class AvgPy registers as SQL function avgpy (the reference's
-- classname.toLowerCase naming)
SET SESSION tajo.function.python.code-dir TO 'src/test/resources/golden/pyudf';
SELECT n_regionkey, avgpy(n_nationkey) FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
