SET SESSION tajo.function.python.code-dir TO 'src/test/resources/golden/pyudf';
SELECT add_py(3, return_one()) AS nested_add, concat_py(helloworld()) AS nested_cat
