SET SESSION tajo.function.python.code-dir TO 'src/test/resources/golden/pyudf';
SELECT return_one() AS one, helloworld() AS hw, concat_py('1') AS cp,
  comma_format(12345) AS cf, add_py(1, 2) AS ap, percent(386, 1000) AS pct,
  concat4('Tajo', 'is', 'awesome', '!') AS c4
