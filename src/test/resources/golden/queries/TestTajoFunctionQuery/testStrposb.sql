SELECT strposb('hello world', 'world') AS p, strposb('hello', 'zz') AS missing;
