SELECT UPPER('mixed') AS up, LOWER('MIXED') AS lo, INITCAP('hello world') AS ic,
  REVERSE('abc') AS rev, REPEAT('ab', 3) AS rep;
