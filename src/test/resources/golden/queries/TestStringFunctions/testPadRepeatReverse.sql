SELECT LPAD('7', 3, '0') AS lp, RPAD('ab', 5, 'xy') AS rp,
       REPEAT('ab', 3) AS rep, REVERSE('spark') AS rev,
       INITCAP('hello world') AS ic;
