SELECT COALESCE(NULL, NULL, 'third') AS c, NULLIF('x', 'x') AS n1, NULLIF('x', 'y') AS n2;
