SELECT 1 + 2 AS three, upper('tajo') AS up, length('graft') AS len5, coalesce(NULL, 'x') AS cx;
