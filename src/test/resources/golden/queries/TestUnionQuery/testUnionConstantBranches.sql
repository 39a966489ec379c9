SELECT 1 AS id, 'alpha' AS name
UNION
SELECT 2, 'beta'
UNION
SELECT 1, 'alpha'
ORDER BY id;
