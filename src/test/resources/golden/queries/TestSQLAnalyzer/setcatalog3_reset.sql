-- suite hygiene (not a reference case): return to the default database so
-- later cases run against it, and pin that the switch back works
SET CATALOG default;
SELECT name, value FROM information_schema.session WHERE name = 'CURRENT_DATABASE';
