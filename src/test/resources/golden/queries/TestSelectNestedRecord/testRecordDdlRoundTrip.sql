DROP TABLE IF EXISTS golden_nested;
CREATE TABLE golden_nested USING PARQUET
AS SELECT n_nationkey AS id,
  named_struct('name', n_name, 'region', named_struct('rk', n_regionkey)) AS rec
FROM nation WHERE n_nationkey < 6;
SELECT id, rec.name, rec.region.rk FROM golden_nested ORDER BY id;
