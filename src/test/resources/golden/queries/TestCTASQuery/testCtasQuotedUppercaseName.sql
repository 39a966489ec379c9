DROP TABLE IF EXISTS "MANAGED_CTAS1";
CREATE TABLE "MANAGED_CTAS1" AS
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 4;
SELECT n_nationkey, n_name FROM "MANAGED_CTAS1" ORDER BY n_nationkey;
