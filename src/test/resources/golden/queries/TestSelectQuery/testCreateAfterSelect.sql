DROP TABLE IF EXISTS orderkeys_g;
CREATE TABLE orderkeys_g AS SELECT l_orderkey FROM lineitem;
SELECT l_orderkey FROM orderkeys_g WHERE l_orderkey < 4 ORDER BY l_orderkey;
