SELECT COUNT(*) AS n_all, COUNT(NULLIF(o_orderkey % 3, 0)) AS n_nonnull FROM orders;
