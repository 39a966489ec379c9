SELECT 100 *
  sum(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(l_extendedprice AS DECIMAL(20,4)) ELSE 0.0 END) /
  sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey;
