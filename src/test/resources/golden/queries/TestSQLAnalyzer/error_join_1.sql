-- reference: TestSQLAnalyzer/errors/join_1.sql — LEFTT is not a join type
SELECT
  d_date_sk ss_sold_date_sk
FROM s_purchase
  LEFTT OUTER JOIN customer ON (purc_customer_id = c_customer_id)
  LEFT OUTER JOIN store ON (purc_store_id = s_store_id)
WHERE purc_purchase_id = plin_purchase_id;
