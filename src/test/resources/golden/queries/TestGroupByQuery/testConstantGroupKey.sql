SELECT 123 AS grp, COUNT(1) AS total FROM lineitem GROUP BY grp ORDER BY grp, total;
