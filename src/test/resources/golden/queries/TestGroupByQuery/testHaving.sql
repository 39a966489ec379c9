SELECT c_nationkey, COUNT(*) AS cnt FROM customer
GROUP BY c_nationkey HAVING COUNT(*) >= 5 ORDER BY c_nationkey;
