SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 1000.5 AND c_acctbal > 0.0 ORDER BY c_custkey LIMIT 10;
