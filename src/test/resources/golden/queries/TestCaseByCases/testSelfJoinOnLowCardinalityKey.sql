SELECT COUNT(1) AS cnt FROM lineitem l1 JOIN lineitem l2 ON l1.l_returnflag = l2.l_returnflag WHERE l1.l_orderkey < 5 AND l2.l_orderkey < 5;
