SELECT upper(l_returnflag) AS flag, COUNT(*) AS cnt FROM lineitem GROUP BY upper(l_returnflag) ORDER BY flag;
