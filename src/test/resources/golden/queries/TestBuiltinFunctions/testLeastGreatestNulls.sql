SELECT LEAST(3, 1, 2) AS l1, GREATEST(3, 1, 2) AS g1,
       LEAST(1, CAST(NULL AS INT4)) AS l_null,
       GREATEST(CAST(NULL AS INT4), CAST(NULL AS INT4)) AS g_all_null,
       LEAST('b', 'a', 'c') AS l_str;
