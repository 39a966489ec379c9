SELECT COUNT(DISTINCT l_returnflag) AS flags, COUNT(DISTINCT l_linestatus) AS statuses FROM lineitem;
