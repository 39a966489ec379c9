SELECT COUNT(DISTINCT l_returnflag || l_linestatus) AS d_combo
FROM lineitem;
