SELECT n_nationkey,
       TO_HEX(CAST(n_nationkey * 255 AS INT8)) AS hex_val,
       TO_BIN(CAST(n_nationkey AS INT8)) AS bin_val,
       STRPOS(n_name, 'ION') AS ion_pos
FROM nation
WHERE n_nationkey < 6
ORDER BY n_nationkey;
