SELECT ELEMENT_AT(arr, 1).tag AS first_tag, SIZE(arr) AS n FROM (
  SELECT ARRAY(named_struct('tag', 'a'), named_struct('tag', 'b')) AS arr
) t;
